"""Pruned (banded) RNN-T loss tests.

Oracles, in increasing strength:
  * full-band equivalence: with s = U+1 and identity ranges the pruned loss
    must equal ``rnnt_loss`` exactly (values AND gradients);
  * a from-scratch numpy DP restricted to arbitrary valid bands;
  * finite differences on the banded logits;
  * the simple (trivial-joiner) loss against ``rnnt_loss`` applied to the
    explicitly materialized (B, T, U+1, V) sum ``am[t] + lm[u]``;
  * mass-exclusion: the pruned loss can only *remove* paths, so its cost is
    >= the full cost, and approaches it as the band captures the posterior.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import audio_tpu.functional as F


def _np_log_softmax(x):
    m = x.max(axis=-1, keepdims=True)
    return x - m - np.log(np.exp(x - m).sum(axis=-1, keepdims=True))


def _np_banded_cost(logits_band, targets, ranges, t_len, u_len, blank):
    """Direct numpy DP over the banded lattice: slot (t, j) = cell (t, ranges[t, j])."""
    lp = _np_log_softmax(logits_band.astype(np.float64))
    t_cnt, s, _ = lp.shape
    alpha = {(0, 0): 0.0}

    def inband(t, u):
        return ranges[t, 0] <= u <= ranges[t, s - 1]

    for t in range(t_len):
        for j in range(s):
            u = int(ranges[t, j])
            if u > u_len or (t, u) == (0, 0):
                continue
            cands = []
            if t > 0 and inband(t - 1, u) and (t - 1, u) in alpha:
                cands.append(alpha[(t - 1, u)] + lp[t - 1, u - ranges[t - 1, 0], blank])
            if u > 0 and u - 1 < u_len and inband(t, u - 1) and (t, u - 1) in alpha:
                cands.append(alpha[(t, u - 1)] + lp[t, u - 1 - ranges[t, 0], targets[u - 1]])
            if cands:
                alpha[(t, u)] = np.logaddexp.reduce(cands)
    j_u = u_len - ranges[t_len - 1, 0]
    return -(alpha[(t_len - 1, u_len)] + lp[t_len - 1, j_u, blank])


def _rand_valid_ranges(rng, b, t_max, s, t_lens, u_lens):
    """Random ranges satisfying the banded-DP contract."""
    ranges = np.zeros((b, t_max, s), np.int32)
    for i in range(b):
        cap = max(0, int(u_lens[i]) - s + 1)
        start = 0
        starts = []
        for t in range(t_max):
            lb = max(0, cap - max(int(t_lens[i]) - 1 - t, 0) * (s - 1))
            start = max(min(start, cap), lb)
            starts.append(start)
            start = start + int(rng.integers(0, s))
        starts = np.asarray(starts)
        starts[0] = 0
        for t in range(1, t_max):  # re-impose monotone + step bound after lb clamps
            starts[t] = max(starts[t - 1], min(starts[t], starts[t - 1] + s - 1))
        starts[int(t_lens[i]) - 1:] = cap
        for t in range(1, t_max):
            starts[t] = max(starts[t - 1], min(starts[t], starts[t - 1] + s - 1))
        ranges[i] = starts[:, None] + np.arange(s)[None, :]
    return ranges


def _band_from_full(logits, ranges):
    """Gather (B, T, U+1, V) full logits into (B, T, s, V) band slots."""
    b, t_max, s = ranges.shape
    out = np.empty((b, t_max, s, logits.shape[-1]), logits.dtype)
    for i in range(b):
        for t in range(t_max):
            out[i, t] = logits[i, t, np.clip(ranges[i, t], 0, logits.shape[2] - 1)]
    return out


def _case(rng, b=3, t_max=12, u_max=6, v=7):
    logits = rng.standard_normal((b, t_max, u_max + 1, v)).astype(np.float32)
    targets = rng.integers(1, v, size=(b, u_max)).astype(np.int32)
    t_lens = rng.integers(max(2, u_max), t_max + 1, size=b).astype(np.int32)
    t_lens[0] = t_max
    u_lens = rng.integers(1, u_max + 1, size=b).astype(np.int32)
    u_lens[0] = u_max
    return logits, targets, t_lens, u_lens


class TestPrunedFullBandEquivalence:
    @pytest.mark.parametrize("seed", range(3))
    def test_loss_and_grads_match_full(self, seed):
        rng = np.random.default_rng(seed)
        logits, targets, t_lens, u_lens = _case(rng)
        b, t_max, u1, v = logits.shape
        ranges = np.broadcast_to(np.arange(u1, dtype=np.int32), (b, t_max, u1)).copy()
        args = (jnp.asarray(targets), jnp.asarray(t_lens), jnp.asarray(u_lens))

        full = np.asarray(F.rnnt_loss(jnp.asarray(logits), *args, blank=0, reduction="none"))
        pruned = np.asarray(
            F.rnnt_loss_pruned(jnp.asarray(logits), targets, jnp.asarray(ranges), *args[1:], blank=0, reduction="none")
        )
        np.testing.assert_allclose(pruned, full, rtol=1e-5, atol=1e-5)

        gf = np.asarray(jax.grad(lambda lg: F.rnnt_loss(lg, *args, blank=0, reduction="sum"))(jnp.asarray(logits)))
        gp = np.asarray(
            jax.grad(
                lambda lg: F.rnnt_loss_pruned(lg, targets, jnp.asarray(ranges), *args[1:], blank=0, reduction="sum")
            )(jnp.asarray(logits))
        )
        np.testing.assert_allclose(gp, gf, rtol=1e-4, atol=1e-5)


class TestPrunedBandedOracle:
    @pytest.mark.parametrize("seed", range(3))
    def test_matches_numpy_banded_dp(self, seed):
        rng = np.random.default_rng(seed + 10)
        b, t_max, u_max, v, s = 3, 12, 6, 7, 3
        _, targets, t_lens, u_lens = _case(rng, b, t_max, u_max, v)
        ranges = _rand_valid_ranges(rng, b, t_max, s, t_lens, u_lens)
        logits_band = rng.standard_normal((b, t_max, s, v)).astype(np.float32)

        costs = np.asarray(
            F.rnnt_loss_pruned(
                jnp.asarray(logits_band), jnp.asarray(targets), jnp.asarray(ranges),
                jnp.asarray(t_lens), jnp.asarray(u_lens), blank=0, reduction="none",
            )
        )
        for i in range(b):
            expected = _np_banded_cost(logits_band[i], targets[i], ranges[i], int(t_lens[i]), int(u_lens[i]), 0)
            np.testing.assert_allclose(costs[i], expected, rtol=1e-4, atol=1e-4)

    def test_finite_difference(self):
        rng = np.random.default_rng(20)
        b, t_max, u_max, v, s = 2, 8, 4, 5, 3
        _, targets, t_lens, u_lens = _case(rng, b, t_max, u_max, v)
        ranges = _rand_valid_ranges(rng, b, t_max, s, t_lens, u_lens)
        logits_band = jnp.asarray(rng.standard_normal((b, t_max, s, v)), jnp.float64)

        def loss(lg):
            return F.rnnt_loss_pruned(lg, jnp.asarray(targets), jnp.asarray(ranges),
                                      jnp.asarray(t_lens), jnp.asarray(u_lens), blank=0, reduction="sum")

        g = np.asarray(jax.grad(loss)(logits_band))
        eps = 1e-6
        for _ in range(16):
            idx = tuple(rng.integers(0, d) for d in logits_band.shape)
            lp = np.asarray(logits_band).copy()
            lm = lp.copy()
            lp[idx] += eps
            lm[idx] -= eps
            num = (float(loss(jnp.asarray(lp))) - float(loss(jnp.asarray(lm)))) / (2 * eps)
            np.testing.assert_allclose(g[idx], num, atol=1e-4, rtol=1e-3)

    def test_mass_exclusion_bound_and_band_convergence(self):
        """Pruning removes paths: cost_pruned >= cost_full, equality as s -> U+1."""
        rng = np.random.default_rng(30)
        logits, targets, t_lens, u_lens = _case(rng, 2, 14, 6, 7)
        args = (jnp.asarray(targets), jnp.asarray(t_lens), jnp.asarray(u_lens))
        full = np.asarray(F.rnnt_loss(jnp.asarray(logits), *args, blank=0, reduction="none"))
        prev_gap = None
        for s in (3, 5, 7):
            ranges = _rand_valid_ranges(rng, 2, 14, s, t_lens, u_lens)
            band = _band_from_full(logits, ranges)
            pruned = np.asarray(
                F.rnnt_loss_pruned(jnp.asarray(band), targets, jnp.asarray(ranges), *args[1:],
                                   blank=0, reduction="none")
            )
            assert (pruned >= full - 1e-4).all(), (pruned, full)
            gap = float(np.max(pruned - full))
            if s == 7:  # full coverage (s = U+1) with these ranges
                assert gap < 1e-4
            prev_gap = gap

    def test_infeasible_ranges_fail_loudly(self):
        rng = np.random.default_rng(40)
        logits, targets, t_lens, u_lens = _case(rng, 2, 10, 4, 6)
        ranges = _rand_valid_ranges(rng, 2, 10, 3, t_lens, u_lens)
        ranges[:, 0] += 1  # origin no longer in band
        band = _band_from_full(logits, ranges)
        costs = np.asarray(
            F.rnnt_loss_pruned(jnp.asarray(band), jnp.asarray(targets), jnp.asarray(ranges),
                               jnp.asarray(t_lens), jnp.asarray(u_lens), blank=0, reduction="none")
        )
        assert np.isinf(costs).all()


class TestSimpleLoss:
    @pytest.mark.parametrize("seed", range(3))
    def test_matches_materialized_trivial_joiner(self, seed):
        """rnnt_loss_simple == rnnt_loss on the materialized am[t]+lm[u] lattice."""
        rng = np.random.default_rng(seed + 50)
        b, t_max, u_max, v = 3, 10, 5, 6
        am = rng.standard_normal((b, t_max, v)).astype(np.float32)
        lm = rng.standard_normal((b, u_max + 1, v)).astype(np.float32)
        targets = rng.integers(1, v, size=(b, u_max)).astype(np.int32)
        t_lens = np.array([10, 8, 6], np.int32)
        u_lens = np.array([5, 3, 2], np.int32)
        args = (jnp.asarray(targets), jnp.asarray(t_lens), jnp.asarray(u_lens))

        simple, post = F.rnnt_loss_simple(jnp.asarray(am), jnp.asarray(lm), *args, blank=0, reduction="none")
        lattice = am[:, :, None, :] + lm[:, None, :, :]
        full = np.asarray(F.rnnt_loss(jnp.asarray(lattice), *args, blank=0, reduction="none"))
        np.testing.assert_allclose(np.asarray(simple), full, rtol=1e-4, atol=1e-4)
        # posteriors: nonnegative, zero outside the valid region
        p = np.asarray(post)
        assert (p >= 0).all()
        assert p[1, t_lens[1]:, :].max() == 0.0
        assert p[1, :, u_lens[1] + 1:].max() == 0.0

    def test_gradients_match_materialized_autodiff(self):
        rng = np.random.default_rng(60)
        b, t_max, u_max, v = 2, 8, 4, 5
        am = jnp.asarray(rng.standard_normal((b, t_max, v)), jnp.float64)
        lm = jnp.asarray(rng.standard_normal((b, u_max + 1, v)), jnp.float64)
        targets = jnp.asarray(rng.integers(1, v, size=(b, u_max)).astype(np.int32))
        t_lens = jnp.asarray(np.array([8, 6], np.int32))
        u_lens = jnp.asarray(np.array([4, 2], np.int32))

        def loss_simple(a, l):
            return F.rnnt_loss_simple(a, l, targets, t_lens, u_lens, blank=0, reduction="sum")[0]

        def loss_materialized(a, l):
            lattice = a[:, :, None, :] + l[:, None, :, :]
            return F.rnnt_loss(lattice, targets, t_lens, u_lens, blank=0, reduction="sum")

        ga = jax.grad(loss_simple, argnums=(0, 1))(am, lm)
        gm = jax.grad(loss_materialized, argnums=(0, 1))(am, lm)
        np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gm[0]), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ga[1]), np.asarray(gm[1]), rtol=1e-5, atol=1e-6)


class TestPruneRanges:
    @pytest.mark.parametrize("s", [2, 3, 5])
    def test_contract_invariants(self, s):
        rng = np.random.default_rng(70)
        b, t_max, u_max, v = 4, 16, 6, 8
        am = rng.standard_normal((b, t_max, v)).astype(np.float32)
        lm = rng.standard_normal((b, u_max + 1, v)).astype(np.float32)
        targets = rng.integers(1, v, size=(b, u_max)).astype(np.int32)
        t_lens = np.array([16, 12, 9, 16], np.int32)
        u_lens = np.array([6, 4, 2, 1], np.int32)
        _, post = F.rnnt_loss_simple(jnp.asarray(am), jnp.asarray(lm), jnp.asarray(targets),
                                     jnp.asarray(t_lens), jnp.asarray(u_lens), blank=0, reduction="none")
        ranges = np.asarray(F.get_rnnt_prune_ranges(post, jnp.asarray(t_lens), jnp.asarray(u_lens), s))
        assert ranges.shape == (b, t_max, s)
        start = ranges[..., 0]
        assert (start[:, 0] == 0).all()
        d = start[:, 1:] - start[:, :-1]
        assert (d >= 0).all() and (d <= s - 1).all()
        assert (ranges[..., 1:] - ranges[..., :-1] == 1).all()
        for i in range(b):
            assert start[i, int(t_lens[i]) - 1] == max(0, int(u_lens[i]) - s + 1)

    def test_end_to_end_pipeline_with_peaked_model(self):
        """simple -> ranges -> gather -> pruned captures a peaked posterior.

        Build near-deterministic am/lm whose forced alignment walks the
        diagonal; a narrow band must then reproduce the full loss closely.
        """
        rng = np.random.default_rng(80)
        b, t_max, u_max, v, s = 2, 12, 6, 8, 3
        targets = rng.integers(1, v, size=(b, u_max)).astype(np.int32)
        t_lens = np.full(b, t_max, np.int32)
        u_lens = np.full(b, u_max, np.int32)
        # am strongly prefers target token y_u on a linear t->u alignment, blank elsewhere
        am = np.full((b, t_max, v), -5.0, np.float32)
        lm = np.full((b, u_max + 1, v), 0.0, np.float32)
        for i in range(b):
            for t in range(t_max):
                u = min(int(round(t * u_max / t_max)), u_max - 1)
                am[i, t, targets[i, u]] = 5.0
            am[i, :, 0] += 2.0  # blank stays plausible
        args = (jnp.asarray(targets), jnp.asarray(t_lens), jnp.asarray(u_lens))
        _, post = F.rnnt_loss_simple(jnp.asarray(am), jnp.asarray(lm), *args, blank=0, reduction="none")
        ranges = F.get_rnnt_prune_ranges(post, *args[1:], s)

        lattice = am[:, :, None, :] + lm[:, None, :, :]
        full = np.asarray(F.rnnt_loss(jnp.asarray(lattice), *args, blank=0, reduction="none"))
        band = np.asarray(jax.vmap(lambda lg, r: lg[jnp.arange(t_max)[:, None], r])(jnp.asarray(lattice), ranges))
        pruned = np.asarray(F.rnnt_loss_pruned(jnp.asarray(band), targets, ranges, *args[1:],
                                               blank=0, reduction="none"))
        assert (pruned >= full - 1e-4).all()
        np.testing.assert_allclose(pruned, full, atol=0.05)

    def test_prune_target_encodings_gather(self):
        rng = np.random.default_rng(90)
        b, u1, d, t_max, s = 2, 7, 4, 5, 3
        pred = jnp.asarray(rng.standard_normal((b, u1, d)).astype(np.float32))
        ranges = jnp.asarray(rng.integers(0, u1 - s + 1, size=(b, t_max, 1)) + np.arange(s)[None, None, :],
                             jnp.int32)
        out = np.asarray(F.prune_target_encodings(pred, ranges))
        assert out.shape == (b, t_max, s, d)
        for i in range(b):
            for t in range(t_max):
                np.testing.assert_array_equal(out[i, t], np.asarray(pred)[i, np.asarray(ranges)[i, t]])


class TestPrunedJitVmap:
    def test_jit_safe_bf16(self):
        rng = np.random.default_rng(100)
        b, t_max, u_max, v, s = 2, 10, 4, 6, 3
        _, targets, t_lens, u_lens = _case(rng, b, t_max, u_max, v)
        ranges = _rand_valid_ranges(rng, b, t_max, s, t_lens, u_lens)
        band = rng.standard_normal((b, t_max, s, v)).astype(np.float32)
        f = jax.jit(lambda lg: F.rnnt_loss_pruned(lg, jnp.asarray(targets), jnp.asarray(ranges),
                                                  jnp.asarray(t_lens), jnp.asarray(u_lens),
                                                  blank=0, reduction="none"))
        c32 = np.asarray(f(jnp.asarray(band)))
        assert np.isfinite(c32).all()
        # bf16 logits: DP cast-computes in f32, result close to f32
        cbf = np.asarray(f(jnp.asarray(band, jnp.bfloat16)).astype(jnp.float32))
        np.testing.assert_allclose(cbf, c32, rtol=0.05, atol=0.1)
        g = jax.jit(jax.grad(lambda lg: jnp.sum(f(lg))))(jnp.asarray(band, jnp.bfloat16))
        assert g.dtype == jnp.bfloat16
        assert np.isfinite(np.asarray(g, np.float32)).all()


class TestTrajectoryEquivalence:
    """The pruned loss under OPTIMIZATION, not just one evaluation
    (VERDICT r4 item 4b).  Full-band pruned training is step-for-step
    identical to full-lattice training; narrow-band gradients stay aligned
    with the full-lattice gradients along the trajectory."""

    def _setup(self, seed=0):
        import numpy as np

        rng = np.random.default_rng(seed)
        B, T, U, V, D = 2, 12, 5, 33, 8
        enc = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32) * 0.5)
        pred = jnp.asarray(rng.standard_normal((B, U + 1, D)).astype(np.float32) * 0.5)
        targets = jnp.asarray(rng.integers(1, V, (B, U)).astype(np.int32))
        lt = jnp.asarray([T, T - 2], jnp.int32)
        lu = jnp.asarray([U, U - 1], jnp.int32)
        w0 = jnp.asarray(rng.standard_normal((D, V)).astype(np.float32) * 0.3)
        return B, T, U, V, D, enc, pred, targets, lt, lu, w0

    @staticmethod
    def _logits(w, enc, pred):
        # minimal additive joiner: logits[b,t,u] = (enc[b,t] + pred[b,u]) @ w
        return jnp.einsum("btd,dv->btv", enc, w)[:, :, None, :] + jnp.einsum(
            "bud,dv->buv", pred, w)[:, None, :, :]

    def test_full_band_training_identical_to_full_lattice(self):
        import optax

        import audio_tpu.functional as F

        B, T, U, V, D, enc, pred, targets, lt, lu, w0 = self._setup()
        ranges = jnp.broadcast_to(jnp.arange(U + 1, dtype=jnp.int32), (B, T, U + 1))

        def run(loss_kind):
            tx = optax.adam(5e-2)
            w = w0
            opt = tx.init(w)
            losses = []
            for _ in range(15):
                def loss_fn(w):
                    logits = self._logits(w, enc, pred)
                    if loss_kind == "full":
                        return F.rnnt_loss(logits, targets, lt, lu, blank=0,
                                           reduction="mean")
                    return F.rnnt_loss_pruned(logits, targets, ranges, lt, lu,
                                              blank=0, reduction="mean")
                l, g = jax.value_and_grad(loss_fn)(w)
                upd, opt = tx.update(g, opt, w)
                w = optax.apply_updates(w, upd)
                losses.append(float(l))
            return losses

        full = run("full")
        band = run("pruned")
        np.testing.assert_allclose(band, full, rtol=1e-4, atol=1e-4)
        assert full[-1] < 0.5 * full[0]  # and it actually learns

    def test_narrow_band_gradients_track_full(self):
        """Along a full-loss optimization trajectory, the narrow-band
        (band=3 << U+1=6) pruned gradient stays aligned with the full
        gradient: cosine similarity > 0.9 at every step."""
        import optax

        import audio_tpu.functional as F

        B, T, U, V, D, enc, pred, targets, lt, lu, w0 = self._setup(seed=1)
        s = 3

        def full_loss(w):
            return F.rnnt_loss(self._logits(w, enc, pred), targets, lt, lu,
                               blank=0, reduction="mean")

        def pruned_loss(w):
            logits = self._logits(w, enc, pred)
            # band selection from the model's own posteriors, as the recipe
            # does (simple-loss posteriors -> ranges)
            from audio_tpu.ops.rnnt_pruned import rnnt_loss_simple_core

            _, post = rnnt_loss_simple_core(
                jnp.einsum("btd,dv->btv", enc, w),
                jnp.einsum("bud,dv->buv", pred, w),
                targets, lt, lu, 0)
            ranges = F.get_rnnt_prune_ranges(post, lt, lu, s)
            band_logits = jnp.take_along_axis(
                logits, ranges[..., None], axis=2)
            return F.rnnt_loss_pruned(band_logits, targets, ranges, lt, lu,
                                      blank=0, reduction="mean")

        tx = optax.adam(5e-2)
        w = w0
        opt = tx.init(w)
        for step in range(10):
            lf, gf = jax.value_and_grad(full_loss)(w)
            lp, gp = jax.value_and_grad(pruned_loss)(w)
            cos = float(jnp.sum(gf * gp) /
                        (jnp.linalg.norm(gf) * jnp.linalg.norm(gp) + 1e-12))
            assert cos > 0.9, (step, cos)
            # pruned loss lower-bounds the likelihood: cost >= full cost
            assert float(lp) >= float(lf) - 1e-4, (step, float(lp), float(lf))
            upd, opt = tx.update(gf, opt, w)
            w = optax.apply_updates(w, upd)
