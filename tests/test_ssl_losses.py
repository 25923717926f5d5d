"""SSL framework losses vs the reference torch implementations.

Oracle: /root/reference/examples/self_supervised_learning/losses/
(_wav2vec2_loss.py, _hubert_loss.py) run on identical inputs.
"""

import importlib.util
import pathlib
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

_REPO = pathlib.Path(__file__).resolve().parent.parent
_SSL = _REPO / "examples" / "self_supervised_learning"
_REF = pathlib.Path("/root/reference/examples/self_supervised_learning/losses")


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


losses = _load("_ssl_losses", _SSL / "losses.py")
lr_schedulers = _load("_ssl_lr", _SSL / "lr_schedulers.py")


@pytest.fixture(scope="module")
def ref_w2v():
    return _load("_ref_w2v_loss", _REF / "_wav2vec2_loss.py")


def test_wav2vec2_loss_matches_reference(ref_w2v):
    rng = np.random.default_rng(0)
    b, t, d, n_neg = 3, 12, 8, 4
    x = rng.standard_normal((b, t, d)).astype(np.float32)
    mask = np.zeros((b, t), bool)
    mask[:, 2:8] = True  # same masked count per row (reference reshapes by row)
    positives_full = rng.standard_normal((b, t, d)).astype(np.float32)
    negatives_full = rng.standard_normal((n_neg, b, t, d)).astype(np.float32)
    # make one negative equal the positive to exercise the neg_is_pos branch
    negatives_full[0, 0, 3] = positives_full[0, 3]

    # reference operates on masked-compacted tensors
    tm = int(mask[0].sum())
    pos_ref = torch.tensor(positives_full[mask].reshape(b, tm, d))
    neg_ref = torch.tensor(negatives_full[:, mask].reshape(n_neg, b, tm, d))
    ref_loss, ref_n = ref_w2v.wav2vec2_loss(
        torch.tensor(x), torch.tensor(mask), pos_ref, neg_ref, reduction="sum"
    )

    j_loss, j_n = losses.wav2vec2_loss(
        jnp.asarray(x), jnp.asarray(mask), jnp.asarray(positives_full),
        jnp.asarray(negatives_full), reduction="sum",
    )
    assert int(j_n) == int(ref_n)
    np.testing.assert_allclose(float(j_loss), float(ref_loss.sum()), rtol=2e-5)


def test_hubert_loss_reference_layout():
    """Positive-at-class-0 layout must equal the reference formula."""
    ref_hub = _load("_ref_hub_loss", _REF / "_hubert_loss.py")
    rng = np.random.default_rng(1)
    m, u, c = 7, 5, 6
    logit_m = rng.standard_normal((m, c)).astype(np.float32)
    logit_u = rng.standard_normal((u, c)).astype(np.float32)
    pen = np.float32(0.37)
    ref_loss, ref_frames = ref_hub.hubert_loss(
        torch.tensor(logit_m), torch.tensor(logit_u), torch.tensor(pen),
        masked_weight=1.0, unmasked_weight=0.5, feature_weight=10.0,
    )
    j_loss, j_frames = losses.hubert_loss(
        jnp.asarray(logit_m)[None], jnp.asarray(logit_u)[None], jnp.asarray(pen),
        masked_weight=1.0, unmasked_weight=0.5, feature_weight=10.0, reduction="sum",
    )
    assert int(j_frames) == int(ref_frames)
    np.testing.assert_allclose(float(j_loss), float(ref_loss), rtol=2e-5)


def test_sample_negatives_never_equals_position():
    feats = jnp.arange(5 * 7 * 2, dtype=jnp.float32).reshape(5, 7, 2)
    negs = losses.sample_negatives(feats, 4, jax.random.PRNGKey(0))
    assert negs.shape == (4, 5, 7, 2)
    # a negative drawn at time t must come from a different time step
    same = jnp.all(negs == feats[None], axis=-1)
    assert not bool(same.any())


def test_linear_decay_schedule_matches_reference_shape():
    sched = lr_schedulers.linear_decay_schedule(2.0, warmup_updates=10, max_updates=100)
    np.testing.assert_allclose(float(sched(5)), 2.0 * 5 / 10)
    np.testing.assert_allclose(float(sched(10)), 2.0)
    np.testing.assert_allclose(float(sched(55)), 2.0 * (100 - 55) / 90)
    assert float(sched(100)) == 0.0
    assert float(sched(200)) == 0.0
