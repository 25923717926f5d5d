"""HuBERT CTC fine-tuning on Libri-Light limited supervision (TPU-native).

Counterpart of /root/reference/examples/hubert/finetune.py (Lightning
``HuBERTFineTuneModule``): a character-level CTC head on the pretrained
HuBERT encoder, tri-stage LR schedule (warmup / hold / decay,
``--warmup-updates/--hold-updates/--decay-updates``), feature extractor
always frozen and the transformer encoder frozen for the first
``--freeze-encoder-updates`` steps (reference ``finetune.py:228-231``).

Here the freeze is a jittable gradient gate (no Python branching inside the
step), data parallelism is a `jax.sharding.Mesh` "dp" axis, and the whole
step (wav -> encoder -> aux head -> ctc_loss -> adamw) is one jit'd program.

Synthetic smoke (CPU mesh):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python finetune.py --synthetic --tiny --steps 2
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audio_tpu.models import hubert_base, wav2vec2_model
from audio_tpu.ops.ctc import ctc_loss
from audio_tpu.parallel import batch_sharding, create_mesh, replicate

SAMPLE_RATE = 16000
# Character vocabulary of the reference fine-tune (blank first, | = space).
LABELS = (
    "-|ETAONIHSRDLUMWCFGYPBVK'XJQZ"
)

TINY_CFG = dict(
    extractor_mode="group_norm",
    extractor_conv_layer_config=[(16, 10, 5), (16, 3, 2), (16, 2, 2)],
    extractor_conv_bias=False,
    encoder_embed_dim=32,
    encoder_projection_dropout=0.1,
    encoder_pos_conv_kernel=15,
    encoder_pos_conv_groups=1,
    encoder_num_layers=2,
    encoder_num_heads=4,
    encoder_attention_dropout=0.1,
    encoder_ff_interm_features=64,
    encoder_ff_interm_dropout=0.1,
    encoder_dropout=0.1,
    encoder_layer_norm_first=False,
    encoder_layer_drop=0.0,
)


def encode_transcript(text: str) -> np.ndarray:
    ids = [LABELS.index(c) for c in text.upper().replace(" ", "|") if c in LABELS]
    return np.asarray(ids, np.int32)


def tri_stage_schedule(peak_lr, warmup, hold, decay, final_scale=0.05):
    """fairseq-style tri-stage LR: linear warmup, hold, exponential decay."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = peak_lr * step / max(warmup, 1)
        dec_t = jnp.clip((step - warmup - hold) / max(decay, 1), 0.0, 1.0)
        dec = peak_lr * jnp.exp(jnp.log(final_scale) * dec_t)
        return jnp.where(step < warmup, warm, jnp.where(step < warmup + hold, peak_lr, dec))

    return schedule


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--global-batch", type=int, default=8)
    p.add_argument("--learning-rate", type=float, default=5e-5)
    p.add_argument("--warmup-updates", type=int, default=2000)
    p.add_argument("--hold-updates", type=int, default=8000)
    p.add_argument("--decay-updates", type=int, default=10000)
    p.add_argument("--freeze-encoder-updates", type=int, default=10000)
    p.add_argument("--checkpoint", default=None, help="orbax dir written by pretrain.py")
    p.add_argument("--dataset-path", default=None, help="LibriLightLimited root")
    p.add_argument("--subset", default="10h", choices=("10min", "1h", "10h"))
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--audio-seconds", type=float, default=1.0)
    p.add_argument("--overfit", action="store_true",
                   help="memorization gate: train on ONE fixed batch with "
                        "dropout off and the encoder unfrozen, then assert "
                        "CTC greedy decode reproduces the training "
                        "transcripts exactly")
    args = p.parse_args()

    mesh = create_mesh(tp=1)
    print(f"mesh: {mesh.shape}")

    if args.tiny:
        model = wav2vec2_model(aux_num_out=len(LABELS), **TINY_CFG)
    else:
        model = hubert_base(aux_num_out=len(LABELS))

    n_samp = int(args.audio_seconds * SAMPLE_RATE)
    rng = np.random.default_rng(0)

    def synthetic_batch():
        wav = (0.1 * rng.standard_normal((args.global_batch, n_samp))).astype(np.float32)
        wav_len = np.full((args.global_batch,), n_samp, np.int32)
        tgt = rng.integers(1, len(LABELS), (args.global_batch, 8)).astype(np.int32)
        tgt_len = np.full((args.global_batch,), 8, np.int32)
        return wav, wav_len, tgt, tgt_len

    batches = None
    if args.dataset_path and not args.synthetic:
        from audio_tpu.datasets import LibriLightLimited

        ds = LibriLightLimited(args.dataset_path, subset=args.subset)

        def data_iter():
            # partial batches carry ACROSS epochs: a corpus smaller than
            # one global batch must still fill batches (by cycling) instead
            # of looping forever without yielding
            epoch = 0
            wavs, tgts = [], []
            while True:  # endless epochs until --steps is reached
                order = np.random.default_rng(1 + epoch).permutation(len(ds))
                epoch += 1
                for i in order:
                    wav, sr, transcript, *_ = ds[int(i)]
                    wavs.append(np.asarray(wav).reshape(-1))
                    tgts.append(encode_transcript(transcript))
                    if len(wavs) == args.global_batch:
                        t_max = max(w.size for w in wavs)
                        l_max = max(t.size for t in tgts)
                        wav_b = np.zeros((len(wavs), t_max), np.float32)
                        tgt_b = np.zeros((len(tgts), l_max), np.int32)
                        for j, (w, t) in enumerate(zip(wavs, tgts)):
                            wav_b[j, : w.size] = w
                            tgt_b[j, : t.size] = t
                        yield (
                            wav_b,
                            np.asarray([w.size for w in wavs], np.int32),
                            tgt_b,
                            np.asarray([t.size for t in tgts], np.int32),
                        )
                        wavs, tgts = [], []

        batches = data_iter()

    wav0, wl0, tgt0, tl0 = synthetic_batch()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(wav0), jnp.asarray(wl0), deterministic=True,
    )
    params = variables["params"]

    if args.checkpoint:
        from audio_tpu.utils.checkpoint import restore_checkpoint

        state = restore_checkpoint(args.checkpoint, like={"params": params})
        # pretrain checkpoints carry {feature_extractor, encoder, ...}; the new
        # aux head stays freshly initialised.
        restored = state["params"]
        params = dict(params)
        for k in ("feature_extractor", "encoder"):
            if k in restored:
                params[k] = restored[k]
        print(f"restored encoder from {args.checkpoint}")

    print(f"params: {sum(x.size for x in jax.tree_util.tree_leaves(params))/1e6:.2f}M")

    schedule = tri_stage_schedule(
        args.learning_rate, args.warmup_updates, args.hold_updates, args.decay_updates
    )
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(schedule, weight_decay=0.0))
    opt_state = tx.init(params)
    rep = replicate(mesh)
    params, opt_state = jax.device_put((params, opt_state), rep)

    deterministic = bool(args.overfit)  # memorization gate trains dropout-off

    def loss_fn(params, wav, wav_len, tgt, tgt_len, key):
        logits, out_len = model.apply(
            {"params": params}, wav, wav_len, deterministic=deterministic,
            rngs={"dropout": key}
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        return ctc_loss(logp, tgt, out_len, tgt_len, blank=0, reduction="mean")

    def gate_grads(grads, step):
        """Feature extractor always frozen; encoder gated until freeze_encoder_updates."""
        freeze_until = 0 if args.overfit else args.freeze_encoder_updates
        enc_gate = jnp.asarray(step >= freeze_until, jnp.float32)
        out = {}
        for k, v in grads.items():
            if k == "feature_extractor":
                out[k] = jax.tree_util.tree_map(jnp.zeros_like, v)
            elif k == "aux":
                out[k] = v
            else:
                out[k] = jax.tree_util.tree_map(lambda g: g * enc_gate, v)
        return out

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, step, wav, wav_len, tgt, tgt_len, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, wav, wav_len, tgt, tgt_len, key)
        grads = gate_grads(grads, step)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    bsh2 = batch_sharding(mesh, 2)
    bsh1 = batch_sharding(mesh, 1)
    key = jax.random.PRNGKey(2)
    fixed = None
    if args.overfit:
        fixed = next(batches) if batches is not None else synthetic_batch()
    t0 = time.time()
    for step in range(args.steps):
        if fixed is not None:
            batch = fixed
        elif batches is not None:
            try:
                batch = next(batches)
            except StopIteration:
                break
        else:
            batch = synthetic_batch()
        wav, wav_len, tgt, tgt_len = batch
        wav = jax.device_put(jnp.asarray(wav), bsh2)
        tgt = jax.device_put(jnp.asarray(tgt), bsh2)
        wav_len = jax.device_put(jnp.asarray(wav_len), bsh1)
        tgt_len = jax.device_put(jnp.asarray(tgt_len), bsh1)
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(step, jnp.int32), wav, wav_len, tgt, tgt_len, sub
        )
        if step % 10 == 0 or step == args.steps - 1:
            print(f"step {step}: ctc loss {float(loss):.4f}  ({time.time()-t0:.1f}s)")

    if args.overfit:
        # memorization gate: CTC greedy decode (argmax, collapse repeats,
        # drop blanks) must reproduce every training transcript exactly
        wav, wav_len, tgt, tgt_len = fixed
        logits, out_len = jax.jit(
            lambda p: model.apply({"params": p}, jnp.asarray(wav), jnp.asarray(wav_len),
                                  deterministic=True)
        )(params)
        path = np.asarray(jnp.argmax(logits, -1))
        out_len = np.asarray(out_len)
        n_exact = 0
        for i in range(len(tgt_len)):
            seq, prev = [], -1
            for t in path[i, : out_len[i]]:
                if t != prev and t != 0:
                    seq.append(int(t))
                prev = t
            ref_t = tgt[i, : tgt_len[i]].tolist()
            n_exact += int(seq == ref_t)
        print(f"overfit_gate: exact {n_exact}/{len(tgt_len)}  final_loss {float(loss):.4f}")
        if n_exact != len(tgt_len):
            raise AssertionError(
                f"memorization gate failed: {n_exact}/{len(tgt_len)} exact "
                f"transcript matches after {args.steps} steps (loss {float(loss):.4f})"
            )


if __name__ == "__main__":
    main()
