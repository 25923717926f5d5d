"""HuBERT masked-prediction pretraining (TPU-native).

Counterpart of /root/reference/examples/hubert/train.py (Lightning + DDP):
data parallel over a jax Mesh "dp" axis, one jit'd train step computing the
masked/unmasked cross-entropy of HuBERTPretrainModel plus feature penalty.

Synthetic smoke (CPU mesh):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python pretrain.py --synthetic --tiny --steps 2
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audio_tpu.models import hubert_pretrain_base
from audio_tpu.models.wav2vec2 import hubert_pretrain_model
from audio_tpu.parallel import batch_sharding, create_mesh, replicate

SAMPLE_RATE = 16000

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
    mask_prob=0.65,
    mask_length=4,
    final_dim=32,
)


def frame_count(num_samples: int, conv_cfg) -> int:
    n = num_samples
    for _, k, s in conv_cfg:
        n = (n - k) // s + 1
    return n


def masked_ce(logits, labels, mask):
    """Cross entropy over positions where ``mask`` is set; logits (B,T,C).

    Positions with ``labels < 0`` are excluded: the real-data path marks
    frames beyond an utterance's true audio (zero-padding) with -1 so the
    model is never trained to predict cluster ids for content it never saw.
    """
    mask = mask & (labels >= 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, jnp.maximum(labels, 0)[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(mask.sum(), 1)
    return -(ll * mask).sum() / denom


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--global-batch", type=int, default=8)
    p.add_argument("--learning-rate", type=float, default=5e-4)
    p.add_argument("--warmup-steps", type=int, default=32)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--labels", default=None, help="labels.npz from preprocess.py")
    p.add_argument("--librispeech-path", default=None,
                   help="with a labels.npz that carries utterance paths, "
                        "train on the REAL audio the labels were fit on")
    p.add_argument("--num-classes", type=int, default=100)
    p.add_argument("--audio-seconds", type=float, default=1.0)
    p.add_argument("--masked-weight", type=float, default=1.0)
    p.add_argument("--overfit", action="store_true",
                   help="learning gate: train on ONE fixed batch of tone-span "
                        "audio with content-derived labels, then assert "
                        "masked (>=0.85) and unmasked (>=0.9) cluster "
                        "prediction accuracy")
    p.add_argument("--unmasked-weight", type=float, default=0.0)
    p.add_argument("--feature-weight", type=float, default=10.0)
    args = p.parse_args()

    mesh = create_mesh(tp=1)
    print(f"mesh: {mesh.shape}")

    if args.tiny:
        cfg = dict(TINY_CFG, num_classes=args.num_classes)
        model = hubert_pretrain_model(**cfg)
        conv_cfg = cfg["extractor_conv_layer_config"]
    else:
        model = hubert_pretrain_base(num_classes=args.num_classes)
        conv_cfg = [(512, 10, 5)] + [(512, 3, 2)] * 4 + [(512, 2, 2)] * 2

    n_samp = int(args.audio_seconds * SAMPLE_RATE)
    n_frames = frame_count(n_samp, conv_cfg)
    rng = np.random.default_rng(0)

    def synthetic_batch():
        wav = (0.1 * rng.standard_normal((args.global_batch, n_samp))).astype(np.float32)
        labels = rng.integers(0, args.num_classes, (args.global_batch, n_frames)).astype(np.int32)
        return wav, labels

    real = None
    if args.labels:
        data = np.load(args.labels)
        all_labels = data["labels"]
        print(f"loaded labels {all_labels.shape} from {args.labels}")
        if args.librispeech_path and "paths" in data:
            import os

            from audio_tpu.datasets import LIBRISPEECH

            ds = LIBRISPEECH(args.librispeech_path, url=str(data["url"]))
            root = ds._archive
            rel_paths = [str(pth) for pth in data["paths"]]
            n_lab_frames = min(all_labels.shape[1], n_frames)

            def real_batch(step):
                import audio_tpu

                b = args.global_batch
                wav = np.zeros((b, n_samp), np.float32)
                labels = np.full((b, n_frames), -1, np.int32)  # -1 = no audio
                for j in range(b):
                    k = (step * b + j) % len(rel_paths)
                    w, _sr = audio_tpu.load(os.path.join(root, rel_paths[k]))
                    w = np.asarray(w, np.float32).reshape(-1)[:n_samp]
                    wav[j, : w.shape[-1]] = w
                    # trim labels to the frames the (possibly truncated)
                    # waveform actually covers: preprocess computed them on
                    # audio zero-padded to the corpus max length, so frames
                    # past frame_count(len(w)) describe content the model
                    # never sees (ADVICE r3)
                    valid = min(n_lab_frames, frame_count(w.shape[-1], conv_cfg))
                    labels[j, :valid] = all_labels[k, :valid]
                return wav, labels

            real = real_batch
            print(f"real audio: {len(rel_paths)} utterances from {root}")

    wav0, lab0 = synthetic_batch()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        jnp.asarray(wav0), jnp.asarray(lab0), deterministic=False,
    )
    params = variables["params"]
    print(f"params: {sum(x.size for x in jax.tree_util.tree_leaves(params))/1e6:.2f}M")

    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.learning_rate, args.warmup_steps, max(args.steps, args.warmup_steps + 1)
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(schedule, weight_decay=1e-2))
    opt_state = tx.init(params)
    rep = replicate(mesh)
    params, opt_state = jax.device_put((params, opt_state), rep)

    def loss_fn(params, wav, labels, key):
        k_mask, k_drop = jax.random.split(key)
        logit_m, logit_u, mask_m, mask_u, feature_penalty = model.apply(
            {"params": params}, wav, labels, deterministic=False,
            rngs={"mask": k_mask, "dropout": k_drop},
        )
        loss = args.masked_weight * masked_ce(logit_m, labels, mask_m)
        if args.unmasked_weight > 0:
            loss = loss + args.unmasked_weight * masked_ce(logit_u, labels, mask_u)
        return loss + args.feature_weight * feature_penalty

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, wav, labels, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, wav, labels, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    bsh = batch_sharding(mesh, 2)
    key = jax.random.PRNGKey(3)
    t0 = time.time()
    if args.overfit:
        # content-derived labels (real HuBERT semantics: labels are acoustic
        # units): the audio is a sequence of pure-tone spans and each frame's
        # label is its tone class — learnable from features at unmasked
        # positions and from surrounding context at masked ones (mask spans
        # are much shorter than tone spans)
        g = np.random.default_rng(11)
        hop = int(np.prod([cs for _, _, cs in conv_cfg]))
        n_tone = min(8, args.num_classes)
        span = max(8, n_frames // 16)
        fixed_wav = np.zeros((args.global_batch, n_samp), np.float32)
        fixed_labels = np.zeros((args.global_batch, n_frames), np.int32)
        t_axis = np.arange(n_samp) / SAMPLE_RATE
        for b in range(args.global_batch):
            for s0 in range(0, n_frames, span):
                c = int(g.integers(0, n_tone))
                fixed_labels[b, s0:s0 + span] = c
                lo, hi = s0 * hop, min((s0 + span) * hop, n_samp)
                freq = 150.0 * (1 + c)
                fixed_wav[b, lo:hi] = 0.3 * np.sin(2 * np.pi * freq * t_axis[lo:hi])
    for step in range(args.steps):
        if args.overfit:
            wav, labels = fixed_wav, fixed_labels
        else:
            wav, labels = real(step) if real is not None else synthetic_batch()
        wav = jax.device_put(jnp.asarray(wav), bsh)
        labels = jax.device_put(jnp.asarray(labels), bsh)
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, wav, labels, sub)
        if step % 10 == 0 or step == args.steps - 1:
            print(f"step {step}: loss {float(loss):.4f}  ({time.time()-t0:.1f}s)")

    if args.overfit:
        wav = jnp.asarray(fixed_wav)
        labels = jnp.asarray(fixed_labels)
        logit_m, logit_u, mask_m, mask_u, _ = jax.jit(
            lambda p: model.apply({"params": p}, wav, labels, deterministic=False,
                                  rngs={"mask": jax.random.PRNGKey(41),
                                        "dropout": jax.random.PRNGKey(42)})
        )(params)

        def acc(logits, mask):
            ok = (jnp.argmax(logits, -1) == labels) & mask & (labels >= 0)
            return float(ok.sum() / jnp.maximum((mask & (labels >= 0)).sum(), 1))

        am, au = acc(logit_m, mask_m), acc(logit_u, mask_u)
        print(f"overfit_gate: masked_acc {am:.3f}  unmasked_acc {au:.3f}  final_loss {float(loss):.4f}")
        if am < 0.85 or au < 0.9:
            raise AssertionError(
                f"learning gate failed: masked_acc {am:.3f} (need >= 0.85) / "
                f"unmasked_acc {au:.3f} (need >= 0.9) after {args.steps} steps"
            )


if __name__ == "__main__":
    main()
