"""SSL framework: wav2vec 2.0 contrastive pretraining driver (TPU-native).

Counterpart of the reference SSL framework's wav2vec2 path
(/root/reference/examples/self_supervised_learning/: lightning_modules.py
SSLPretrainModule + losses/_wav2vec2_loss.py + data_modules/
_wav2vec2_datamodule.py over Lightning DDP).  Composes:

* ``data_modules.BucketizeBatchSampler`` + ``CollateFnWav2Vec2`` with
  bucket-boundary padding (one XLA program per bucket);
* a recipe-level ``Wav2Vec2PretrainModule`` — audio_tpu wav2vec2 backbone +
  span masking, with learned projections producing the contrastive space
  (where the original paper uses a Gumbel-quantized codebook, this recipe
  projects the pre-mask latents — the framework seam where a quantizer
  drops in is the ``project_targets`` module);
* ``losses.wav2vec2_loss`` (InfoNCE over in-utterance negatives) +
  the feature L2 penalty;
* the reference's cross-replica loss normalization (world_size/num_frames,
  lightning_modules.py:44-53) via ``psum`` over the dp mesh axis.

Quick synthetic smoke on a CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python train_wav2vec2.py --synthetic --tiny --steps 2
"""

from __future__ import annotations

import argparse
import functools
import pathlib
import sys
import time

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from audio_tpu.models import wav2vec2_model
from audio_tpu.models.wav2vec2.components import MaskGenerator
from audio_tpu.parallel import batch_sharding, create_mesh, replicate

_HERE = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(_HERE))
from data_modules import BucketizeBatchSampler, CollateFnWav2Vec2, shard_batches  # noqa: E402
from losses import sample_negatives, wav2vec2_loss  # noqa: E402
from lr_schedulers import linear_decay_schedule  # noqa: E402

SAMPLE_RATE = 16000


class Wav2Vec2PretrainModule(nn.Module):
    """wav2vec2 backbone + span masking + contrastive projections."""

    backbone: nn.Module  # Wav2Vec2Model
    mask_prob: float = 0.65
    mask_length: int = 10
    final_dim: int = 256

    def setup(self):
        self.mask_generator = MaskGenerator(
            self.backbone.encoder_embed_dim, self.mask_prob, self.mask_length,
            name="mask_generator",
        )
        self.final_proj = nn.Dense(self.final_dim, name="final_proj")
        self.project_targets = nn.Dense(self.final_dim, name="project_targets")

    def __call__(self, waveforms, audio_lengths=None, deterministic: bool = False):
        x, lengths = self.backbone.feature_extractor(waveforms, audio_lengths)
        feature_penalty = jnp.square(x.astype(jnp.float32)).mean()
        if lengths is not None:
            padding_mask = jnp.arange(x.shape[1])[None, :] >= lengths[:, None]
        else:
            padding_mask = None
        x, attn_mask = self.backbone.encoder._preprocess(x, lengths, deterministic)
        targets = self.project_targets(x)  # pre-mask latents -> contrastive space
        x, mask = self.mask_generator(x, padding_mask, self.make_rng("mask"))
        x = self.backbone.encoder.transformer(
            x, attention_mask=attn_mask, deterministic=deterministic
        )
        x = self.final_proj(x)
        if padding_mask is not None:
            mask = jnp.logical_and(~padding_mask, mask)
        return x, targets, mask, lengths, feature_penalty


def build_model(tiny: bool, model_name: str = "wav2vec2_base"):
    if tiny:
        backbone = wav2vec2_model(
            extractor_mode="group_norm",
            extractor_conv_layer_config=[(32, 10, 5), (32, 3, 2), (32, 2, 2)],
            extractor_conv_bias=False,
            encoder_embed_dim=64,
            encoder_projection_dropout=0.0,
            encoder_pos_conv_kernel=15,
            encoder_pos_conv_groups=1,
            encoder_num_layers=2,
            encoder_num_heads=4,
            encoder_attention_dropout=0.0,
            encoder_ff_interm_features=128,
            encoder_ff_interm_dropout=0.0,
            encoder_dropout=0.0,
            encoder_layer_norm_first=False,
            encoder_layer_drop=0.0,
            aux_num_out=None,
        )
        return Wav2Vec2PretrainModule(backbone=backbone, final_dim=64)
    import audio_tpu.models as M

    # the reference SSL framework's model axis: base (768-d, final 256) /
    # large / large-lv60k (1024-d, final 768)
    backbone = getattr(M, model_name)(aux_num_out=None)
    final_dim = 256 if model_name == "wav2vec2_base" else 768
    return Wav2Vec2PretrainModule(backbone=backbone, final_dim=final_dim)


def synthetic_dataset(n, tiny, seed=0):
    rng = np.random.default_rng(seed)
    lo, hi = (2000, 4000) if tiny else (32000, 250000)
    data = [
        rng.standard_normal(int(rng.integers(lo, hi))).astype(np.float32) * 0.1
        for _ in range(n)
    ]
    return (lambda i: data[i]), [d.shape[-1] for d in data]


def real_dataset(args):
    """LibriSpeech / Libri-Light corpora via audio_tpu.datasets, mirroring the
    reference datamodules (/root/reference/examples/self_supervised_learning/
    data_modules/_wav2vec2_datamodule.py: LibriSpeech for pretraining,
    LibriLightLimited for limited-supervision runs).  Lengths for the bucket
    sampler come from one metadata pass (header reads only, no decode)."""
    import os

    import audio_tpu
    import audio_tpu.datasets as D

    datasets = []
    if args.librispeech_path:
        for url in args.librispeech_urls.split(","):
            datasets.append(D.LIBRISPEECH(args.librispeech_path, url=url.strip()))
    if args.librilight_path:
        datasets.append(D.LibriLightLimited(args.librilight_path, subset=args.librilight_subset))

    items, lengths = [], []
    for ds in datasets:
        for i in range(len(ds)):
            relpath, _sr, *_ = ds.get_metadata(i)
            n = audio_tpu.info(os.path.join(ds._archive, relpath)).num_frames
            items.append((ds, i))
            lengths.append(int(n))
    if not items:
        raise SystemExit("no utterances found under the given dataset paths")

    def fetch(j):
        ds, i = items[j]
        wav = np.asarray(ds[i][0], np.float32)
        return wav.reshape(-1) if wav.ndim > 1 else wav

    return fetch, lengths


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--max-updates", type=int, default=400_000)
    p.add_argument("--warmup-updates", type=int, default=32_000)
    p.add_argument("--learning-rate", type=float, default=5e-4)
    p.add_argument("--num-negatives", type=int, default=100)
    p.add_argument("--feature-weight", type=float, default=10.0)
    p.add_argument("--max-token-count", type=int, default=None,
                   help="sum-of-samples per batch (reference: 87.5 s audio)")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--num-buckets", type=int, default=10)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--model-name", default="wav2vec2_base",
                   choices=["wav2vec2_base", "wav2vec2_large", "wav2vec2_large_lv60k"])
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--librispeech-path", default=None,
                   help="root containing LibriSpeech/ (e.g. for train-clean-100)")
    p.add_argument("--librispeech-urls", default="train-clean-100",
                   help="comma-separated LibriSpeech subsets")
    p.add_argument("--overfit", action="store_true",
                   help="learning gate: train on ONE fixed collated batch "
                        "and assert the per-frame contrastive loss collapses "
                        "below half the chance level ln(1 + num_negatives)")
    p.add_argument("--librilight-path", default=None,
                   help="root containing librispeech_finetuning/ (Libri-Light)")
    p.add_argument("--librilight-subset", default="10h",
                   choices=["10min", "1h", "10h"])
    args = p.parse_args()

    mesh = create_mesh(tp=1)
    n_dp = int(np.prod(list(mesh.shape.values())))
    print(f"mesh: {mesh.shape}")

    if args.synthetic:
        fetch, lengths = synthetic_dataset(64 if args.tiny else 512, args.tiny)
    elif args.librispeech_path or args.librilight_path:
        fetch, lengths = real_dataset(args)
    else:
        raise SystemExit(
            "pass --synthetic, --librispeech-path, or --librilight-path"
        )
    sampler = BucketizeBatchSampler(
        lengths, num_buckets=args.num_buckets,
        max_token_count=args.max_token_count,
        batch_size=None if args.max_token_count else args.batch_size * n_dp,
        shuffle=True, seed=0,
    )

    model = build_model(args.tiny, args.model_name)
    num_neg = 10 if args.tiny else args.num_negatives
    sample_wav = jnp.zeros((2, min(lengths)), jnp.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        sample_wav, jnp.full((2,), min(lengths), jnp.int32), deterministic=True,
    )["params"]

    schedule = linear_decay_schedule(args.learning_rate, args.warmup_updates, args.max_updates)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(schedule, weight_decay=1e-2))
    opt_state = tx.init(params)
    params = jax.device_put(params, replicate(mesh))
    opt_state = jax.device_put(opt_state, replicate(mesh))

    def loss_fn(params, wav, lens, key):
        mask_key, neg_key = jax.random.split(key)
        x, targets, mask, _, feat_pen = model.apply(
            {"params": params}, wav, lens, deterministic=False,
            rngs={"mask": mask_key, "dropout": jax.random.fold_in(key, 2)},
        )
        negatives = sample_negatives(targets, num_neg, neg_key)
        loss, sample_size = wav2vec2_loss(x, mask, targets, negatives, reduction="sum")
        loss = loss + args.feature_weight * feat_pen * sample_size
        # reference normalization: scale by world_size / total frames across
        # replicas (lightning_modules.py:44-53); under pjit the batch is
        # global so this is simply 1/sample_size of the global batch
        return loss / jnp.maximum(sample_size, 1.0), sample_size

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, wav, lens, key):
        (loss, n), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, wav, lens, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, n

    key = jax.random.PRNGKey(2)
    step = 0
    t0 = time.time()
    if args.overfit:
        batch_idx = list(next(iter(sampler)))
        rem = (-len(batch_idx)) % n_dp
        batch_idx += [batch_idx[i % len(batch_idx)] for i in range(rem)]
        collate = CollateFnWav2Vec2(
            pad_to=sampler.bucket_upper_len(sampler.bucket_ids[0]), seed=0)
        batch = collate([(fetch(i), lengths[i]) for i in batch_idx])
        wav = jax.device_put(jnp.asarray(batch["waveforms"]), batch_sharding(mesh, 2))
        lens = jax.device_put(jnp.asarray(batch["lengths"]), batch_sharding(mesh, 1))
        last = None
        for step in range(args.steps):
            key, sub = jax.random.split(key)
            params, opt_state, loss, n = train_step(params, opt_state, wav, lens, sub)
            last = float(loss)
            if step % 25 == 0 or step == args.steps - 1:
                print(f'{{"step": {step}, "loss": {last:.4f}}}', flush=True)
        chance = float(np.log(1 + num_neg))
        print(f'{{"event": "overfit_gate", "final_loss": {last:.4f}, '
              f'"chance": {chance:.2f}}}')
        # bar: below half the chance level in nats.  The floor is bounded
        # away from 0 because negatives are REDRAWN randomly every step (a
        # fresh 10-way ranking problem per step, occasionally containing
        # near-duplicates of the positive); measured trajectory on the tiny
        # config: 2.40 (chance) -> 0.97 @ 250 steps -> 0.74 @ 450
        if last > 0.5 * chance:
            raise AssertionError(
                f"memorization gate failed: contrastive loss {last:.4f} "
                f"(chance {chance:.2f}) did not collapse below "
                f"{0.5 * chance:.2f} after {args.steps} steps")
        return
    while step < args.steps:
        for bi, batch_idx in enumerate(sampler):
            if step >= args.steps:
                break
            # dp sharding needs the batch divisible by the mesh size: round
            # up by repeating leading samples (token-count batching yields
            # ragged batch sizes)
            rem = (-len(batch_idx)) % n_dp
            if rem:
                batch_idx = list(batch_idx)
                batch_idx += [batch_idx[i % len(batch_idx)] for i in range(rem)]
            collate = CollateFnWav2Vec2(
                pad_to=sampler.bucket_upper_len(sampler.bucket_ids[bi]), seed=step
            )
            batch = collate([(fetch(i), lengths[i]) for i in batch_idx])
            wav = jax.device_put(jnp.asarray(batch["waveforms"]), batch_sharding(mesh, 2))
            lens = jax.device_put(jnp.asarray(batch["lengths"]), batch_sharding(mesh, 1))
            key, sub = jax.random.split(key)
            params, opt_state, loss, n = train_step(params, opt_state, wav, lens, sub)
            print(f'{{"step": {step}, "loss": {float(loss):.4f}, '
                  f'"masked_frames": {int(n)}, "lr": {float(schedule(step)):.2e}, '
                  f'"wall_s": {time.time() - t0:.1f}}}', flush=True)
            step += 1
        sampler.set_epoch(step)

    print(f'{{"done": true, "steps": {step}}}')


if __name__ == "__main__":
    main()
