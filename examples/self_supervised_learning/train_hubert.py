"""SSL framework: HuBERT pretraining driver (TPU-native).

Counterpart of /root/reference/examples/self_supervised_learning/train_hubert.py
(HuBERTModule + hubert_loss + LinearDecayLRScheduler over Lightning DDP).
Composes the framework pieces — ``losses.hubert_loss`` and
``lr_schedulers.linear_decay_schedule`` — around
``audio_tpu.models.hubert_pretrain_model`` on a "dp" mesh, and logs the
masked/unmasked prediction accuracies the reference tracks
(train_hubert.py:26-32 `_compute_accuracy`).

Quick synthetic smoke on a CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python train_hubert.py --synthetic --tiny --steps 2
"""

from __future__ import annotations

import argparse
import functools
import importlib.util
import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audio_tpu.models import (
    hubert_pretrain_base,
    hubert_pretrain_large,
    hubert_pretrain_xlarge,
)
from audio_tpu.models.wav2vec2 import hubert_pretrain_model
from audio_tpu.parallel import batch_sharding, create_mesh, replicate

_HERE = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(_HERE))
from losses import hubert_loss  # noqa: E402
from lr_schedulers import linear_decay_schedule  # noqa: E402

SAMPLE_RATE = 16000


def _load_hubert_recipe():
    """Reuse the tiny config + synthetic data from examples/hubert/pretrain.py."""
    path = _HERE.parent / "hubert" / "pretrain.py"
    spec = importlib.util.spec_from_file_location("_hubert_pretrain_recipe", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def masked_accuracy(logits, labels, mask):
    """Fraction of masked frames whose argmax logit is the true cluster."""
    correct = (jnp.argmax(logits, -1) == labels) & mask
    return correct.sum() / jnp.maximum(mask.sum(), 1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--max-updates", type=int, default=250_000,
                   help="schedule horizon (reference iter1: 250k)")
    p.add_argument("--warmup-updates", type=int, default=32_000)
    p.add_argument("--global-batch", type=int, default=8)
    p.add_argument("--learning-rate", type=float, default=5e-4)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--labels", default=None, help="labels.npz from ../hubert/preprocess.py")
    p.add_argument("--model-name", default="hubert_pretrain_base",
                   choices=["hubert_pretrain_base", "hubert_pretrain_large",
                            "hubert_pretrain_xlarge"],
                   help="the reference SSL framework's model_name axis "
                        "(train_hubert.py:112-117)")
    p.add_argument("--num-classes", type=int, default=100)
    p.add_argument("--masked-weight", type=float, default=1.0)
    p.add_argument("--unmasked-weight", type=float, default=0.0)
    p.add_argument("--feature-weight", type=float, default=10.0)
    args = p.parse_args()

    recipe = _load_hubert_recipe()
    mesh = create_mesh(tp=1)
    print(f"mesh: {mesh.shape}, devices: {len(jax.devices())}")

    if args.tiny:
        cfg = dict(recipe.TINY_CFG)
        model = hubert_pretrain_model(num_classes=args.num_classes, **cfg)
        conv_cfg = cfg["extractor_conv_layer_config"]
    else:
        factory = {"hubert_pretrain_base": hubert_pretrain_base,
                   "hubert_pretrain_large": hubert_pretrain_large,
                   "hubert_pretrain_xlarge": hubert_pretrain_xlarge}[args.model_name]
        model = factory(num_classes=args.num_classes)
        conv_cfg = [(512, 10, 5)] + [(512, 3, 2)] * 4 + [(512, 2, 2)] * 2

    audio_len = int(1.0 * SAMPLE_RATE)
    n_frames = recipe.frame_count(audio_len, conv_cfg)
    rng = np.random.default_rng(0)

    def batches():
        while True:
            wav = (0.1 * rng.standard_normal((args.global_batch, audio_len))).astype(np.float32)
            labels = rng.integers(0, args.num_classes, (args.global_batch, n_frames))
            yield wav, labels.astype(np.int32)

    data = batches()
    wav0, lab0 = next(data)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        jnp.asarray(wav0), jnp.asarray(lab0), deterministic=True,
    )["params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e6:.2f}M")

    schedule = linear_decay_schedule(args.learning_rate, args.warmup_updates, args.max_updates)
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
        loss, num_frame = hubert_loss(
            logit_m, logit_u, feature_penalty, label=labels,
            mask_m=mask_m, mask_u=mask_u,
            masked_weight=args.masked_weight,
            unmasked_weight=args.unmasked_weight,
            feature_weight=args.feature_weight,
            reduction="mean",
        )
        acc_m = masked_accuracy(logit_m, labels, mask_m)
        acc_u = masked_accuracy(logit_u, labels, mask_u)
        return loss, (acc_m, acc_u)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, wav, labels, key):
        (loss, (acc_m, acc_u)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, wav, labels, key
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, acc_m, acc_u

    key = jax.random.PRNGKey(2)
    t0 = time.time()
    for step in range(args.steps):
        wav, labels = next(data)
        wav = jax.device_put(jnp.asarray(wav), batch_sharding(mesh, 2))
        labels = jax.device_put(jnp.asarray(labels), batch_sharding(mesh, 2))
        key, sub = jax.random.split(key)
        params, opt_state, loss, acc_m, acc_u = train_step(params, opt_state, wav, labels, sub)
        if step % 10 == 0 or step == args.steps - 1:
            print(f"step {step}: loss {float(loss):.4f} acc_m {float(acc_m):.3f} "
                  f"acc_u {float(acc_u):.3f}  ({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
