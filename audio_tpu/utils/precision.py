"""Mixed-precision helpers (bf16 compute, f32 master weights).

The reference has no TPU story here — its fp16 path lives only inside the
RNN-T loss kernel (cast-compute in fp32,
/root/reference/src/libtorchaudio/rnnt/cpu/cpu_transducer.h).  On TPU the
MXU runs bf16 natively at 2x the f32-accumulate rate and bf16 halves HBM
traffic (the usual bottleneck), so half precision is a first-class framework
feature:

* inference — cast params AND inputs to ``bfloat16`` and the whole network
  (flax infers dtypes from operands; norm statistics still accumulate in
  f32 inside flax's ``_compute_stats``) runs bf16 end to end::

      p16 = cast_floating(params, jnp.bfloat16)
      logits = model.apply(p16, wav.astype(jnp.bfloat16), ...)

* training — keep f32 master weights; cast to bf16 *inside* the loss so
  the forward/backward runs bf16 but ``jax.grad`` still differentiates the
  f32 masters (the cast's VJP casts gradients back up — no manual
  grad-unscaling needed, and bf16's f32-sized exponent needs no loss
  scaling either)::

      step = mixed_precision(loss_fn)         # loss_fn(params, *args)
      loss, grads = jax.value_and_grad(step)(params_f32, batch)

Loss functions with reductions that must stay accurate (e.g.
``F.rnnt_loss``'s log-semiring scans) should cast their logits back to f32
at the loss boundary; ``mixed_precision(upcast_output=True)`` does this for
wrapped *model* functions that return arrays.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

__all__ = ["cast_floating", "mixed_precision"]


def _is_float(x) -> bool:
    return hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)


def cast_floating(tree: Any, dtype=jnp.bfloat16, *, exclude: Sequence[str] = ()) -> Any:
    """Cast every floating-point leaf of a pytree to ``dtype``.

    Non-float leaves (ints, bools, PRNG keys) pass through untouched.
    ``exclude`` is a sequence of substrings matched against each leaf's
    key path (joined with "/"): matching leaves keep their dtype — use it
    to hold e.g. norm scales in f32 (note that with flax dtype inference a
    f32 leaf re-promotes everything downstream of it, so excluding is only
    useful for leaves consumed by dtype-explicit modules).
    """
    def cast(path, leaf):
        if not _is_float(leaf):
            return leaf
        if exclude:
            name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
            if any(s in name for s in exclude):
                return leaf
        return leaf.astype(dtype)

    return jax.tree_util.tree_map_with_path(cast, tree)


def mixed_precision(
    fn: Callable,
    compute_dtype=jnp.bfloat16,
    *,
    upcast_output: bool = False,
    exclude: Sequence[str] = (),
) -> Callable:
    """Wrap ``fn(params, *args, **kwargs)`` to run at ``compute_dtype``.

    Params and the floating leaves of both positional AND keyword arguments
    are cast to ``compute_dtype`` inside the wrapper, so ``jax.grad`` of the
    wrapped function still produces gradients in the original (master) param
    dtype.  With ``upcast_output=True`` floating outputs are cast back to
    f32 — use this when wrapping a *model* forward whose logits feed a
    numerically sensitive loss.
    """
    def _cast_tree(a):
        return jax.tree_util.tree_map(
            lambda x: x.astype(compute_dtype) if _is_float(x) else x, a
        )

    @functools.wraps(fn)
    def wrapped(params, *args, **kwargs):
        params = cast_floating(params, compute_dtype, exclude=exclude)
        args = tuple(_cast_tree(a) for a in args)
        kwargs = {k: _cast_tree(v) for k, v in kwargs.items()}
        out = fn(params, *args, **kwargs)
        if upcast_output:
            out = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.float32) if _is_float(x) else x, out
            )
        return out

    return wrapped
