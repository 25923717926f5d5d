"""Device mesh construction helpers.

Mesh axes convention used across the framework:

* ``"dp"`` — data parallel (stream/batch axis); gradient psum rides ICI
  within a slice and DCN across slices.
* ``"tp"`` — tensor parallel (attention heads / FFN hidden of the big
  encoders; joiner vocab of RNN-T).

`create_mesh` lays dp out over the outer (slower, possibly DCN) axis and tp
over the inner ICI axis, following the scaling-book recipe: collectives that
run per-layer (tp) must ride ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["create_mesh", "default_mesh", "init_distributed", "host_chip_mesh"]


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX (SPMD across hosts of a TPU slice/pod).

    No-op when already initialized or when running single-process. On TPU
    pods the arguments are auto-detected from the environment; on other
    platforms pass them explicitly (SURVEY.md §5 last row: the comm layer
    the reference never had).
    """
    # idempotence via the client handle, not error-message matching (the
    # RuntimeError wording changes across jax versions)
    state = getattr(getattr(jax._src, "distributed", None), "global_state", None)
    if state is not None and getattr(state, "client", None) is not None:
        return
    try:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
    except RuntimeError as err:
        # last-resort tolerance for re-initialization raced from elsewhere;
        # a connect/timeout failure must surface (silently falling back to
        # single-process turns a comm problem into wrong training semantics)
        if "already" not in str(err) and "only be called once" not in str(err):
            raise


def host_chip_mesh() -> Mesh:
    """("host", "chip") mesh: dp over hosts (DCN), inner axis over local chips
    (ICI) — layer shardings so per-layer collectives ride the inner axis."""
    n_local = jax.local_device_count()
    n_total = jax.device_count()
    arr = np.asarray(jax.devices()).reshape(n_total // n_local, n_local)
    return Mesh(arr, ("host", "chip"))


def create_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("dp", "tp") mesh over ``devices`` (default: all devices)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        if n % tp != 0:
            raise ValueError(f"Cannot split {n} devices into tp={tp}")
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp * tp} != device count {n}")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def default_mesh() -> Mesh:
    """All devices on the dp axis (pure data parallel)."""
    return create_mesh(tp=1)
