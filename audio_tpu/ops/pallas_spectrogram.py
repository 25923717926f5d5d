"""Fused Pallas TPU spectrogram: framing + windowed DFT + power (+ mel).

TPU-native replacement for the hot path of the reference's
``torchaudio.functional.spectrogram`` (which wraps ``torch.stft`` —
/root/reference/src/torchaudio/functional/functional.py:123-144) and of
``transforms.MelSpectrogram``'s spectrogram→mel matmul chain
(/root/reference/src/torchaudio/transforms/_transforms.py:612-622).

Why a kernel: on TPU the XLA pipeline (strided conv-DFT → |.|² → mel GEMM)
materializes the complex spectrum and the power spectrum in HBM — ~2 GB of
traffic per 4096×1 s batch on top of the GEMM.  Here each grid cell loads a
(streams × samples) tile once, builds the overlapping frames in VMEM with
static lane slices, runs the DFT as one MXU GEMM against a precomputed
windowed cos/-sin matrix, squares+adds for power, optionally applies the mel
filterbank GEMM, and writes only the final (streams, frames, bins) tile.

Precision: the DFT and mel GEMMs run at ``jax.lax.Precision.HIGHEST``
(Mosaic's native 6-pass bf16 expansion, exact f32).  The 3-pass HIGH split
used in round 1 measured ~1.2e-3 of peak against the true-f32 rfft oracle on
the chip — just over the 1e-3 parity gate (tools/verify_tpu_parity.py) —
because cancellation across the n_fft-term window sum amplifies the dropped
lo*lo/lo-split residuals.  The kernel is HBM-bound, so the extra MXU passes
are in the bandwidth shadow.

Layout note: output is TIME-MAJOR (B, n_frames, bins).  The torchaudio API
layout (..., freq, time) is a transpose the caller applies when needed; the
mel-fused path feeds (B, T, mel) consumers directly with no transpose.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["power_spectrogram_pallas", "spectrogram_pallas_supported"]

_NB = 32   # streams per grid cell
_LANE = 128


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _frames_per_cell(n_fft: int, hop: int) -> int:
    """Smallest frame-chunk size FC with FC*hop % 128 == 0, FC % 8 == 0,
    FC >= n_fft/hop - 1 (so a frame spans at most two chunks) and
    FC*hop >= 2048 (amortize per-cell overhead)."""
    g = math.gcd(hop, _LANE)
    step = _LANE // g
    fc = step
    while fc % 8 or fc * hop < 2048 or (fc - 1) * hop + n_fft > 2 * fc * hop:
        fc += step
    return fc


# Leave headroom under the ~16 MiB/core VMEM the kernel competes for
# (docs/performance.md): Mosaic needs space for double-buffered block windows
# plus compiler temporaries.
_VMEM_BUDGET = 12 * 2**20


def _vmem_bytes(n_fft: int, hop: int) -> int:
    """Upper-bound VMEM estimate for one grid cell of the kernel."""
    fc = _frames_per_cell(n_fft, hop)
    chunk = fc * hop
    kp = _ceil_to(n_fft, _LANE)
    bpad = _ceil_to(n_fft // 2 + 1, _LANE)
    out_bins = bpad  # >= mel mpad for every fusable filterbank
    scratch = _NB * fc * kp * 4                    # frames f32
    dft = kp * 2 * bpad * 4                        # DFT operator f32 (grid-constant)
    inputs = 2 * (2 * _NB * chunk * 4)             # xlo + xhi, double-buffered
    output = 2 * (_NB * fc * out_bins * 4)         # out block, double-buffered
    return scratch + dft + inputs + output


def spectrogram_pallas_supported(n_fft: int, hop: int, power) -> bool:
    if power not in (1.0, 2.0):
        return False
    if n_fft > 2048 or hop < 32 or hop > n_fft:
        return False
    return _vmem_bytes(n_fft, hop) <= _VMEM_BUDGET


def _dot_exact(x, d):
    """Exact-f32 matmul: Mosaic lowers HIGHEST as the 6-pass bf16 expansion."""
    return jax.lax.dot_general(
        x, d, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _make_kernel(n_fft: int, hop: int, fc: int, kp: int, bpad: int,
                 out_bins: int, fused_mel: bool, power: float):
    chunk = fc * hop

    def kernel(xlo_ref, xhi_ref, d_ref, fb_ref, out_ref, frames_ref):
        nb = xlo_ref.shape[0]
        # Build FC overlapping frames from the two adjacent hop-chunks with
        # STATIC lane slices (cell-local frame ti starts at ti*hop).
        for ti in range(fc):
            # a frame always STARTS in the lo chunk (start = ti*hop < fc*hop
            # = chunk) and ends at most one chunk later (_frames_per_cell
            # guarantees (fc-1)*hop + n_fft <= 2*chunk)
            start = ti * hop
            end = start + n_fft
            if end <= chunk:
                frame = xlo_ref[:, start:end]
            else:
                frame = jnp.concatenate(
                    [xlo_ref[:, start:chunk], xhi_ref[:, :end - chunk]], axis=1
                )
            frames_ref[:, ti, :n_fft] = frame
            if kp > n_fft:
                frames_ref[:, ti, n_fft:] = jnp.zeros((nb, kp - n_fft), jnp.float32)

        f2 = frames_ref[:].reshape(nb * fc, kp)
        y = _dot_exact(f2, d_ref[:])                     # (nb*fc, 2*bpad)
        p = y[:, :bpad] ** 2 + y[:, bpad:] ** 2          # (nb*fc, bpad)
        if fused_mel:
            p = _dot_exact(p, fb_ref[:])                 # (nb*fc, mpad)
        if power == 1.0:
            p = jnp.sqrt(p)
        out_ref[:] = p.reshape(nb, fc, out_bins)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop_length", "power", "interpret")
)
def power_spectrogram_pallas(
    waveform: jnp.ndarray,        # (B, T) f32, already center/extra padded
    window: jnp.ndarray,          # (n_fft,) f32 (already n_fft-centered)
    n_fft: int,
    hop_length: int,
    power: float = 2.0,
    fb: Optional[jnp.ndarray] = None,   # (n_freq, n_mels) to fuse mel GEMM
    interpret: bool = False,
) -> jnp.ndarray:
    """Time-major power/mel spectrogram (B, n_frames, n_freq|n_mels) f32.

    ``power`` of 1.0 applies sqrt AFTER the mel matmul is NOT valid; callers
    fuse mel only with power=2.0 (checked below).
    """
    if fb is not None and power != 2.0:
        raise ValueError("mel fusion requires power=2.0")
    b, t = waveform.shape
    n_frames = 1 + (t - n_fft) // hop_length
    fc = _frames_per_cell(n_fft, hop_length)
    chunk = fc * hop_length
    n_cells = -(-n_frames // fc)
    kp = _ceil_to(n_fft, _LANE)
    n_freq = n_fft // 2 + 1
    bpad = _ceil_to(n_freq, _LANE)

    # Pad batch and time; time needs one extra chunk so the hi-block of the
    # last cell is in range.
    bp = _ceil_to(b, _NB)
    tp = (n_cells + 1) * chunk
    x = jnp.pad(
        waveform.astype(jnp.float32),
        ((0, bp - b), (0, max(0, tp - t))),
    )[:, :tp]

    # Windowed DFT operator: cols [0:n_freq] = cos*w, [bpad:bpad+n_freq] = -sin*w.
    nn = jnp.arange(n_fft, dtype=jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32)
    f = jnp.arange(n_freq, dtype=nn.dtype)
    ang = (2.0 * math.pi / n_fft) * f[None, :] * nn[:, None]   # (n_fft, n_freq)
    w32 = window.astype(jnp.float32)[:, None]
    d = jnp.zeros((kp, 2 * bpad), jnp.float32)
    d = d.at[:n_fft, :n_freq].set(jnp.cos(ang).astype(jnp.float32) * w32)
    d = d.at[:n_fft, bpad:bpad + n_freq].set(-jnp.sin(ang).astype(jnp.float32) * w32)

    fused_mel = fb is not None
    if fused_mel:
        n_mels = fb.shape[1]
        mpad = _ceil_to(n_mels, _LANE)
        fbp = jnp.zeros((bpad, mpad), jnp.float32).at[:n_freq, :n_mels].set(
            fb.astype(jnp.float32)
        )
        out_bins = mpad
    else:
        fbp = jnp.zeros((8, _LANE), jnp.float32)
        out_bins = bpad

    out = pl.pallas_call(
        _make_kernel(n_fft, hop_length, fc, kp, bpad, out_bins, fused_mel, power),
        grid=(bp // _NB, n_cells),
        in_specs=[
            pl.BlockSpec((_NB, chunk), lambda bi, fi: (bi, fi), memory_space=pltpu.VMEM),
            pl.BlockSpec((_NB, chunk), lambda bi, fi: (bi, fi + 1), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, 2 * bpad), lambda bi, fi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fbp.shape, lambda bi, fi: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_NB, fc, out_bins), lambda bi, fi: (bi, fi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bp, n_cells * fc, out_bins), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_NB, fc, kp), jnp.float32)],
        interpret=interpret,
    )(x, x, d, fbp)

    bins = (fb.shape[1] if fused_mel else n_freq)
    return out[:b, :n_frames, :bins]
