"""Multi-channel beamforming ops (PSD, MVDR, RTF).

Behavioral parity with /root/reference/src/torchaudio/functional/functional.py:
psd (:1799-1843), mvdr_weights_souden (:1917-1977), mvdr_weights_rtf
(:1979-2063), rtf_evd (:2065-2087), rtf_power (:2089-2148),
apply_beamforming (:2150-2188).  Complex linear algebra through
``jnp.linalg`` (XLA); all jittable/vmappable.
"""

from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp

__all__ = [
    "psd",
    "mvdr_weights_souden",
    "mvdr_weights_rtf",
    "rtf_evd",
    "rtf_power",
    "apply_beamforming",
]


def psd(
    specgram: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    normalize: bool = True,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """Cross-channel PSD matrix: (..., channel, freq, time) -> (..., freq, channel, channel)."""
    specgram = jnp.swapaxes(specgram, -3, -2)  # (..., freq, channel, time)
    outer = jnp.einsum("...ct,...et->...tce", specgram, specgram.conj())
    if mask is not None:
        if mask.shape[:-1] != specgram.shape[:-2] or mask.shape[-1] != specgram.shape[-1]:
            raise ValueError(
                "The dimensions of mask except the channel dimension should be the same as specgram. "
                f"Found {mask.shape} for mask and {specgram.shape} for specgram."
            )
        if normalize:
            mask = mask / (mask.sum(axis=-1, keepdims=True) + eps)
        outer = outer * mask[..., None, None]
    return outer.sum(axis=-3)


def _mat_trace(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.trace(x, axis1=-2, axis2=-1)


def _tik_reg(mat: jnp.ndarray, reg: float = 1e-7, eps: float = 1e-8) -> jnp.ndarray:
    c = mat.shape[-1]
    eye = jnp.eye(c, dtype=mat.dtype)
    epsilon = _mat_trace(mat).real[..., None, None] * reg + eps
    return mat + epsilon * eye


def _assert_psd_matrices(psd_s: jnp.ndarray, psd_n: jnp.ndarray) -> None:
    if psd_s.ndim < 3 or psd_n.ndim < 3:
        raise ValueError(
            "Expected at least 3D Tensor (..., freq, channel, channel) for psd_s and psd_n. "
            f"Found {psd_s.shape} for psd_s and {psd_n.shape} for psd_n."
        )
    if not (jnp.iscomplexobj(psd_s) and jnp.iscomplexobj(psd_n)):
        raise TypeError("The type of psd_s and psd_n must be complex.")
    if psd_s.shape != psd_n.shape:
        raise ValueError(f"The dimensions of psd_s and psd_n should be the same. Found {psd_s.shape} and {psd_n.shape}.")
    if psd_s.shape[-1] != psd_s.shape[-2]:
        raise ValueError(f"The last two dimensions of psd_s should be the same. Found {psd_s.shape}.")


def mvdr_weights_souden(
    psd_s: jnp.ndarray,
    psd_n: jnp.ndarray,
    reference_channel: Union[int, jnp.ndarray],
    diagonal_loading: bool = True,
    diag_eps: float = 1e-7,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """MVDR weights via the Souden formula; returns (..., freq, channel)."""
    _assert_psd_matrices(psd_s, psd_n)
    if diagonal_loading:
        psd_n = _tik_reg(psd_n, reg=diag_eps)
    numerator = jnp.linalg.solve(psd_n, psd_s)
    ws = numerator / (_mat_trace(numerator)[..., None, None] + eps)
    if isinstance(reference_channel, int):
        return ws[..., :, reference_channel]
    ref = reference_channel.astype(psd_n.dtype)
    return jnp.einsum("...fce,...e->...fc", ws, ref)


def mvdr_weights_rtf(
    rtf: jnp.ndarray,
    psd_n: jnp.ndarray,
    reference_channel: Optional[Union[int, jnp.ndarray]] = None,
    diagonal_loading: bool = True,
    diag_eps: float = 1e-7,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """MVDR weights from an RTF/steering vector; returns (..., freq, channel)."""
    if rtf.ndim < 2:
        raise ValueError(f"Expected at least 2D Tensor (..., freq, channel) for rtf. Found {rtf.shape}.")
    if psd_n.ndim < 3:
        raise ValueError(f"Expected at least 3D Tensor (..., freq, channel, channel) for psd_n. Found {psd_n.shape}.")
    if not (jnp.iscomplexobj(rtf) and jnp.iscomplexobj(psd_n)):
        raise TypeError("The type of rtf and psd_n must be complex.")
    if rtf.shape != psd_n.shape[:-1]:
        raise ValueError(
            "The dimensions of rtf and psd_n (without its last dimension) should match. "
            f"Found {rtf.shape} for rtf and {psd_n.shape} for psd_n."
        )
    if psd_n.shape[-1] != psd_n.shape[-2]:
        raise ValueError(f"The last two dimensions of psd_n should be the same. Found {psd_n.shape}.")
    if diagonal_loading:
        psd_n = _tik_reg(psd_n, reg=diag_eps)
    numerator = jnp.linalg.solve(psd_n, rtf[..., None])[..., 0]
    denominator = jnp.einsum("...d,...d->...", rtf.conj(), numerator)
    weights = numerator / (denominator.real[..., None] + eps)
    if reference_channel is not None:
        if isinstance(reference_channel, int):
            scale = rtf[..., reference_channel].conj()
        else:
            ref = reference_channel.astype(psd_n.dtype)
            scale = jnp.einsum("...fc,...c->...f", rtf.conj(), ref)
        weights = weights * scale[..., None]
    return weights


def rtf_evd(psd_s: jnp.ndarray) -> jnp.ndarray:
    """RTF via eigendecomposition (eigenvector of the largest eigenvalue)."""
    if not jnp.iscomplexobj(psd_s):
        raise TypeError(f"The type of psd_s must be complex. Found {psd_s.dtype}.")
    if psd_s.shape[-1] != psd_s.shape[-2]:
        raise ValueError(f"The last two dimensions of psd_s should be the same. Found {psd_s.shape}.")
    _, v = jnp.linalg.eigh(psd_s)  # ascending eigenvalues
    return v[..., -1]


def rtf_power(
    psd_s: jnp.ndarray,
    psd_n: jnp.ndarray,
    reference_channel: Union[int, jnp.ndarray],
    n_iter: int = 3,
    diagonal_loading: bool = True,
    diag_eps: float = 1e-7,
) -> jnp.ndarray:
    """RTF via the power method; returns (..., freq, channel)."""
    _assert_psd_matrices(psd_s, psd_n)
    if n_iter <= 0:
        raise ValueError("The number of iteration must be greater than 0.")
    if diagonal_loading:
        psd_n = _tik_reg(psd_n, reg=diag_eps)
    phi = jnp.linalg.solve(psd_n, psd_s)
    if isinstance(reference_channel, int):
        rtf = phi[..., reference_channel]
    else:
        ref = reference_channel.astype(psd_n.dtype)
        rtf = jnp.einsum("...fce,...e->...fc", phi, ref)
    rtf = rtf[..., None]
    if n_iter >= 2:
        for _ in range(n_iter - 2):
            rtf = phi @ rtf
        rtf = psd_s @ rtf
    else:
        rtf = psd_n @ rtf
    return rtf[..., 0]


def apply_beamforming(beamform_weights: jnp.ndarray, specgram: jnp.ndarray) -> jnp.ndarray:
    """w^H Y: (..., freq, channel) x (..., channel, freq, time) -> (..., freq, time)."""
    if beamform_weights.shape[:-2] != specgram.shape[:-3]:
        raise ValueError(
            "The leading dimensions of beamform_weights and specgram must match. "
            f"Found {beamform_weights.shape} for beamform_weights and {specgram.shape} for specgram."
        )
    if not (jnp.iscomplexobj(beamform_weights) and jnp.iscomplexobj(specgram)):
        raise TypeError("The type of beamform_weights and specgram must be complex.")
    return jnp.einsum("...fc,...cft->...ft", beamform_weights.conj(), specgram)
