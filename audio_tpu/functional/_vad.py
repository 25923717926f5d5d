"""Voice activity detection (sox ``vad`` effect semantics).

Behavioral parity with /root/reference/src/torchaudio/functional/filtering.py:1414-1702
(cepstral-power VAD with adaptive noise estimation), redesigned for TPU: the
reference runs one Python loop iteration per measurement window with per-window
FFTs; here all window spectra are computed in one batched rFFT and the
sequential noise/measurement state machine runs inside a single ``lax.scan``.
Only the final (tiny, data-dependent) trigger backscan and the variable-length
trim happen on host — the output length is data-dependent, so this function is
not jittable end to end (same as the reference).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["vad"]


@partial(jax.jit, static_argnames=("dft_len_ws", "spectrum_start", "spectrum_end",
                                   "cepstrum_start", "cepstrum_end"))
def _vad_measures(
    frames: jnp.ndarray,  # (C, K, measure_len_ws) raw samples per window
    spectrum_window: jnp.ndarray,
    cepstrum_window: jnp.ndarray,
    dft_len_ws: int,
    spectrum_start: int,
    spectrum_end: int,
    cepstrum_start: int,
    cepstrum_end: int,
    noise_reduction_amount: float,
    measure_smooth_time_mult: float,
    noise_up_time_mult: float,
    noise_down_time_mult: float,
    trigger_meas_time_mult: float,
    boot_count_max: int,
):
    """All K measurement values and smoothed trigger levels, per channel."""
    c, k, mlen = frames.shape
    sl = spectrum_end - spectrum_start
    # batched window spectra (the only FLOP-heavy part): one rFFT over all windows
    buf = jnp.zeros((c, k, dft_len_ws), frames.dtype).at[..., :mlen].set(frames * spectrum_window)
    d_abs = jnp.abs(jnp.fft.rfft(buf, axis=-1))[..., spectrum_start:spectrum_end]  # (C, K, S)

    half = dft_len_ws >> 1
    norm = cepstrum_end - cepstrum_start

    def step(carry, d_abs_k):
        spec, noise, mean_meas, boot = carry
        booting = boot >= 0
        mult = jnp.where(booting, boot / (1.0 + boot), measure_smooth_time_mult)
        spec = spec * mult + d_abs_k * (1.0 - mult)
        d2 = spec**2
        nmult = jnp.where(
            booting, 0.0, jnp.where(d2 > noise, noise_up_time_mult, noise_down_time_mult)
        )
        noise = noise * nmult + d2 * (1.0 - nmult)
        d = jnp.sqrt(jnp.maximum(0.0, d2 - noise_reduction_amount * noise))
        ceps_buf = jnp.zeros((c, half), d.dtype).at[:, spectrum_start:spectrum_end].set(
            d * cepstrum_window
        )
        ceps = jnp.fft.rfft(ceps_buf, axis=-1)[:, cepstrum_start:cepstrum_end]
        result = jnp.sum(jnp.abs(ceps) ** 2, axis=-1)
        meas = jnp.where(result > 0, jnp.maximum(0.0, 21.0 + jnp.log(result / norm)), 0.0)
        mean_meas = mean_meas * trigger_meas_time_mult + meas * (1.0 - trigger_meas_time_mult)
        boot = jnp.where(booting, jnp.where(boot == boot_count_max, -1, boot + 1), -1)
        return (spec, noise, mean_meas, boot), (meas, mean_meas)

    init = (
        jnp.zeros((c, sl), frames.dtype),
        jnp.zeros((c, sl), frames.dtype),
        jnp.zeros((c,), frames.dtype),
        jnp.asarray(0, jnp.int32),
    )
    _, (measures, mean_meas) = jax.lax.scan(step, init, jnp.moveaxis(d_abs, 1, 0))
    return measures, mean_meas  # each (K, C)


def vad(
    waveform: jnp.ndarray,
    sample_rate: int,
    trigger_level: float = 7.0,
    trigger_time: float = 0.25,
    search_time: float = 1.0,
    allowed_gap: float = 0.25,
    pre_trigger_time: float = 0.0,
    boot_time: float = 0.35,
    noise_up_time: float = 0.1,
    noise_down_time: float = 0.01,
    noise_reduction_amount: float = 1.35,
    measure_freq: float = 20.0,
    measure_duration: Optional[float] = None,
    measure_smooth_time: float = 0.4,
    hp_filter_freq: float = 50.0,
    lp_filter_freq: float = 6000.0,
    hp_lifter_freq: float = 150.0,
    lp_lifter_freq: float = 2000.0,
) -> jnp.ndarray:
    """Trim silence from the front of a recording (sox vad semantics).

    ``waveform`` is `(time,)` or `(channels, time)`; multi-channel input is
    trimmed to the earliest voice activity in any channel. Returns audio of
    dimension `(..., trimmed_time)`.
    """
    measure_duration = 2.0 / measure_freq if measure_duration is None else measure_duration

    measure_len_ws = int(sample_rate * measure_duration + 0.5)
    measure_len_ns = measure_len_ws
    dft_len_ws = 16
    while dft_len_ws < measure_len_ws:
        dft_len_ws *= 2

    measure_period_ns = int(sample_rate / measure_freq + 0.5)
    measures_len = math.ceil(search_time * measure_freq)
    search_pre_trigger_len_ns = measures_len * measure_period_ns
    gap_len = int(allowed_gap * measure_freq + 0.5)

    fixed_pre_trigger_len_ns = int(pre_trigger_time * sample_rate + 0.5)
    samples_len_ns = fixed_pre_trigger_len_ns + search_pre_trigger_len_ns + measure_len_ns

    spectrum_window = (2.0 / math.sqrt(float(measure_len_ws))) * jnp.asarray(
        np.hanning(measure_len_ws + 1)[:-1], jnp.float32
    )

    spectrum_start = max(int(hp_filter_freq / sample_rate * dft_len_ws + 0.5), 1)
    spectrum_end = min(int(lp_filter_freq / sample_rate * dft_len_ws + 0.5), dft_len_ws // 2)

    sl = spectrum_end - spectrum_start
    cepstrum_window = (2.0 / math.sqrt(float(spectrum_end) - spectrum_start)) * jnp.asarray(
        np.hanning(sl + 1)[:-1], jnp.float32
    )

    cepstrum_start = math.ceil(sample_rate * 0.5 / lp_lifter_freq)
    cepstrum_end = min(math.floor(sample_rate * 0.5 / hp_lifter_freq), dft_len_ws // 4)
    if cepstrum_end <= cepstrum_start:
        raise ValueError(
            "Expected cepstrum_start to be smaller than cepstrum_end."
            f"Found: cepstrum_start: {cepstrum_start}, cepstrum_end: {cepstrum_end}."
        )

    noise_up_time_mult = math.exp(-1.0 / (noise_up_time * measure_freq))
    noise_down_time_mult = math.exp(-1.0 / (noise_down_time * measure_freq))
    measure_smooth_time_mult = math.exp(-1.0 / (measure_smooth_time * measure_freq))
    trigger_meas_time_mult = math.exp(-1.0 / (trigger_time * measure_freq))
    boot_count_max = int(boot_time * measure_freq - 0.5)

    shape = waveform.shape
    flat = waveform.reshape(-1, shape[-1])
    n_channels, ilen = flat.shape

    positions = list(range(measure_len_ns, ilen, measure_period_ns))
    if positions:
        starts = jnp.asarray(positions, jnp.int32) - measure_len_ws
        idx = starts[:, None] + jnp.arange(measure_len_ws)[None, :]
        frames = flat[:, idx]  # (C, K, measure_len_ws)
        measures, mean_meas = _vad_measures(
            frames.astype(jnp.float32),
            spectrum_window,
            cepstrum_window,
            dft_len_ws,
            spectrum_start,
            spectrum_end,
            cepstrum_start,
            cepstrum_end,
            noise_reduction_amount,
            measure_smooth_time_mult,
            noise_up_time_mult,
            noise_down_time_mult,
            trigger_meas_time_mult,
            boot_count_max,
        )
        measures = np.asarray(measures)  # (K, C)
        mean_meas = np.asarray(mean_meas)
    else:
        measures = np.zeros((0, n_channels), np.float32)
        mean_meas = np.zeros((0, n_channels), np.float32)

    # host-side trigger search over the (tiny) measurement sequence,
    # mirroring filtering.py:1669-1695
    has_triggered = False
    flushed_len_ns = 0
    pos = 0
    trig_win = mean_meas >= trigger_level  # (K, C)
    hit = np.argwhere(trig_win.any(axis=1))
    if hit.size:
        k_star = int(hit[0, 0])
        pos = positions[k_star]
        has_triggered = True
        c_star = int(np.argmax(trig_win[k_star]))
        n = measures_len
        measures_index = k_star % n
        # reconstruct the measures ring buffer state at the trigger window
        ring = np.zeros((n_channels, n), np.float32)
        lo = max(0, k_star - n + 1)
        for kk in range(lo, k_star + 1):
            ring[:, kk % n] = measures[kk]
        num_measures_to_flush = 0
        for i in range(c_star, n_channels):
            k = measures_index
            j_trigger = n
            j_zero = n
            j = 0
            for j in range(n):
                if (ring[i, k] >= trigger_level) and (j <= j_trigger + gap_len):
                    j_zero = j_trigger = j
                elif (ring[i, k] == 0) and (j_trigger >= j_zero):
                    j_zero = j
                k = (k + n - 1) % n
            j = min(j, j_zero)
            num_measures_to_flush = min(max(num_measures_to_flush, j), n)
        flushed_len_ns = (measures_len - num_measures_to_flush) * measure_period_ns
    elif positions:
        pos = positions[-1]

    if not has_triggered and shape[-1] >= fixed_pre_trigger_len_ns:
        res = flat[..., :fixed_pre_trigger_len_ns]
        return res.reshape(shape[:-1] + (fixed_pre_trigger_len_ns,))

    res = flat[:, max(pos - samples_len_ns + flushed_len_ns, 0):]
    return res.reshape(shape[:-1] + res.shape[-1:])
