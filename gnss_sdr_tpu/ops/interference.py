"""Interference suppression ops: pulse blanking and spectral notch excision.

Reference analogs: ``Pulse_Blanking_Filter`` (pulse_blanking_cc.cc) and
``Notch_Filter``/``Notch_Filter_Lite`` (notch_cc.cc) input filters. TPU-first
redesign: instead of streaming IIR notches, narrowband interference is
excised in the frequency domain per chunk (one MXU-FFT round trip), and pulse
blanking uses a windowed power estimate — both stateless and jit-friendly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gnss_sdr_tpu.ops import fft as mxu_fft
from gnss_sdr_tpu.ops import iq


@functools.partial(jax.jit, static_argnames=("window",))
def pulse_blanking(x: jax.Array, threshold: float = 10.0,
                   window: int = 64) -> jax.Array:
    """Zero out samples inside high-power pulses.

    A sample is blanked when its |x|^2 exceeds ``threshold`` times the chunk's
    median-ish power (mean of window-averages), evaluated on ``window``-sample
    segments — the reference's segment-wise blanking with a fixed chunk noise
    floor. Split-IQ float32 in/out (complex also accepted in-trace).
    """
    x = iq.as_complex(x)
    n = (x.shape[0] // window) * window
    p = jnp.abs(x[:n].reshape(-1, window)) ** 2
    seg_power = p.mean(axis=1)                      # [n/window]
    floor = jnp.median(seg_power)
    blank = seg_power > threshold * floor           # [n/window]
    mask = jnp.repeat(~blank, window)
    out = x[:n] * mask.astype(x.dtype)
    return iq.as_iq2(jnp.concatenate([out, x[n:]]))


@functools.partial(jax.jit, static_argnames=())
def notch_excision(x: jax.Array, threshold_db: float = 12.0) -> jax.Array:
    """Frequency-domain excision of narrowband (CW) interference.

    FFT the chunk, null bins whose power exceeds the median bin power by
    ``threshold_db``, inverse FFT. GNSS signals are ~30 dB below the noise
    floor, so any visible spectral line is interference.
    Split-IQ float32 in/out (complex also accepted in-trace).
    """
    X = mxu_fft.fft(iq.as_complex(x))
    p = jnp.abs(X) ** 2
    floor = jnp.median(p)
    keep = p < floor * jnp.float32(10.0 ** (threshold_db / 10.0))
    return iq.as_iq2(mxu_fft.ifft(X * keep.astype(X.dtype)))
