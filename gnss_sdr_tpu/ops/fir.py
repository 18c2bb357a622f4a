"""FIR filtering / resampling ops for the signal conditioner.

Reference analogs: ``Fir_Filter``/``Freq_Xlating_Fir_Filter`` adapters
(gr::filter) and ``Direct_Resampler``
(``src/algorithms/resampler/gnuradio_blocks/direct_resampler_conditioner_cc.cc``).
Filter design is host-side numpy (windowed sinc — no scipy dependency);
application is jitted XLA convolution, streaming chunk by chunk with an
overlap (state) tail so chunk boundaries are seamless.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gnss_sdr_tpu.ops import iq


def design_lowpass(num_taps: int, cutoff_norm: float, window: str = "hamming") -> np.ndarray:
    """Windowed-sinc lowpass FIR. cutoff_norm = f_c / (fs/2) in (0, 1)."""
    if num_taps % 2 == 0:
        num_taps += 1
    n = np.arange(num_taps) - (num_taps - 1) / 2.0
    h = np.sinc(cutoff_norm * n) * cutoff_norm
    if window == "hamming":
        w = 0.54 - 0.46 * np.cos(2 * np.pi * np.arange(num_taps) / (num_taps - 1))
    elif window == "blackman":
        w = (0.42 - 0.5 * np.cos(2 * np.pi * np.arange(num_taps) / (num_taps - 1))
             + 0.08 * np.cos(4 * np.pi * np.arange(num_taps) / (num_taps - 1)))
    else:
        w = np.ones(num_taps)
    h = h * w
    return (h / h.sum()).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("decim",))
def fir_filter_chunk(x: jax.Array, taps: jax.Array, tail: jax.Array,
                     decim: int = 1) -> tuple[jax.Array, jax.Array]:
    """Filter one chunk with carry-over state.

    Args:
      x: [N, 2] float32 split-IQ new samples (complex64 also accepted).
      taps: [T] float32 FIR taps.
      tail: [T-1, 2] float32 last samples of the previous chunk.
      decim: integer decimation factor (N must be a multiple).

    Returns (y, new_tail): y has length N // decim; both split-IQ float32.
    """
    x = iq.as_iq2(x)
    tail = iq.as_iq2(tail)
    t = taps.shape[0]
    xx = jnp.concatenate([tail, x])                  # [T-1+N, 2]
    # real-taps FIR on both I and Q lanes in one correlation
    y = jax.vmap(lambda col: jnp.convolve(col, taps, mode="valid"),
                 in_axes=1, out_axes=1)(xx)
    if decim > 1:
        y = y[::decim]
    return y, x[-(t - 1):]


class StreamingFir:
    """Host wrapper holding the overlap tail between chunks."""

    def __init__(self, taps: np.ndarray, decim: int = 1):
        self.taps = np.asarray(taps, np.float32)
        self.decim = decim
        self._tail = np.zeros((len(taps) - 1, 2), np.float32)

    def __call__(self, x) -> np.ndarray:
        y, tail = fir_filter_chunk(iq.split(x), self.taps, self._tail,
                                   self.decim)
        self._tail = np.asarray(tail)
        return np.asarray(y)                  # [M, 2] float32 split-IQ


@functools.partial(jax.jit, static_argnames=("factor_num", "factor_den", "n_out"))
def direct_resample(x: jax.Array, factor_num: int, factor_den: int,
                    n_out: int) -> jax.Array:
    """Nearest-sample resampler (reference Direct_Resampler): picks
    x[floor(k * den / num)] for k in [0, n_out)."""
    idx = (jnp.arange(n_out) * factor_den) // factor_num
    return x[idx]


def freq_translate(x: jax.Array, f_shift_hz: float, fs: float,
                   n0: int = 0) -> jax.Array:
    """Frequency-translate a chunk (IF -> baseband); n0 = absolute sample
    index of x[0] to keep phase continuity across chunks. Split-IQ in/out."""
    z = iq.as_complex(x)
    n = n0 + jnp.arange(z.shape[0])
    ph = -2.0 * np.pi * f_shift_hz / fs * n
    return iq.as_iq2(z * jnp.exp(1j * ph.astype(jnp.float32)))
