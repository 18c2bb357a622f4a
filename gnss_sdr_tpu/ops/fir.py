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


# ---------------------------------------------------------------------------
# Fractional (MMSE) resampler — reference Mmse_Resampler
# ---------------------------------------------------------------------------


def _sinc_bank(n_phases: int = 128, n_taps: int = 8) -> np.ndarray:
    """Polyphase windowed-sinc interpolation bank [n_phases, n_taps]."""
    h = np.zeros((n_phases, n_taps), np.float32)
    center = n_taps // 2 - 1
    for ph in range(n_phases):
        mu = ph / n_phases
        t = np.arange(n_taps) - center - mu
        w = np.hamming(2 * n_taps)[n_taps // 2: n_taps // 2 + n_taps]
        h[ph] = (np.sinc(t) * w).astype(np.float32)
        h[ph] /= h[ph].sum()
    return h


@functools.partial(jax.jit, static_argnames=("n_out_max",))
def fractional_resample_chunk(x2: jax.Array, pos0: jax.Array,
                              ratio: jax.Array, bank: jax.Array,
                              *, n_out_max: int) -> tuple[jax.Array, jax.Array]:
    """Polyphase sinc interpolation (reference Mmse_Resampler analog).

    Args:
      x2: [N, 2] float32 split-IQ input (complex accepted in-trace).
      pos0: float32 fractional input position of output sample 0.
      ratio: float32 input samples per output sample (fs_in / fs_out).
      bank: [P, T] float32 polyphase filter bank (_sinc_bank()).
      n_out_max: static output buffer length.

    Returns (y2 [n_out_max, 2], n_valid): entries past n_valid are zero.
    The caller advances pos0 by n_valid * ratio - consumed for streaming.
    """
    x2 = iq.as_iq2(x2)
    n_in = x2.shape[0]
    n_ph, n_taps = bank.shape
    center = n_taps // 2 - 1
    k = jnp.arange(n_out_max, dtype=jnp.float32)
    pos = pos0 + k * ratio                              # [M]
    base = jnp.floor(pos).astype(jnp.int32)
    mu = pos - base.astype(jnp.float32)
    ph = jnp.clip((mu * n_ph).astype(jnp.int32), 0, n_ph - 1)
    valid = (base - center >= 0) & (base - center + n_taps <= n_in)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    safe = jnp.clip(base - center, 0, max(n_in - n_taps, 0))
    idx = safe[:, None] + jnp.arange(n_taps, dtype=jnp.int32)[None, :]
    taps = bank[ph]                                     # [M, T]
    win = x2[idx]                                       # [M, T, 2]
    y2 = jnp.einsum("mt,mtc->mc", taps, win)
    y2 = y2 * valid[:, None].astype(jnp.float32)
    return y2.astype(jnp.float32), n_valid


class StreamingFractionalResampler:
    """Host wrapper: arbitrary fs_in -> fs_out over chunked input
    (reference Mmse_Resampler adapter)."""

    def __init__(self, fs_in: float, fs_out: float, n_taps: int = 8):
        self.ratio = fs_in / fs_out
        self.bank = _sinc_bank(n_taps=n_taps)
        self._tail = np.zeros((0, 2), np.float32)
        self._pos = float(n_taps)        # start clear of the left edge
        self.n_taps = n_taps

    def __call__(self, x) -> np.ndarray:
        x2 = np.concatenate([self._tail, iq.split(x)], axis=0)
        n_in = len(x2)
        n_out_max = int(np.ceil(n_in / self.ratio)) + 2
        y2, n_valid = fractional_resample_chunk(
            x2, np.float32(self._pos), np.float32(self.ratio), self.bank,
            n_out_max=n_out_max)
        n_valid = int(n_valid)
        y = np.asarray(y2)[:n_valid]
        # keep enough tail for the interpolation window, rebase position
        next_pos = self._pos + n_valid * self.ratio
        keep_from = max(0, int(np.floor(next_pos)) - self.n_taps)
        self._tail = x2[keep_from:]
        self._pos = next_pos - keep_from
        return y
