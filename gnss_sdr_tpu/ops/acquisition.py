"""Batched PCPS (parallel code-phase search) acquisition ops.

TPU-native redesign of the reference's FFT acquisition
(``src/algorithms/acquisition/gnuradio_blocks/pcps_acquisition.cc:633``
``acquisition_core``): instead of a per-Doppler-bin loop of FFTW calls on one
satellite at a time, the whole [signal x doppler x code-phase] cube is one
batched XLA FFT computation — Doppler bins and satellites map onto the batch
dimensions of ``jnp.fft``, which is how the TPU wants this shaped.

Conventions match the reference so its config thresholds carry over:
  * ``max_power`` statistic  = |corr_peak|^2 / (N^2 * mean|x|^2)
    (identical to pcps_acquisition::max_to_input_power_statistic with FFTW
    normalization folded in, pcps_acquisition.cc:529)
  * ``cfar`` statistic = first peak / second peak outside +/-1 chip
    (first_vs_second_peak_statistic, pcps_acquisition.cc:564)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gnss_sdr_tpu.ops import fft as mxu_fft
from gnss_sdr_tpu.ops import iq


class AcqGridResult(NamedTuple):
    """Per-signal acquisition grid reduction results (leading axis = signal)."""

    test_max_power: jax.Array   # [S] max/input-power statistic
    test_cfar: jax.Array        # [S] first/second peak ratio
    code_phase: jax.Array       # [S] int32 sample index of peak (within code period)
    doppler_hz: jax.Array       # [S] float32 doppler of peak
    magnitude: jax.Array        # [S] raw |corr|^2 peak (FFTW-normalized)


def _dwell_windows(x: jax.Array, n_fft: int, noncoherent: int,
                   stride: int | None) -> jax.Array:
    """[noncoherent, n_fft] dwell windows from a flat sample vector.

    ``stride`` decouples the dwell advance from the (possibly
    friendly-padded, see ops/fft.friendly_len) FFT window: consecutive
    dwells must start a code-period multiple apart so their correlation
    peaks land on the SAME lag and accumulate noncoherently, even when
    n_fft was padded past the natural dwell length."""
    if stride is None or stride == n_fft:
        return x[: noncoherent * n_fft].reshape(noncoherent, n_fft)
    return jnp.stack([x[i * stride: i * stride + n_fft]
                      for i in range(noncoherent)])


def make_doppler_grid(doppler_max: float, doppler_step: float,
                      doppler_center: float = 0.0) -> np.ndarray:
    """Doppler bin centers, reference-compatible ordering (-max .. +max)."""
    n_bins = int(np.floor(2.0 * doppler_max / doppler_step)) + 1
    return (doppler_center - doppler_max
            + doppler_step * np.arange(n_bins)).astype(np.float32)


@functools.partial(
    jax.jit,
    static_argnames=("fs", "samples_per_code", "samples_per_chip",
                     "noncoherent", "stride"))
def pcps_search(x: jax.Array, code_fft_conj: jax.Array, dopplers: jax.Array,
                *, fs: float, samples_per_code: int, samples_per_chip: int,
                noncoherent: int = 1, stride: int | None = None
                ) -> AcqGridResult:
    """Run the full PCPS grid for a batch of signals.

    Args:
      x: [noncoherent * n_fft, 2] float32 split-IQ input samples (n_fft per
        dwell); complex64 also accepted (see ops/iq.py).
      code_fft_conj: [S, n_fft, 2] float32 split conj(FFT(zero-padded local
        code)); complex64 also accepted.
      dopplers: [D] float32 Doppler bins (Hz).
      fs: sample rate (Hz).
      samples_per_code: length of one code period in samples (<= n_fft).
      samples_per_chip: for the CFAR exclusion window.
      noncoherent: number of accumulated dwells.

    Returns AcqGridResult with statistics per signal (all real dtypes).
    """
    x = iq.as_complex(x)
    code_fft_conj = iq.as_complex(code_fft_conj)
    n_fft = code_fft_conj.shape[-1]
    xb = _dwell_windows(x, n_fft, noncoherent, stride)

    n = jnp.arange(n_fft, dtype=jnp.float32) * jnp.float32(1.0 / fs)
    # [D, N] Doppler wipeoff carriers
    carriers = jnp.exp(jnp.complex64(-2j * np.pi) * (dopplers[:, None] * n[None, :]))

    # [B, D, N] wiped input, one batched MXU-FFT (see ops/fft.py — the FFT is
    # expressed as DFT matmuls so it runs on the MXU and needs no FFT
    # custom-call support from the backend)
    xw = xb[:, None, :] * carriers[None, :, :]
    Xf = mxu_fft.fft(xw)

    def per_signal(cfc):
        # cfc: [N] -> grid [D, N] noncoherently accumulated over B
        corr = mxu_fft.ifft(Xf * cfc[None, None, :])
        # FFTW-normalized magnitude (reference uses unnormalized transforms)
        mag = jnp.sum(jnp.abs(corr) ** 2, axis=0) * jnp.float32(n_fft * n_fft)
        return mag

    # scan over signals to bound peak memory ([D, N] live per signal)
    def scan_body(_, cfc):
        mag = per_signal(cfc)  # [D, N]
        # restrict code-phase peak search to one code period
        mag_cp = mag[:, :samples_per_code]
        flat_idx = jnp.argmax(mag_cp)
        d_idx, t_idx = jnp.unravel_index(flat_idx, mag_cp.shape)
        peak = mag_cp[d_idx, t_idx]

        # CFAR: second peak in the same Doppler row, outside +/-1 chip
        row = mag_cp[d_idx]
        pos = jnp.arange(samples_per_code, dtype=jnp.int32)
        dist = jnp.abs(pos - t_idx)
        dist = jnp.minimum(dist, samples_per_code - dist)  # circular distance
        row_masked = jnp.where(dist >= samples_per_chip, row, jnp.float32(0))
        second = jnp.max(row_masked)

        return None, (peak, d_idx, t_idx, second)

    _, (peaks, d_idxs, t_idxs, seconds) = jax.lax.scan(
        scan_body, None, code_fft_conj)

    input_power = jnp.mean(jnp.abs(xb) ** 2) * jnp.float32(noncoherent)
    nrm = jnp.float32(n_fft) ** 4
    test_max_power = peaks / nrm / input_power
    test_cfar = peaks / jnp.maximum(seconds, jnp.float32(1e-30))

    return AcqGridResult(
        test_max_power=test_max_power.astype(jnp.float32),
        test_cfar=test_cfar.astype(jnp.float32),
        code_phase=t_idxs.astype(jnp.int32),
        doppler_hz=dopplers[d_idxs].astype(jnp.float32),
        magnitude=peaks.astype(jnp.float32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("fs", "samples_per_code", "samples_per_chip",
                     "noncoherent", "stride"))
def pcps_search_grids(x: jax.Array, code_fft_conj: jax.Array,
                      dopplers_sd: jax.Array, *, fs: float,
                      samples_per_code: int, samples_per_chip: int,
                      noncoherent: int = 1, stride: int | None = None
                      ) -> AcqGridResult:
    """PCPS with a PER-SIGNAL Doppler grid — one device call for the whole
    candidate batch.

    This is the batched TPU shape of two reference per-satellite loops:
    assisted acquisition (``pcps_assisted_acquisition_cc``: a narrow grid
    around each satellite's predicted Doppler) and GLONASS FDMA (each slot's
    IF offset folded into its grid center — translating the input by f_if
    and searching [-max, max] is identical to searching [f_if-max, f_if+max]
    on the untranslated input).

    Args:
      x: [noncoherent * n_fft, 2] float32 split-IQ input (complex64 ok).
      code_fft_conj: [S, n_fft, 2] split conj(FFT(code)) per signal.
      dopplers_sd: [S, D] float32 Doppler bins, one row per signal.

    Returns AcqGridResult ([S] leaves); doppler_hz is in the grid's frame
    (subtract the per-signal center to recover the residual Doppler).
    """
    x = iq.as_complex(x)
    code_fft_conj = iq.as_complex(code_fft_conj)
    n_fft = code_fft_conj.shape[-1]
    xb = _dwell_windows(x, n_fft, noncoherent, stride)
    n = jnp.arange(n_fft, dtype=jnp.float32) * jnp.float32(1.0 / fs)

    def scan_body(_, inp):
        cfc, dops = inp                                  # [N], [D]
        carriers = jnp.exp(jnp.complex64(-2j * np.pi)
                           * (dops[:, None] * n[None, :]))      # [D, N]
        xw = xb[:, None, :] * carriers[None, :, :]              # [B, D, N]
        Xf = mxu_fft.fft(xw)
        corr = mxu_fft.ifft(Xf * cfc[None, None, :])
        mag = jnp.sum(jnp.abs(corr) ** 2, axis=0) * jnp.float32(n_fft * n_fft)
        mag_cp = mag[:, :samples_per_code]
        flat_idx = jnp.argmax(mag_cp)
        d_idx, t_idx = jnp.unravel_index(flat_idx, mag_cp.shape)
        peak = mag_cp[d_idx, t_idx]
        row = mag_cp[d_idx]
        pos = jnp.arange(samples_per_code, dtype=jnp.int32)
        dist = jnp.abs(pos - t_idx)
        dist = jnp.minimum(dist, samples_per_code - dist)
        second = jnp.max(jnp.where(dist >= samples_per_chip, row, 0.0))
        return None, (peak, t_idx, second, dops[d_idx])

    _, (peaks, t_idxs, seconds, dops_pk) = jax.lax.scan(
        scan_body, None, (code_fft_conj, dopplers_sd))

    input_power = jnp.mean(jnp.abs(xb) ** 2) * jnp.float32(noncoherent)
    nrm = jnp.float32(n_fft) ** 4
    return AcqGridResult(
        test_max_power=(peaks / nrm / input_power).astype(jnp.float32),
        test_cfar=(peaks / jnp.maximum(seconds, 1e-30)).astype(jnp.float32),
        code_phase=t_idxs.astype(jnp.int32),
        doppler_hz=dops_pk.astype(jnp.float32),
        magnitude=peaks.astype(jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("fs",))
def fine_doppler_search(x: jax.Array, code_replica: jax.Array,
                        dopplers: jax.Array, *, fs: float) -> jax.Array:
    """Step-two fine-Doppler refinement at a fixed code phase.

    Correlates the code-wiped input against a fine Doppler grid (the reference's
    ``d_step_two`` path, pcps_acquisition.cc:772) — returns [D] powers.

    Args:
      x: [N, 2] float32 split-IQ samples aligned so the code starts at
        sample 0 (complex64 also accepted).
      code_replica: [N] float32 sampled local code.
      dopplers: [D] float32 fine Doppler bins.
    """
    x = iq.as_complex(x)
    n = jnp.arange(x.shape[0], dtype=jnp.float32) * jnp.float32(1.0 / fs)
    wiped = x * code_replica  # code wipeoff
    carriers = jnp.exp(jnp.complex64(-2j * np.pi) * (dopplers[:, None] * n[None, :]))
    corr = carriers @ wiped  # [D] MXU-friendly matvec
    return jnp.abs(corr) ** 2


def simple_threshold_from_pfa(pfa: float, n_cells: int, n_fft: int) -> float:
    """Exponential-cell CFAR threshold for the max/power statistic."""
    lam = -np.log(max(1.0 - (1.0 - pfa) ** (1.0 / float(n_cells)), 1e-300))
    return float(2.0 * lam / n_fft)


class TongDetector:
    """Tong sequential detector (reference: pcps_tong_acquisition_cc).

    Counter starts at B; +1 on a per-dwell hit, -1 on a miss; declare
    detection at A, dismissal at 0. Robust near-threshold integration without
    fixing the dwell count in advance.
    """

    def __init__(self, a: int = 8, b: int = 2, max_dwells: int = 30):
        self.a = a
        self.b = b
        self.max_dwells = max_dwells
        self.reset()

    def reset(self) -> None:
        self.count = self.b
        self.dwells = 0

    def update(self, hit: bool) -> str:
        """Returns 'detected' | 'dismissed' | 'pending'."""
        self.dwells += 1
        self.count += 1 if hit else -1
        if self.count >= self.a:
            return "detected"
        if self.count <= 0 or self.dwells >= self.max_dwells:
            return "dismissed"
        return "pending"


@functools.partial(
    jax.jit, static_argnames=("fs", "samples_per_code", "folding_factor",
                              "samples_per_chip"))
def quicksync_search(x: jax.Array, code_fft_conj_folded: jax.Array,
                     dopplers: jax.Array, *, fs: float, samples_per_code: int,
                     folding_factor: int, samples_per_chip: int
                     ) -> AcqGridResult:
    """QuickSync folded acquisition (reference pcps_quicksync_acquisition_cc).

    The dwell is folded by summing ``folding_factor`` consecutive segments
    before the FFT, shrinking the correlation to N/F points: F times less
    FFT work at ~10 log10(F) dB sensitivity cost. The returned code phase is
    the FOLDED phase — the true phase is one of
    ``folded_phase + k * N/F`` (resolve with resolve_folded_phase).

    Args:
      x: [samples_per_code, 2] split-IQ dwell (one code period).
      code_fft_conj_folded: [S, N/F, 2] split conj(FFT(folded local code)).
    """
    xc = iq.as_complex(x)
    cfc = iq.as_complex(code_fft_conj_folded)
    nf = samples_per_code // folding_factor
    n_full = nf * folding_factor
    # Doppler wipeoff BEFORE folding — the fold sums segments nf/fs apart,
    # which only stay coherent once the carrier is removed
    n = jnp.arange(n_full, dtype=jnp.float32) * jnp.float32(1.0 / fs)
    carriers = jnp.exp(jnp.complex64(-2j * np.pi)
                       * (dopplers[:, None] * n[None, :]))
    xw_full = xc[None, :n_full] * carriers                 # [D, N]
    xw = xw_full.reshape(-1, folding_factor, nf).sum(axis=1)   # [D, Nf]
    Xf = mxu_fft.fft(xw)

    def scan_body(_, cfc_s):
        corr = mxu_fft.ifft(Xf * cfc_s[None, :])
        mag = jnp.abs(corr) ** 2 * jnp.float32(nf * nf)
        flat = jnp.argmax(mag)
        d_idx, t_idx = jnp.unravel_index(flat, mag.shape)
        peak = mag[d_idx, t_idx]
        row = mag[d_idx]
        pos = jnp.arange(nf, dtype=jnp.int32)
        dist = jnp.abs(pos - t_idx)
        dist = jnp.minimum(dist, nf - dist)
        second = jnp.max(jnp.where(dist >= samples_per_chip, row, 0.0))
        return None, (peak, d_idx, t_idx, second)

    _, (peaks, d_idxs, t_idxs, seconds) = jax.lax.scan(
        scan_body, None, cfc)
    power = jnp.mean(jnp.abs(xw[0]) ** 2)
    nrm = jnp.float32(nf) ** 4
    return AcqGridResult(
        test_max_power=(peaks / nrm / power).astype(jnp.float32),
        test_cfar=(peaks / jnp.maximum(seconds, 1e-30)).astype(jnp.float32),
        code_phase=t_idxs.astype(jnp.int32),
        doppler_hz=dopplers[d_idxs].astype(jnp.float32),
        magnitude=peaks.astype(jnp.float32),
    )


def resolve_folded_phase(x: np.ndarray, code_replica: np.ndarray,
                         folded_phase: int, doppler_hz: float, *,
                         fs: float, folding_factor: int) -> int:
    """Disambiguate a QuickSync folded code phase (host-side): test the F
    candidate unfolded phases by direct correlation, return the best."""
    x = np.asarray(x)
    if x.ndim == 2:
        x = x[:, 0] + 1j * x[:, 1]
    n = len(code_replica)
    nf = n // folding_factor
    t = np.arange(n) / fs
    wiped = x[:n] * np.exp(-2j * np.pi * doppler_hz * t)
    best_k, best_m = 0, -1.0
    for k in range(folding_factor):
        ph = folded_phase + k * nf
        m = abs(np.sum(wiped * np.roll(code_replica, ph)))
        if m > best_m:
            best_m, best_k = m, k
    return folded_phase + best_k * nf


@functools.partial(
    jax.jit,
    static_argnames=("fs", "samples_per_code", "samples_per_chip"))
def pcps_8ms_search(x: jax.Array, code_fft_conj_a: jax.Array,
                    code_fft_conj_b: jax.Array, dopplers: jax.Array, *,
                    fs: float, samples_per_code: int, samples_per_chip: int
                    ) -> AcqGridResult:
    """Two-code-period coherent PCPS (galileo_pcps_8ms_acquisition_cc).

    The reference extends Galileo E1 coherent integration to 8 ms (two 4 ms
    primary-code periods) by correlating against TWO local replicas: code A
    = two identical periods, code B = two periods with the second inverted
    (galileo_pcps_8ms_acquisition_cc.cc:133-140) — whichever hypothesis
    matches the I/NAV symbol sign across the boundary wins, so a data-bit
    flip inside the window costs nothing. Grid cell = max(|corr_A|^2,
    |corr_B|^2), one batched FFT pass for all signals and both hypotheses.

    Args:
      x: [2 * samples_per_code, 2] float32 split-IQ dwell (8 ms; complex64
        also accepted).
      code_fft_conj_a/b: [S, N, 2] split conj(FFT(replica)) with
        N = 2 * samples_per_code.
      dopplers: [D] float32 Doppler bins.
    """
    xc = iq.as_complex(x)
    ca = iq.as_complex(code_fft_conj_a)
    cb = iq.as_complex(code_fft_conj_b)
    n_fft = ca.shape[-1]
    n = jnp.arange(n_fft, dtype=jnp.float32) * jnp.float32(1.0 / fs)
    carriers = jnp.exp(jnp.complex64(-2j * np.pi)
                       * (dopplers[:, None] * n[None, :]))
    Xf = mxu_fft.fft(xc[None, :n_fft] * carriers)        # [D, N]

    def scan_body(_, cfcs):
        cfa, cfb = cfcs
        mag_a = jnp.abs(mxu_fft.ifft(Xf * cfa[None, :])) ** 2
        mag_b = jnp.abs(mxu_fft.ifft(Xf * cfb[None, :])) ** 2
        mag = jnp.maximum(mag_a, mag_b) * jnp.float32(n_fft * n_fft)
        mag_cp = mag[:, :samples_per_code]
        flat = jnp.argmax(mag_cp)
        d_idx, t_idx = jnp.unravel_index(flat, mag_cp.shape)
        peak = mag_cp[d_idx, t_idx]
        row = mag_cp[d_idx]
        pos = jnp.arange(samples_per_code, dtype=jnp.int32)
        dist = jnp.abs(pos - t_idx)
        dist = jnp.minimum(dist, samples_per_code - dist)
        second = jnp.max(jnp.where(dist >= samples_per_chip, row, 0.0))
        return None, (peak, d_idx, t_idx, second)

    _, (peaks, d_idxs, t_idxs, seconds) = jax.lax.scan(
        scan_body, None, (ca, cb))
    input_power = jnp.mean(jnp.abs(xc[:n_fft]) ** 2)
    nrm = jnp.float32(n_fft) ** 4
    return AcqGridResult(
        test_max_power=(peaks / nrm / input_power).astype(jnp.float32),
        test_cfar=(peaks / jnp.maximum(seconds, 1e-30)).astype(jnp.float32),
        code_phase=t_idxs.astype(jnp.int32),
        doppler_hz=dopplers[d_idxs].astype(jnp.float32),
        magnitude=peaks.astype(jnp.float32),
    )


def caf_triangular_smooth(v: jax.Array, caf_bins_half: int) -> jax.Array:
    """Triangular-weighted Doppler smoothing of per-bin peak magnitudes.

    The reference's CAF filter (galileo_e5a_noncoherent_iq_acquisition_caf_
    cc.cc:611-697): each Doppler bin is replaced by the average of its
    +-caf_bins_half neighbours under weights w(k) = 1 - |k| / (2 * H),
    normalized by the weight mass actually inside the vector (the edge
    normalization the reference computes in closed form). Secondary-code
    sign flips split the E5a correlation peak into Doppler sidelobes; the
    smoothing re-centres the maximum on the true Doppler.

    Args:
      v: [..., D] per-Doppler peak magnitudes.
      caf_bins_half: H (CAF_window_hz / (2 * doppler_step) in the reference).
    """
    if caf_bins_half <= 0:
        return v
    h = int(caf_bins_half)
    wf = 0.5 / float(h)
    w = (1.0 - wf * np.abs(np.arange(-h, h + 1))).astype(np.float32)  # [2H+1]
    d = v.shape[-1]
    # gather the window around each bin; out-of-range neighbours get weight 0
    idx = jnp.arange(d)[:, None] + jnp.arange(-h, h + 1)[None, :]   # [D, 2H+1]
    inside = (idx >= 0) & (idx < d)
    idxc = jnp.clip(idx, 0, d - 1)
    vals = v[..., idxc]                                   # [..., D, 2H+1]
    wm = jnp.asarray(w)[None, :] * inside.astype(jnp.float32)
    return jnp.sum(vals * wm, axis=-1) / jnp.sum(wm, axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("fs", "samples_per_code", "samples_per_chip",
                     "noncoherent", "caf_bins_half", "both_components",
                     "stride"))
def noncoherent_iq_caf_search(x: jax.Array, code_fft_conj_data: jax.Array,
                              code_fft_conj_pilot: jax.Array,
                              dopplers: jax.Array, *, fs: float,
                              samples_per_code: int, samples_per_chip: int,
                              noncoherent: int = 1, caf_bins_half: int = 0,
                              both_components: bool = True,
                              stride: int | None = None) -> AcqGridResult:
    """Galileo E5a noncoherent I/Q acquisition with optional CAF filtering
    (galileo_e5a_noncoherent_iq_acquisition_caf_cc).

    The E5a-I (data) and E5a-Q (pilot) components are correlated separately
    and combined NONcoherently per grid cell (``both_signal_components``);
    with ``caf_bins_half > 0`` the per-Doppler peak magnitudes of each
    component are triangularly smoothed over Doppler and the reported
    Doppler is re-selected from the smoothed sum — resolving the Doppler
    ambiguity the secondary-code sign transitions create. Code phase and
    the test statistics come from the raw combined grid.

    Shapes as :func:`pcps_search`, one code-FFT stack per component.
    """
    xc = iq.as_complex(x)
    cd = iq.as_complex(code_fft_conj_data)
    cp = iq.as_complex(code_fft_conj_pilot)
    n_fft = cd.shape[-1]
    xb = _dwell_windows(xc, n_fft, noncoherent, stride)
    n = jnp.arange(n_fft, dtype=jnp.float32) * jnp.float32(1.0 / fs)
    carriers = jnp.exp(jnp.complex64(-2j * np.pi)
                       * (dopplers[:, None] * n[None, :]))
    Xf = mxu_fft.fft(xb[:, None, :] * carriers[None, :, :])   # [B, D, N]

    def scan_body(_, cfcs):
        cfd, cfp = cfcs
        mag_i = jnp.sum(jnp.abs(
            mxu_fft.ifft(Xf * cfd[None, None, :])) ** 2, axis=0)
        mag = mag_i
        if both_components:
            mag_q = jnp.sum(jnp.abs(
                mxu_fft.ifft(Xf * cfp[None, None, :])) ** 2, axis=0)
            mag = mag_i + mag_q
        mag = mag * jnp.float32(n_fft * n_fft)
        mag_cp = mag[:, :samples_per_code]
        # CAF doppler re-selection from the smoothed per-bin peak vector
        if caf_bins_half > 0:
            caf = jnp.max(mag_cp, axis=1)                   # [D]
            d_sel = jnp.argmax(caf_triangular_smooth(caf, caf_bins_half))
        else:
            d_sel = jnp.argmax(mag_cp) // samples_per_code
        # code phase / peak / second-peak all from the SELECTED Doppler
        # row, so the reported (doppler, code_phase, statistic) triple is
        # internally consistent even when smoothing moves the maximum
        row = mag_cp[d_sel]
        t_idx = jnp.argmax(row)
        peak = row[t_idx]
        pos = jnp.arange(samples_per_code, dtype=jnp.int32)
        dist = jnp.abs(pos - t_idx)
        dist = jnp.minimum(dist, samples_per_code - dist)
        second = jnp.max(jnp.where(dist >= samples_per_chip, row, 0.0))
        return None, (peak, d_sel, t_idx, second)

    _, (peaks, d_idxs, t_idxs, seconds) = jax.lax.scan(
        scan_body, None, (cd, cp))
    input_power = jnp.mean(jnp.abs(xb) ** 2) * jnp.float32(noncoherent)
    if both_components:
        input_power = input_power * jnp.float32(2.0)
    nrm = jnp.float32(n_fft) ** 4
    return AcqGridResult(
        test_max_power=(peaks / nrm / input_power).astype(jnp.float32),
        test_cfar=(peaks / jnp.maximum(seconds, 1e-30)).astype(jnp.float32),
        code_phase=t_idxs.astype(jnp.int32),
        doppler_hz=dopplers[d_idxs].astype(jnp.float32),
        magnitude=peaks.astype(jnp.float32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("fs", "samples_per_code", "samples_per_chip",
                     "noncoherent", "stride"))
def cccwsr_search(x: jax.Array, code_fft_conj_data: jax.Array,
                  code_fft_conj_pilot: jax.Array, dopplers: jax.Array, *,
                  fs: float, samples_per_code: int, samples_per_chip: int,
                  noncoherent: int = 1, stride: int | None = None
                  ) -> AcqGridResult:
    """Coherent Combining With Sign Recovery (pcps_cccwsr_acquisition_cc):
    acquire Galileo E1 by combining the E1B (data) and E1C (pilot)
    correlations coherently under both relative-sign hypotheses and keeping
    the stronger — ~3 dB over acquiring either component alone.

    Shapes as pcps_search, with one code-FFT per component.
    """
    xc = iq.as_complex(x)
    cd = iq.as_complex(code_fft_conj_data)
    cp = iq.as_complex(code_fft_conj_pilot)
    n_fft = cd.shape[-1]
    xb = _dwell_windows(xc, n_fft, noncoherent, stride)
    n = jnp.arange(n_fft, dtype=jnp.float32) * jnp.float32(1.0 / fs)
    carriers = jnp.exp(jnp.complex64(-2j * np.pi)
                       * (dopplers[:, None] * n[None, :]))
    xw = xb[:, None, :] * carriers[None, :, :]
    Xf = mxu_fft.fft(xw)

    def scan_body(_, cfcs):
        cfd, cfp = cfcs
        corr_d = mxu_fft.ifft(Xf * cfd[None, None, :])
        corr_p = mxu_fft.ifft(Xf * cfp[None, None, :])
        # sign recovery: max(|d+p|, |d-p|) per cell, noncoherent over dwells
        mag = jnp.sum(jnp.maximum(jnp.abs(corr_d + corr_p) ** 2,
                                  jnp.abs(corr_d - corr_p) ** 2), axis=0)
        mag = mag * jnp.float32(n_fft * n_fft)
        mag_cp = mag[:, :samples_per_code]
        flat = jnp.argmax(mag_cp)
        d_idx, t_idx = jnp.unravel_index(flat, mag_cp.shape)
        peak = mag_cp[d_idx, t_idx]
        row = mag_cp[d_idx]
        pos = jnp.arange(samples_per_code, dtype=jnp.int32)
        dist = jnp.abs(pos - t_idx)
        dist = jnp.minimum(dist, samples_per_code - dist)
        second = jnp.max(jnp.where(dist >= samples_per_chip, row, 0.0))
        return None, (peak, d_idx, t_idx, second)

    _, (peaks, d_idxs, t_idxs, seconds) = jax.lax.scan(
        scan_body, None, (cd, cp))
    power = jnp.mean(jnp.abs(xb) ** 2) * jnp.float32(noncoherent)
    nrm = jnp.float32(n_fft) ** 4
    return AcqGridResult(
        test_max_power=(peaks / nrm / power / 2.0).astype(jnp.float32),
        test_cfar=(peaks / jnp.maximum(seconds, 1e-30)).astype(jnp.float32),
        code_phase=t_idxs.astype(jnp.int32),
        doppler_hz=dopplers[d_idxs].astype(jnp.float32),
        magnitude=peaks.astype(jnp.float32),
    )
