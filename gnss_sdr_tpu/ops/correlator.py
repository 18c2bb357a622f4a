"""Batched multi-tap carrier-wipeoff correlator.

TPU-native replacement for the reference's hottest kernel pair
(``src/algorithms/tracking/libs/cpu_multicorrelator_real_codes.cc:105-168``:
VOLK ``32f_xn_resampler`` + ``32fc_32f_rotator_dot_prod_32fc_xn``): one fused
computation that, per channel, slices the epoch window out of the sample chunk,
generates the NCO carrier, resamples K code taps at the current code frequency,
and reduces the K tap dot-products — batched over channels with ``vmap`` so the
tap reduction is a single [K, N] x [N, 2] MXU contraction per channel.

The same math is also available as a hand-fused Pallas TPU kernel in
``correlator_pallas.py``; this XLA formulation is the portable reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gnss_sdr_tpu.ops import iq


def epoch_correlate(chunk: jax.Array,
                    offset: jax.Array,
                    n_samples: jax.Array,
                    code_table: jax.Array,
                    rem_code_phase: jax.Array,
                    code_phase_step: jax.Array,
                    carr_phase_frac: jax.Array,
                    carr_phase_step: jax.Array,
                    tap_offsets: jax.Array,
                    *, n_max: int, table_rate: int = 1,
                    tap_components: tuple | None = None) -> jax.Array:
    """Correlate one epoch window against K code taps (single channel).

    Args:
      chunk: [L, 2] float32 split-IQ conditioned samples (shared across
        channels; complex input also accepted — see ops/iq.py for why the
        boundary format is split-IQ).
      offset: int32 start of the epoch window within ``chunk``.
      n_samples: int32 number of valid samples in this epoch.
      code_table: [Lc] float32 +/-1 chip (or sub-chip) table for this
        channel; [G, Lc] when ``tap_components`` routes taps to G code
        components (data+pilot tracking, reference ``track_pilot`` in
        dll_pll_veml_tracking: E/P/L on the pilot plus one data prompt).
      rem_code_phase: float32 code phase (chips) at the window start.
      code_phase_step: float32 chips per sample (code_freq / fs).
      carr_phase_frac: float32 carrier phase (cycles, fractional) at start.
      carr_phase_step: float32 carrier cycles per sample (freq / fs).
      tap_offsets: [K] float32 tap spacings in chips (e.g. [-0.5, 0, +0.5]).
      n_max: static window size (>= any n_samples).
      table_rate: static entries per chip in code_table (2 for BOC(1,1)).
      tap_components: static per-tap component index into code_table's
        leading axis (len K); None = single-component [Lc] table.

    Returns:
      [K, 2] float32 correlator outputs (I, Q per tap).
    """
    chunk = iq.as_iq2(chunk)
    # window fetch as an explicit computed-index gather: under vmap this is a
    # [C, n_max] gather from the shared chunk — one HBM read per element,
    # identical cost to a batched dynamic_slice but a simpler lowering for
    # backends whose batched-dynamic-slice path is unsupported
    win_idx = offset + jnp.arange(n_max, dtype=jnp.int32)
    win = chunk[win_idx]
    n = jnp.arange(n_max, dtype=jnp.float32)
    mask = n < n_samples.astype(jnp.float32)

    # NCO carrier wipeoff: multiply by exp(-j*2*pi*(phi0 + f/fs * n))
    phase = jnp.mod(carr_phase_frac + carr_phase_step * n, 1.0)
    two_pi = jnp.float32(2.0 * np.pi)
    c = jnp.cos(two_pi * phase)
    s = jnp.sin(two_pi * phase)
    wr = win[:, 0]
    wi = win[:, 1]
    # (wr + j wi) * (c - j s)
    xr = (wr * c + wi * s) * mask
    xi = (wi * c - wr * s) * mask

    # K-tap code resampling via gather from the chip table
    chips = rem_code_phase + code_phase_step * n                      # [N]
    idx_f = (chips[None, :] + tap_offsets[:, None]) * jnp.float32(table_rate)
    lc = code_table.shape[-1]
    idx = jnp.floor(idx_f).astype(jnp.int32) % lc                     # [K, N]
    if tap_components is None:
        codes_kn = code_table[idx]                                    # [K, N]
    else:
        comp = np.asarray(tap_components, np.int32)[:, None]          # [K, 1]
        codes_kn = code_table[comp, idx]                              # [K, N]

    # [K, N] @ [N, 2] -> [K, 2] (MXU-friendly contraction)
    x2 = jnp.stack([xr, xi], axis=-1)
    return jnp.dot(codes_kn, x2, preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("n_max", "table_rate", "tap_components"))
def batch_epoch_correlate(chunk, offsets, n_samples, code_tables,
                          rem_code_phases, code_phase_steps,
                          carr_phase_fracs, carr_phase_steps, tap_offsets,
                          *, n_max: int, table_rate: int = 1,
                          tap_components: tuple | None = None) -> jax.Array:
    """vmap of :func:`epoch_correlate` over the channel axis.

    Shapes: offsets/n_samples/rem/... are [C]; code_tables is [C, Lc]
    (or [C, G, Lc] with tap_components); tap_offsets is [K] (shared).
    Returns [C, K, 2] float32 (split-IQ).
    """
    fn = jax.vmap(
        functools.partial(epoch_correlate, n_max=n_max, table_rate=table_rate,
                          tap_components=tap_components),
        in_axes=(None, 0, 0, 0, 0, 0, 0, 0, None))
    return fn(chunk, offsets, n_samples, code_tables, rem_code_phases,
              code_phase_steps, carr_phase_fracs, carr_phase_steps, tap_offsets)


# ---------------------------------------------------------------------------
# Rational-stride code replica: gather-free resampling (round-5 speedup)
# ---------------------------------------------------------------------------
#
# The arbitrary-index gather `code_table[idx]` dominates the tracking scan on
# TPU (measured: 34 of 45 ms per 100 ms chunk at C=6 — Mosaic lowers the
# gather nearly element-serially). The replica index is
#   idx(n) = floor(phi0 + step * n) mod Lc        (sub-chip units)
# with step = code_rate * table_rate / fs. Approximating step by a rational
# p / R (exact for the common commensurate rates: 2.0 MHz GPS L1 gives
# exactly 1023/2000) turns the resampling into CONTIGUOUS memory reads:
# precompute U[m] = table[floor(m / R) mod Lc] for m in [0, R * Lc) and lay
# it out as VT[b, a] = U[(a * p + b) mod M]; then with m0 = round(phi0 * R)
# = q * p + r,
#   replica(n) = U[(m0 + p n) mod M] = VT[r, q + n]
# — one dynamic_slice of n_max contiguous int8 entries per (channel, tap),
# 7.7x faster than the gather on v5e.
#
# Approximation: the true per-channel step deviates from p/R by the code
# Doppler (|df/f| <= ~3e-6), an intra-epoch replica drift of <= ~7e-3
# sub-chips at a 5 kHz Doppler — half a ZOH table step at the epoch end,
# zero at the start (m0 is recomputed from the exact carry every epoch, so
# NOTHING accumulates). Closed-loop equivalence vs the exact gather path is
# asserted in tests/test_correlator.py and the e2e suite.


def stride_plan(fs: float, code_rate_cps: float, table_rate: int,
                n_max: int, code_len_chips: int,
                max_denominator: int = 4000,
                max_entries: int = 32_000_000) -> tuple | None:
    """(p, R, M, A) for the stride-table replica, or None when the rate
    does not admit a compact rational step (falls back to the gather)."""
    from fractions import Fraction

    step = code_rate_cps * table_rate / fs          # sub-chips per sample
    fr = Fraction(step).limit_denominator(max_denominator)
    p, r = fr.numerator, fr.denominator
    if p == 0:
        return None
    lc = code_len_chips * table_rate
    m = r * lc
    a = -(-m // p) + n_max + 4
    if a * p > max_entries:
        return None
    return (int(p), int(r), int(m), int(a))


def build_stride_tables(code_tables: np.ndarray, plan: tuple) -> np.ndarray:
    """Host-side VT construction: [C, p, A] int8 from [C, Lc] +/-1 tables
    (or [C, G, p, A] from [C, G, Lc] component tables)."""
    p, r, m, a = plan
    ct = np.asarray(code_tables)
    lc = ct.shape[-1]
    a_idx = np.arange(a, dtype=np.int64)
    b_idx = np.arange(p, dtype=np.int64)
    mm = (b_idx[:, None] + a_idx[None, :] * p) % m      # [p, A]
    chip = ((mm // r) % lc).astype(np.int32)
    flat = ct.reshape(-1, lc)
    out = np.stack([t[chip] for t in flat]).astype(np.int8)
    return out.reshape(ct.shape[:-1] + (p, a))


def epoch_correlate_stride(chunk: jax.Array,
                           offset: jax.Array,
                           n_samples: jax.Array,
                           stride_table: jax.Array,
                           rem_code_phase: jax.Array,
                           code_phase_step: jax.Array,
                           carr_phase_frac: jax.Array,
                           carr_phase_step: jax.Array,
                           tap_offsets: jax.Array,
                           *, n_max: int, table_rate: int,
                           plan: tuple,
                           tap_components: tuple | None = None) -> jax.Array:
    """Single-channel epoch correlation with the stride-table replica.

    Same contract as :func:`epoch_correlate` but ``stride_table`` is the
    [p, A] (or [G, p, A]) int8 VT from :func:`build_stride_tables`."""
    p, r, m, a = plan
    chunk = iq.as_iq2(chunk)
    win = jax.lax.dynamic_slice(chunk, (offset, 0), (n_max, 2))
    n = jnp.arange(n_max, dtype=jnp.float32)
    mask = n < n_samples.astype(jnp.float32)

    phase = jnp.mod(carr_phase_frac + carr_phase_step * n, 1.0)
    two_pi = jnp.float32(2.0 * np.pi)
    c = jnp.cos(two_pi * phase)
    s = jnp.sin(two_pi * phase)
    wr = win[:, 0]
    wi = win[:, 1]
    xr = (wr * c + wi * s) * mask
    xi = (wi * c - wr * s) * mask

    phi0 = (rem_code_phase[None] + tap_offsets) * jnp.float32(table_rate)
    m0 = jnp.round(phi0 * jnp.float32(r)).astype(jnp.int32) % m     # [K]
    q = m0 // p
    rr = m0 % p

    if tap_components is None:
        def one_tap(qq, b):
            return jax.lax.dynamic_slice(stride_table, (b, qq), (1, n_max))[0]
        codes_kn = jax.vmap(one_tap)(q, rr)                  # [K, N] int8
    else:
        comp = np.asarray(tap_components, np.int32)

        def one_tap(g, qq, b):
            return jax.lax.dynamic_slice(
                stride_table, (g, b, qq), (1, 1, n_max))[0, 0]
        codes_kn = jax.vmap(one_tap)(jnp.asarray(comp), q, rr)

    x2 = jnp.stack([xr, xi], axis=-1)
    return jnp.dot(codes_kn.astype(jnp.float32), x2,
                   preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("n_max", "table_rate", "plan",
                                    "tap_components"))
def batch_epoch_correlate_stride(chunk, offsets, n_samples, stride_tables,
                                 rem_code_phases, code_phase_steps,
                                 carr_phase_fracs, carr_phase_steps,
                                 tap_offsets,
                                 *, n_max: int, table_rate: int, plan: tuple,
                                 tap_components: tuple | None = None
                                 ) -> jax.Array:
    """vmap of :func:`epoch_correlate_stride` over channels; stride_tables
    is [C, p, A] (or [C, G, p, A]). Returns [C, K, 2] float32."""
    fn = jax.vmap(
        functools.partial(epoch_correlate_stride, n_max=n_max,
                          table_rate=table_rate, plan=plan,
                          tap_components=tap_components),
        in_axes=(None, 0, 0, 0, 0, 0, 0, 0, None))
    return fn(chunk, offsets, n_samples, stride_tables, rem_code_phases,
              code_phase_steps, carr_phase_fracs, carr_phase_steps,
              tap_offsets)
