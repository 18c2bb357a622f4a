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
