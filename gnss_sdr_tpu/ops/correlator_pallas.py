"""Fused Pallas TPU multicorrelator kernel.

Hand-fused version of ops/correlator.py (the reference's hottest kernel,
``volk_gnsssdr_32fc_32f_rotator_dot_prod_32fc_xn`` +
``volk_gnsssdr_32f_xn_resampler_32f_xn``,
``src/algorithms/tracking/libs/cpu_multicorrelator_real_codes.cc:105-168``):
one kernel program per channel fuses

  window slice (dynamic, scalar-prefetched offset) ->
  NCO carrier generation (VPU sin/cos over an iota) ->
  carrier wipeoff (complex multiply) ->
  K-tap code resampling (in-kernel gather from the chip table) ->
  masked tap reduction ([K, N] x [N, 2] MXU contraction)

so the epoch window is read from HBM exactly once and no intermediate
[C, K, N] tensors ever exist in HBM.

Grid: (C,). Scalar params ride in SMEM via PrefetchScalarGridSpec.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnss_sdr_tpu.ops import iq


def _kernel(offsets_ref, nsamp_ref, params_ref,        # scalar prefetch (SMEM)
            chunk_re_ref, chunk_im_ref, codes_ref, taps_ref,  # inputs
            out_ref,                                   # [1, 2K] output
            *, n_max: int, table_rate: int, n_taps: int, code_len: int):
    c = pl.program_id(0)
    off = offsets_ref[c]
    n_samp = nsamp_ref[c]
    rem = params_ref[c, 0]          # chips at window start
    cps = params_ref[c, 1]          # chips/sample
    frac = params_ref[c, 2]         # carrier cycles (fractional)
    step = params_ref[c, 3]         # carrier cycles/sample

    wr = chunk_re_ref[pl.ds(off, n_max)]                  # [N]
    wi = chunk_im_ref[pl.ds(off, n_max)]

    n = jax.lax.broadcasted_iota(jnp.float32, (1, n_max), 1)
    mask = (n < n_samp.astype(jnp.float32)).astype(jnp.float32)

    two_pi = jnp.float32(2.0 * np.pi)
    ph = frac + step * n
    ph = ph - jnp.floor(ph)
    co = jnp.cos(two_pi * ph)
    si = jnp.sin(two_pi * ph)
    xr = (wr[None, :] * co + wi[None, :] * si) * mask     # [1, N]
    xi = (wi[None, :] * co - wr[None, :] * si) * mask

    chips = rem + cps * n                                  # [1, N]
    tr = jnp.float32(table_rate)
    lc = code_len * table_rate
    acc = jnp.zeros((1, 2 * n_taps), jnp.float32)
    for k in range(n_taps):
        idx = jnp.floor((chips + taps_ref[0, k]) * tr).astype(jnp.int32)
        idx = jax.lax.rem(idx + lc, lc)
        ck = codes_ref[0, idx[0]]                          # gather [N]
        acc = acc.at[0, 2 * k].set(jnp.sum(ck * xr[0]))
        acc = acc.at[0, 2 * k + 1].set(jnp.sum(ck * xi[0]))
    out_ref[0, :] = acc[0, :]


@functools.partial(jax.jit,
                   static_argnames=("n_max", "table_rate", "interpret"))
def pallas_epoch_correlate(chunk, offsets, n_samples, code_tables,
                           rem_code_phases, code_phase_steps,
                           carr_phase_fracs, carr_phase_steps, tap_offsets,
                           *, n_max: int, table_rate: int = 1,
                           interpret: bool = False) -> jax.Array:
    """Drop-in replacement for correlator.batch_epoch_correlate.

    chunk is [L, 2] float32 split-IQ (complex also accepted).
    Returns [C, K, 2] float32.
    """
    chunk = iq.as_iq2(chunk)
    n_ch = offsets.shape[0]
    n_taps = tap_offsets.shape[0]
    code_len = code_tables.shape[1] // table_rate

    params = jnp.stack([rem_code_phases, code_phase_steps,
                        carr_phase_fracs, carr_phase_steps], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_ch,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # chunk re (whole array)
            pl.BlockSpec(memory_space=pl.ANY),   # chunk im
            pl.BlockSpec((1, code_tables.shape[1]),
                         lambda c, *_: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_taps), lambda c, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * n_taps), lambda c, *_: (c, 0),
                               memory_space=pltpu.VMEM),
    )

    out = pl.pallas_call(
        functools.partial(_kernel, n_max=n_max, table_rate=table_rate,
                          n_taps=n_taps, code_len=code_len),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_ch, 2 * n_taps), jnp.float32),
        interpret=interpret,
    )(offsets.astype(jnp.int32), n_samples.astype(jnp.int32),
      params.astype(jnp.float32),
      chunk[:, 0], chunk[:, 1],
      code_tables, tap_offsets[None, :].astype(jnp.float32))

    return jnp.stack([out[:, 0::2], out[:, 1::2]], axis=-1)
