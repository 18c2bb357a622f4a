"""Fused Pallas TPU multicorrelator kernel.

Hand-fused version of ops/correlator.py (the reference's hottest kernel,
``volk_gnsssdr_32fc_32f_rotator_dot_prod_32fc_xn`` +
``volk_gnsssdr_32f_xn_resampler_32f_xn``,
``src/algorithms/tracking/libs/cpu_multicorrelator_real_codes.cc:105-168``):
one kernel program per channel fuses

  window fetch (async DMA from HBM at a scalar-prefetched offset) ->
  NCO carrier generation (VPU sin/cos over an iota) ->
  carrier wipeoff ->
  K-tap code resampling (in-kernel gather from the chip table in VMEM) ->
  masked tap reduction

so the epoch window is read from HBM exactly once and no intermediate
[C, K, N] tensors ever exist in HBM. Split-IQ float32 boundary (ops/iq.py).

TPU lowering notes: the sample windows live in HBM (`pl.ANY`) and are DMA'd
into VMEM scratch per program (direct loads from ANY are not allowed); block
shapes are full arrays (per-row blocks violate the (8, 128) tiling rule);
the window length is padded to a lane multiple and the wrapper zero-pads the
chunk so the last window's DMA stays in bounds.

Status — DEMOTED after on-chip evaluation (round 2, v5-lite via axon):
QA'd against the numpy oracle and the XLA path in interpret mode
(tests/test_correlator.py), but NOT used by the receiver, for two reasons
established by direct measurement on the chip:

1. The axon Mosaic backend cannot lower the kernel's core constructs.
   Bisection (one construct per fresh process) showed:
   - ``tpu.dynamic_gather`` is limited to a single 128-lane vreg along the
     gather dimension ("Not implemented: Multiple source vregs along gather
     dimension") — a 1023-entry C/A code table cannot be lane-gathered;
   - dynamic-offset lane slices of VMEM (``ref[:, pl.ds(b, 128)]``) and
     sublane gathers fail in tpu_compile_helper; dynamic-offset DMA from a
     1-D HBM ref fails in ``tpu.memref_slice``.
   Supported: static 128-lane gathers, ``pltpu.roll`` with traced shift,
   partial lane stores, axis reductions, int32 iota, in-kernel MXU dot.
   A roll+static-window-gather reformulation is possible but cannot win —
   see (2).
2. The XLA formulation is already at the HBM roofline. Measured on-chip
   with dispatch amortized inside ``lax.scan`` (100 epochs/call, all
   operands passed as jit arguments — a closure-captured device array
   forces the documented 60x-slower scan path):
     C=8:   0.36 us/epoch   (~0.9 TB/s effective)
     C=32:  1.30 us/epoch   (~1.0 TB/s)
     C=128: 3.52 us/epoch   (~1.5 TB/s)
   The 100 ms sample chunk (~1.6 MB) is VMEM-resident across the whole
   scan, so per-epoch windows never re-read HBM; effective bandwidth at or
   above the v5-lite spec means there is no headroom for a hand kernel.

The kernel is kept (with interpret-mode QA) as the reference Pallas
formulation for backends with full Mosaic gather support.
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
            out_ref,                                   # [C, 2K] output
            wr_s, wi_s, sem_r, sem_i,                  # scratch
            *, n_pad: int, table_rate: int, n_taps: int, code_len: int):
    c = pl.program_id(0)
    off = offsets_ref[c]
    n_samp = nsamp_ref[c]
    rem = params_ref[c, 0]          # chips at window start
    cps = params_ref[c, 1]          # chips/sample
    frac = params_ref[c, 2]         # carrier cycles (fractional)
    step = params_ref[c, 3]         # carrier cycles/sample

    cp_r = pltpu.make_async_copy(chunk_re_ref.at[pl.ds(off, n_pad)],
                                 wr_s.at[0], sem_r)
    cp_i = pltpu.make_async_copy(chunk_im_ref.at[pl.ds(off, n_pad)],
                                 wi_s.at[0], sem_i)
    cp_r.start()
    cp_i.start()
    cp_r.wait()
    cp_i.wait()

    wr = wr_s[0:1, :]                                     # [1, N]
    wi = wi_s[0:1, :]
    n = jax.lax.broadcasted_iota(jnp.float32, (1, n_pad), 1)
    mask = (n < n_samp.astype(jnp.float32)).astype(jnp.float32)

    two_pi = jnp.float32(2.0 * np.pi)
    ph = frac + step * n
    ph = ph - jnp.floor(ph)
    co = jnp.cos(two_pi * ph)
    si = jnp.sin(two_pi * ph)
    xr = (wr * co + wi * si) * mask                       # [1, N]
    xi = (wi * co - wr * si) * mask

    chips = rem + cps * n                                  # [1, N]
    tr = jnp.float32(table_rate)
    lc = code_len * table_rate
    for k in range(n_taps):
        idx = jnp.floor((chips + taps_ref[0, k]) * tr).astype(jnp.int32)
        idx = jax.lax.rem(idx + lc, lc)
        ck = codes_ref[c, idx[0]]                          # gather [N]
        out_ref[c, 2 * k] = jnp.sum(ck * xr[0])
        out_ref[c, 2 * k + 1] = jnp.sum(ck * xi[0])


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
    code_len = code_tables.shape[-1] // table_rate
    n_pad = ((n_max + 127) // 128) * 128

    params = jnp.stack([rem_code_phases, code_phase_steps,
                        carr_phase_fracs, carr_phase_steps], axis=1)
    # zero-pad so the last window's DMA stays in bounds
    zpad = jnp.zeros((n_pad, 2), jnp.float32)
    chunk = jnp.concatenate([chunk.astype(jnp.float32), zpad])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_ch,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # chunk re (whole array)
            pl.BlockSpec(memory_space=pl.ANY),   # chunk im
            pl.BlockSpec(code_tables.shape[-2:], lambda c, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_taps), lambda c, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_ch, 2 * n_taps), lambda c, *_: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, n_pad), jnp.float32),
            pltpu.VMEM((1, n_pad), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    out = pl.pallas_call(
        functools.partial(_kernel, n_pad=n_pad, table_rate=table_rate,
                          n_taps=n_taps, code_len=code_len),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_ch, 2 * n_taps), jnp.float32),
        interpret=interpret,
    )(offsets.astype(jnp.int32), n_samples.astype(jnp.int32),
      params.astype(jnp.float32),
      chunk[:, 0], chunk[:, 1],
      code_tables, tap_offsets[None, :].astype(jnp.float32))

    return jnp.stack([out[:, 0::2], out[:, 1::2]], axis=-1)
