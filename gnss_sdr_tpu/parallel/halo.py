"""Time-axis sharding with halo exchange (overlap-save over ICI).

The "sequence parallelism" of a streaming receiver (SURVEY §5 long-context
analog): an IQ sample block is split across devices along time; FIR
conditioning needs taps-1 samples of left context, which each device fetches
from its left neighbor with ``jax.lax.ppermute`` — a ring neighbor collective
over ICI, not host gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.7
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def sharded_fir(x: jax.Array, taps: jax.Array, mesh: Mesh,
                axis: str = "channel") -> jax.Array:
    """Apply an FIR filter to a time-sharded signal with halo exchange.

    x: [N] complex64 sharded along `axis` (N divisible by mesh size).
    Returns y[N] (same sharding), y[n] = sum_k taps[k] * x[n - k]
    with zero left-boundary context on device 0.
    """
    t = taps.shape[0]
    n_dev = mesh.shape[axis]

    def local(x_loc, taps_loc):
        # fetch the last (t-1) samples of the LEFT neighbor's shard
        halo_src = x_loc[-(t - 1):]
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        halo = jax.lax.ppermute(halo_src, axis, perm)
        idx = jax.lax.axis_index(axis)
        halo = jnp.where(idx == 0, jnp.zeros_like(halo), halo)
        xx = jnp.concatenate([halo, x_loc])
        return jnp.convolve(xx, taps_loc.astype(xx.dtype), mode="valid")

    fn = shard_map(local, mesh=mesh, in_specs=(P(axis), P()),
                   out_specs=P(axis))
    return fn(x, taps)


def gather_channel_outputs(x: jax.Array, mesh: Mesh,
                           axis: str = "channel") -> jax.Array:
    """All-gather per-channel results (observables to the host/PVT)."""
    def local(x_loc):
        return jax.lax.all_gather(x_loc, axis, tiled=True)
    return shard_map(local, mesh=mesh, in_specs=P(axis), out_specs=P(),
                     check_vma=False)(x)
