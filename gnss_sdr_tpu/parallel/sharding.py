"""Device-mesh sharding for the receiver's data plane.

The reference is single-node (SURVEY §2.4: no distributed backend) — its
parallelism is thread-per-block plus per-satellite channels. The TPU-native
scale-out maps those axes onto a device mesh:

  * ``channel`` axis  — satellite channels are embarrassingly parallel
    (data-parallel analog): tracking state, code tables and correlator work
    shard across devices; the sample chunk is replicated.
  * ``time`` axis     — wideband conditioning (FIR/resampling) splits the
    sample stream across devices with halo exchange over ICI
    (sequence-parallel analog, see halo.py).
  * acquisition       — the [signal x doppler x code-phase] cube shards on
    the signal axis (batch-parallel FFTs).

Collectives ride ICI via NamedSharding-annotated jit — XLA inserts the
all-gathers where host code pulls observables (channel axis -> host 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "channel") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_tracking_state(state, mesh: Mesh):
    """Place a TrackingState pytree with the channel axis sharded."""
    sh = NamedSharding(mesh, P("channel"))
    return jax.tree.map(lambda a: jax.device_put(a, sh), state)


def shard_channel_array(arr, mesh: Mesh):
    """Shard a [C, ...] array on its leading (channel) axis."""
    ndim = jnp.ndim(arr)
    sh = NamedSharding(mesh, P(*(("channel",) + (None,) * (ndim - 1))))
    return jax.device_put(arr, sh)


def replicate(arr, mesh: Mesh):
    return jax.device_put(arr, NamedSharding(mesh, P()))
