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

try:
    from jax import shard_map  # jax >= 0.7
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


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


def pcps_search_sharded(mesh: Mesh, x, code_fft_conj, dopplers, *,
                        fs: float, samples_per_code: int,
                        samples_per_chip: int, noncoherent: int = 1,
                        stride: int | None = None, axis: str = "channel"):
    """PCPS acquisition with the signal axis sharded across the mesh.

    Each device searches its local slice of the [S, doppler, code-phase]
    cube independently (batch-parallel FFTs — the reference's analog is one
    acquisition worker per channel, gnss_flowgraph.cc:1249); results come
    back sharded on the signal axis. S must be divisible by the mesh size —
    pad the code-FFT stack by repeating entries and slice the results.

    Returns an ops.acquisition.AcqGridResult (all leaves [S]).
    """
    from gnss_sdr_tpu.ops import acquisition as acq_ops

    def local(x_loc, cf_loc, dop_loc):
        return acq_ops.pcps_search(
            x_loc, cf_loc, dop_loc, fs=fs, samples_per_code=samples_per_code,
            samples_per_chip=samples_per_chip, noncoherent=noncoherent,
            stride=stride)

    out_specs = acq_ops.AcqGridResult(
        *([P(axis)] * len(acq_ops.AcqGridResult._fields)))
    fn = shard_map(local, mesh=mesh, in_specs=(P(), P(axis), P()),
                   out_specs=out_specs, check_vma=False)
    return fn(x, code_fft_conj, dopplers)
