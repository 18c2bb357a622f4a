"""Multi-host (multi-process) execution: jax.distributed + global mesh.

The reference receiver is strictly single-node (SURVEY §2.4) — this module
is the scale-out the blueprint calls for (SURVEY §7 step 9, BASELINE.json
2-host scaling north star): each host runs one process owning its local
chips; ``jax.distributed`` wires them into one global device list; a global
``Mesh`` over {host, channel} lets the SAME NamedSharding-annotated
programs as the single-host path run across hosts, with XLA routing
channel-axis collectives over ICI inside a host and DCN between hosts.

Deployment model (mirrors every JAX multi-host program):
  * every process calls :func:`initialize` with the same coordinator
    address and its process_id, then builds identical meshes and traces
    identical programs;
  * per-host data (the host's sample stream stripe, its channel block) is
    assembled into GLOBAL arrays with
    :func:`make_global_channel_array` / :func:`make_global_sample_array`
    (jax.make_array_from_process_local_data);
  * results needed on every host (observables for PVT on host 0) come back
    through :func:`gather_channels`, an all_gather whose output is fully
    replicated — every process can read its addressable copy.

Tested in tests/test_distributed.py by spawning 2 real processes on a
virtual CPU mesh (xla_force_host_platform_device_count) and asserting the
distributed tracking scan reproduces the single-process result bit-exactly.
"""

from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.7
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_count: int | None = None) -> None:
    """Bring up the multi-process runtime (idempotent).

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID) so launchers can configure via
    environment alone. ``local_device_count`` forces N virtual CPU devices
    per process (testing without hardware).
    """
    if jax.process_count() > 1:
        return                          # already initialized
    if local_device_count:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={local_device_count}")
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if coordinator_address is None:
        return                          # single-process mode: nothing to do
    num_processes = int(num_processes
                        or os.environ.get("JAX_NUM_PROCESSES", 1))
    process_id = int(process_id if process_id is not None
                     else os.environ.get("JAX_PROCESS_ID", 0))
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(axis: str = "channel") -> Mesh:
    """One-axis mesh over every device of every process, host-major order
    (device i of host h sits at position h * local_count + i, so an evenly
    divided channel axis gives each host a contiguous channel block)."""
    return Mesh(np.array(jax.devices()), (axis,))


def host_channel_slice(n_channels: int) -> slice:
    """This process's contiguous block of the global channel axis."""
    per = n_channels // jax.process_count()
    pid = jax.process_index()
    return slice(pid * per, (pid + 1) * per)


def make_global_channel_array(local: np.ndarray, mesh: Mesh,
                              axis: str = "channel"):
    """Assemble per-process channel blocks into one global [C_total, ...]
    array sharded on the channel axis (local holds THIS host's block)."""
    ndim = np.ndim(local)
    spec = P(*((axis,) + (None,) * (ndim - 1)))
    shape = (local.shape[0] * jax.process_count(),) + tuple(local.shape[1:])
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.asarray(local), shape)


def make_replicated_array(value: np.ndarray, mesh: Mesh):
    """Replicate identical per-process data (the sample chunk) globally."""
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P()), np.asarray(value), np.shape(value))


def gather_channels(x, mesh: Mesh, axis: str = "channel",
                    channel_axis: int = 0):
    """all_gather the channel axis so every process holds the full array
    (host-0 observables/PVT consumption; DCN hop between hosts).
    ``channel_axis``: which ARRAY axis carries channels (the packed host
    outputs are [steps, C, fields] -> channel_axis=1)."""
    def local(x_loc):
        return jax.lax.all_gather(x_loc, axis, axis=channel_axis, tiled=True)
    ndim = jax.numpy.ndim(x)
    dims = [None] * ndim
    dims[channel_axis] = axis
    spec = P(*dims)
    fn = shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=P(),
                   check_vma=False)
    return fn(x)


def make_global_state(state_local, mesh: Mesh, axis: str = "channel"):
    """Assemble a per-process TrackingState block (leaves [C_local, ...])
    into the global channel-sharded state pytree."""
    return jax.tree.map(
        lambda a: make_global_channel_array(np.asarray(a), mesh, axis),
        state_local)


def tracking_scan_distributed(cfg, chunk, state, code_tables, sec_tables,
                              mesh: Mesh):
    """The tracking scan over a multi-host mesh: state/tables sharded on
    the (global) channel axis, chunk replicated — the same jit program as
    the single-host path, placed on the global mesh. Returns (new_state,
    packed host outputs) still sharded; fetch with gather_channels /
    jax.device_get on addressable shards."""
    from gnss_sdr_tpu.receiver import tracking as trk
    return trk.track_chunk_packed(cfg, chunk, state, code_tables, sec_tables)
