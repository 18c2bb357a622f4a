"""One process of the 2-process distributed tracking test.

Launched by tests/test_distributed.py (and usable standalone for manual
multi-host experiments):

    python tools/distributed_tracking_worker.py <coordinator> <nproc> <pid> \
        <out.npz>

Every process builds the IDENTICAL deterministic scenario, contributes its
own channel block to the global channel-sharded tracking state, runs the
same scan program over the global {channel} mesh, all_gathers the packed
outputs, and process 0 writes them for comparison with the single-process
reference. Exercises the real multi-host path: jax.distributed init,
make_array_from_process_local_data, shard_map all_gather over the mesh.
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

LOCAL_DEVICES = 4

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count"
                             f"={LOCAL_DEVICES}")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def build_scenario():
    """Deterministic full-size (global) tracking inputs, identical on every
    process. Returns (cfg, chunk, state_full, tables_full)."""
    from gnss_sdr_tpu import constants
    from gnss_sdr_tpu.models import codes
    from gnss_sdr_tpu.ops import iq
    from gnss_sdr_tpu.receiver import tracking as trk

    fs = 1.023e6
    n_channels = 8
    spec = constants.SIGNALS["1C"]
    cfg = trk.default_config(spec, fs, chunk_ms=20)
    state = trk.init_state(n_channels, cfg.n_taps)
    tables = np.zeros((n_channels, spec.code_length_chips), np.float32)
    for i in range(n_channels):
        tables[i] = codes.code_chips("1C", i + 1)
        state = trk.start_channel(
            state, i, code_freq=spec.code_rate_cps,
            doppler_hz=200.0 * (i - 4), sample_offset=31 * i)
    rng = np.random.default_rng(7)
    n = cfg.chunk_len + cfg.n_max
    chunk = np.stack([rng.standard_normal(n), rng.standard_normal(n)],
                     axis=-1).astype(np.float32)
    # the product path's (stride-table) replica, same on both variants
    return cfg, chunk, state, trk.prepare_code_tables(cfg, tables)


def run_single_process(out_path: str) -> None:
    """Reference: the plain single-process scan (no mesh)."""
    from gnss_sdr_tpu.receiver import tracking as trk

    cfg, chunk, state, tables = build_scenario()
    packs = []
    for _ in range(3):
        state, packed = trk.track_chunk_packed(cfg, chunk, state, tables)
        packs.append(np.asarray(jax.device_get(packed)))
    np.savez(out_path, *packs)


def run_distributed(coordinator: str, nproc: int, pid: int,
                    out_path: str) -> None:
    from gnss_sdr_tpu.parallel import distributed as dist

    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == nproc * LOCAL_DEVICES

    cfg, chunk, state_full, tables_full = build_scenario()
    mesh = dist.global_mesh()
    sl = dist.host_channel_slice(tables_full.shape[0])
    state = dist.make_global_state(
        jax.tree.map(lambda a: np.asarray(a)[sl], state_full), mesh)
    tables = dist.make_global_channel_array(tables_full[sl], mesh)
    chunk_g = dist.make_replicated_array(chunk, mesh)

    packs = []
    for _ in range(3):
        state, packed = dist.tracking_scan_distributed(
            cfg, chunk_g, state, tables, None, mesh)
        full = dist.gather_channels(packed, mesh, channel_axis=1)
        packs.append(np.asarray(jax.device_get(full)))
    if pid == 0:
        np.savez(out_path, *packs)


if __name__ == "__main__":
    if sys.argv[1] == "--single":
        run_single_process(sys.argv[2])
    else:
        run_distributed(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
                        sys.argv[4])
