"""Multi-host (2-process) distributed execution test.

Spawns TWO real OS processes, each with 4 virtual CPU devices, joined by
``jax.distributed`` into one 8-device global mesh (SURVEY §7 step 9 /
BASELINE.json 2-host scaling north star). Each process contributes its own
channel block of the tracking state; the identical scan program runs over
the global {channel} mesh; an all_gather (the DCN hop in production)
returns the packed outputs to every process. The result must match the
plain single-process scan BIT-EXACTLY over multiple chunks — the
distributed carry threading is the same computation.
"""

import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = pathlib.Path(__file__).resolve().parents[1] / "tools" \
    / "distributed_tracking_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_tracking_matches_single(tmp_path):
    ref = tmp_path / "single.npz"
    out = tmp_path / "dist.npz"
    env_base = {"JAX_PLATFORMS": "cpu"}
    import os
    env = dict(os.environ)
    env.update(env_base)
    env.pop("XLA_FLAGS", None)          # worker sets its own device count

    r = subprocess.run([sys.executable, str(WORKER), "--single", str(ref)],
                       env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]

    coord = f"127.0.0.1:{_free_port()}"
    procs = [subprocess.Popen(
        [sys.executable, str(WORKER), coord, "2", str(pid), str(out)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(2)]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se[-2000:]

    a = np.load(ref)
    b = np.load(out)
    assert len(a.files) == len(b.files) == 3
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k])
