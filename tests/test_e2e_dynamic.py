"""System test: moving receiver — dynamic position/velocity RMSE.

The TPU-native equivalent of the reference's dynamic system test
(position_test.cc:803-804 against a Spirent motion file): a constant-velocity
receiver trajectory drives the signal generator; the receiver's fixes are
compared against the truth trajectory with the reference's own budgets
(position_test_flags.h:49-50 — 3D position RMSE < 10 m, 3D velocity
RMSE < 5 m/s).
"""

import numpy as np
import pytest

from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
from gnss_sdr_tpu.io.sources import ArraySignalSource
from gnss_sdr_tpu.utils import fixture_cache, scenario as scen

DUR = 28.0
FS = 2.0e6
VEL_ENU = (12.0, -5.0, 0.0)     # ~13 m/s ground vehicle


@pytest.fixture(scope="module")
def dyn_run():
    sc = scen.build_gps_l1_scenario(duration_s=DUR, n_sats=6, cn0_dbhz=47.0,
                                    fs=FS, vel_enu=VEL_ENU)
    x = fixture_cache.cached_iq(
        "e2e_dynamic", dict(duration_s=DUR, n_sats=6, cn0_dbhz=47.0,
                            fs=FS, vel_enu=VEL_ENU, seed=41),
        lambda: sc.generate(seed=41))
    cfg = ReceiverConfig(
        signal="1C", fs=FS, n_channels=6, prns=tuple(sc.prns),
        chunk_ms=100, acq_doppler_max_hz=5000.0, acq_doppler_step_hz=250.0,
        pvt_apply_tropo=False, pvt_apply_iono=False)
    rx = Receiver(cfg)
    rx.run_source(ArraySignalSource(x, FS))
    return sc, rx


def test_dynamic_position_rmse(dyn_run):
    sc, rx = dyn_run
    assert len(rx.fixes) >= 5, f"only {len(rx.fixes)} fixes"
    errs = []
    for f in rx.fixes:
        truth = sc.rcv_pos_at(f.tow_s - sc.t0_gps)
        errs.append(np.linalg.norm(f.pos_ecef - truth))
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    # reference budget: position_test_flags.h:49 (dynamic 3D RMSE < 10 m)
    assert rmse < 10.0, f"dynamic 3D position RMSE {rmse:.2f} m"


def test_dynamic_velocity_rmse(dyn_run):
    sc, rx = dyn_run
    v_true = sc.rcv_vel_ecef
    errs = [np.linalg.norm(f.vel_ecef - v_true) for f in rx.fixes]
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    # reference budget: position_test_flags.h:50 (dynamic 3D vel RMSE < 5 m/s)
    assert rmse < 5.0, f"dynamic 3D velocity RMSE {rmse:.2f} m/s"
    # and the speed itself must be clearly non-zero (a moving fix, not noise)
    speeds = [np.linalg.norm(f.vel_ecef) for f in rx.fixes[-5:]]
    assert np.mean(speeds) == pytest.approx(np.linalg.norm(v_true), abs=2.0)


def test_dynamic_motion_observed(dyn_run):
    """The fix trajectory must actually traverse ~ |v| * dt meters."""
    sc, rx = dyn_run
    f0, f1 = rx.fixes[0], rx.fixes[-1]
    dt = f1.tow_s - f0.tow_s
    moved = np.linalg.norm(f1.pos_ecef - f0.pos_ecef)
    expect = np.linalg.norm(sc.rcv_vel_ecef) * dt
    assert dt > 2.0
    assert moved == pytest.approx(expect, rel=0.25, abs=5.0)
