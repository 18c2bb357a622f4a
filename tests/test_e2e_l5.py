"""System test: GPS L5I signal-level chain to a position fix.

Exercises the 10.23 Mcps wideband tracking, NH10 secondary sync, 100 sps
CNAV telemetry (K=7 Viterbi + CRC-24Q) and L5-only PVT — the reference's
``Channels_L5`` configuration (gps_l5_telemetry_decoder_gs.cc,
GPS_L5_CA_PCPS_Acquisition / GPS_L5_DLL_PLL_Tracking adapters).
"""

import numpy as np
import pytest

from gnss_sdr_tpu.receiver.pvt import geodesy
from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
from gnss_sdr_tpu.io.sources import ArraySignalSource
from gnss_sdr_tpu.utils import fixture_cache, scenario as scen

DUR = 30.0
FS = 11.0e6


@pytest.fixture(scope="module")
def l5_run():
    sc = scen.build_gps_l5_scenario(duration_s=DUR, n_sats=4, cn0_dbhz=50.0,
                                    fs=FS)
    x = fixture_cache.cached_iq(
        "e2e_gps_l5", dict(duration_s=DUR, n_sats=4, cn0_dbhz=50.0,
                           fs=FS, seed=77),
        lambda: sc.generate(seed=77))
    cfg = ReceiverConfig(
        signal="L5", fs=FS, n_channels=4, prns=tuple(sc.prns),
        chunk_ms=100, acq_doppler_max_hz=5000.0, acq_doppler_step_hz=250.0,
        pvt_apply_tropo=False, pvt_apply_iono=False)
    rx = Receiver(cfg)
    rx.run_source(ArraySignalSource(x, FS))
    return sc, rx


def test_l5_satellites_tracked(l5_run):
    sc, rx = l5_run
    assert sorted(rx.tracked_prns()) == sorted(sc.prns)


def test_l5_cnav_ephemerides(l5_run):
    sc, rx = l5_run
    assert len(rx.ephemerides) >= 4
    for (system, prn), eph in rx.ephemerides.items():
        assert system == "G"
        true = sc.ephemerides[prn]
        assert abs(eph.sqrt_a - true.sqrt_a) < 1e-4
        assert eph.toe == true.toe


def test_l5_position_fix(l5_run):
    sc, rx = l5_run
    assert len(rx.fixes) >= 3, f"only {len(rx.fixes)} fixes"
    lat, lon, _ = sc.rcv_llh
    errs_enu = np.stack([
        geodesy.ecef_to_enu(f.pos_ecef - sc.rcv_ecef, lat, lon)
        for f in rx.fixes[-5:]])
    mean_enu = errs_enu.mean(axis=0)
    err_2d = np.hypot(mean_enu[0], mean_enu[1])
    err_3d = np.linalg.norm(mean_enu)
    # the wideband code sharpens the DLL: hold the reference static budget
    assert err_2d < 2.0, f"2D error {err_2d:.2f} m"
    assert err_3d < 5.0, f"3D error {err_3d:.2f} m"
