"""System test: BeiDou B1I (D1) chain to a position fix.

Exercises the NH20 secondary overlay, D1 subframe decode (BCH(15,11),
FraID/SOW) and BeiDou-only PVT — the reference's ``Channels_B1``
configuration (BEIDOU_B1I_PCPS_Acquisition / BEIDOU_B1I_DLL_PLL_Tracking /
BEIDOU_B1I_Telemetry_Decoder adapters).
"""

import numpy as np
import pytest

from gnss_sdr_tpu.receiver.pvt import geodesy
from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
from gnss_sdr_tpu.io.sources import ArraySignalSource
from gnss_sdr_tpu.utils import fixture_cache, scenario as scen

DUR = 30.0
FS = 4.0e6


@pytest.fixture(scope="module")
def bds_run():
    sc = scen.build_beidou_b1i_scenario(duration_s=DUR, n_sats=4,
                                        cn0_dbhz=48.0, fs=FS)
    x = fixture_cache.cached_iq(
        "e2e_bds_b1i", dict(duration_s=DUR, n_sats=4, cn0_dbhz=48.0,
                            fs=FS, seed=91),
        lambda: sc.generate(seed=91))
    cfg = ReceiverConfig(
        signal="B1", fs=FS, n_channels=4, prns=tuple(sc.prns),
        chunk_ms=100, acq_doppler_max_hz=5000.0, acq_doppler_step_hz=250.0,
        pvt_apply_tropo=False, pvt_apply_iono=False)
    rx = Receiver(cfg)
    rx.run_source(ArraySignalSource(x, FS))
    return sc, rx


def test_b1i_satellites_tracked(bds_run):
    sc, rx = bds_run
    assert sorted(rx.tracked_prns()) == sorted(sc.prns)


def test_b1i_d1_ephemerides(bds_run):
    sc, rx = bds_run
    assert len(rx.ephemerides) >= 4
    for (system, prn), eph in rx.ephemerides.items():
        assert system == "C"
        true = sc.ephemerides[prn]
        assert abs(eph.sqrt_a - true.sqrt_a) < 1e-4
        assert eph.toe == true.toe


def test_b1i_position_fix(bds_run):
    sc, rx = bds_run
    assert len(rx.fixes) >= 3, f"only {len(rx.fixes)} fixes"
    lat, lon, _ = sc.rcv_llh
    errs_enu = np.stack([
        geodesy.ecef_to_enu(f.pos_ecef - sc.rcv_ecef, lat, lon)
        for f in rx.fixes[-5:]])
    mean_enu = errs_enu.mean(axis=0)
    err_2d = np.hypot(mean_enu[0], mean_enu[1])
    err_3d = np.linalg.norm(mean_enu)
    assert err_2d < 2.0, f"2D error {err_2d:.2f} m"
    assert err_3d < 5.0, f"3D error {err_3d:.2f} m"
