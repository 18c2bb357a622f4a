"""System test: Galileo E1-B signal-level chain to a position fix.

Exercises BOC(1,1) VEML tracking, I/NAV page decode (Viterbi + CRC-24Q) and
multi-SV Galileo-only PVT — the second constellation end-to-end.
"""

import numpy as np
import pytest

from gnss_sdr_tpu.receiver.pvt import geodesy
from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
from gnss_sdr_tpu.io.sources import ArraySignalSource
from gnss_sdr_tpu.utils import fixture_cache, scenario as scen


@pytest.fixture(scope="module")
def e2e_run():
    sc = scen.build_galileo_e1_scenario(duration_s=18.0, n_sats=5,
                                        cn0_dbhz=48.0, fs=4.0e6)
    x = fixture_cache.cached_iq(
        "e2e_gal_e1", dict(duration_s=18.0, n_sats=5, cn0_dbhz=48.0,
                           fs=4.0e6, seed=21),
        lambda: sc.generate(seed=21))
    cfg = ReceiverConfig(
        signal="1B", fs=sc.fs, n_channels=5, prns=tuple(sc.prns),
        chunk_ms=100, acq_doppler_max_hz=5000.0, acq_doppler_step_hz=125.0,
        pll_bw_hz=20.0, dll_bw_hz=2.0, pll_bw_narrow_hz=8.0,
        dll_bw_narrow_hz=0.75,
        pvt_apply_tropo=False, pvt_apply_iono=False)
    rx = Receiver(cfg)
    rx.run_source(ArraySignalSource(x, sc.fs))
    return sc, rx


def test_satellites_tracked(e2e_run):
    sc, rx = e2e_run
    assert len(set(rx.tracked_prns()) & set(sc.prns)) >= 4


def test_inav_ephemeris_decoded(e2e_run):
    sc, rx = e2e_run
    assert len(rx.ephemerides) >= 4
    for (system, prn), eph in rx.ephemerides.items():
        true = sc.ephemerides[prn]
        assert abs(eph.sqrt_a - true.sqrt_a) <= 2.0 ** -19
        assert eph.toe == true.toe
        assert eph.gm == pytest.approx(3.986004418e14)


def test_galileo_position_fix(e2e_run):
    sc, rx = e2e_run
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
