"""System test: GLONASS L2 C/A FDMA chain to a position fix.

The reference assembles L2 channels from the GLONASS_L2_CA_* adapters
(``GNSSBlockFactory::GetChannel_2G``, gnss_block_factory.cc) — same 511-chip
C/A code and GNAV message as L1, narrower 437.5 kHz FDMA grid at 1246 MHz.
This drives the same receiver chain with signal="2G": per-slot IF
acquisition/tracking, GNAV decode, GLONASS-only PVT. Budgets as in
test_e2e_glonass.py (586 m chips).
"""

import numpy as np
import pytest

from gnss_sdr_tpu.receiver.pvt import geodesy
from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
from gnss_sdr_tpu.io.sources import ArraySignalSource
from gnss_sdr_tpu.utils import fixture_cache, scenario as scen

FS = 6.0e6    # |IF| <= 5*437.5 kHz fits easily; incommensurate with 511 kcps


@pytest.fixture(scope="module")
def glo2_run():
    sc = scen.build_glonass_l1_scenario(fs=FS, n_sats=4, cn0_dbhz=48.0,
                                        band="2G")
    assert sc.spec.signal == "2G"
    x = fixture_cache.cached_iq(
        "e2e_glo_l2", dict(duration_s=round(sc.duration_s, 3), n_sats=4,
                           cn0_dbhz=48.0, fs=FS, seed=96),
        lambda: sc.generate(seed=96))
    cfg = ReceiverConfig(
        signal="2G", fs=FS, n_channels=4, prns=tuple(sc.prns),
        chunk_ms=100, acq_doppler_max_hz=5000.0, acq_doppler_step_hz=250.0,
        pvt_apply_tropo=False, pvt_apply_iono=False,
        carrier_smoothing_factor=100)
    rx = Receiver(cfg)
    rx.run_source(ArraySignalSource(x, FS))
    return sc, rx


def test_glonass_l2_satellites_tracked(glo2_run):
    sc, rx = glo2_run
    assert sorted(rx.tracked_prns()) == sorted(sc.prns)


def test_glonass_l2_gnav_ephemerides(glo2_run):
    sc, rx = glo2_run
    assert len(rx.ephemerides) >= 4
    for (system, prn), eph in rx.ephemerides.items():
        assert system == "R"
        true = sc.ephemerides[("R", prn)]
        assert eph.tb_s == true.tb_s
        np.testing.assert_allclose(eph.pos_m, true.pos_m, atol=1.0)
        np.testing.assert_allclose(eph.vel_m_s, true.vel_m_s, atol=1e-2)


def test_glonass_l2_position_fix(glo2_run):
    sc, rx = glo2_run
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
