"""System test: GPS L2C (L2 CM + CNAV) chain to a position fix.

The reference assembles L2C channels from the GPS_L2C_M_* adapters
(``GNSSBlockFactory::GetChannel_2S``, gnss_block_factory.cc) with the
libswiftcnav CNAV decoder. This drives the same chain with signal="2S":
20 ms CM code epochs (one 50 sps FEC symbol each, doubled-FFT acquisition
since a symbol flip can land on every code boundary), continuous K=7
Viterbi + CRC-24Q framing of 12 s messages 10/11/30, and a GPS-only PVT
from four L2C channels.
"""

import numpy as np
import pytest

from gnss_sdr_tpu.receiver.pvt import geodesy
from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
from gnss_sdr_tpu.io.sources import ArraySignalSource
from gnss_sdr_tpu.utils import fixture_cache, scenario as scen

FS = 2.0e6
DUR = 58.0


@pytest.fixture(scope="module")
def l2c_run():
    sc = scen.build_gps_l2c_scenario(duration_s=DUR, n_sats=5,
                                     cn0_dbhz=45.0, fs=FS)
    x = fixture_cache.cached_iq(
        "e2e_l2c", dict(dur=DUR, n=5, cn0=45.0, fs=FS, seed=77),
        lambda: sc.generate(seed=77))
    cfg = ReceiverConfig(
        signal="2S", fs=FS, n_channels=5, prns=tuple(sc.prns), chunk_ms=100,
        # 20 ms coherent PCPS: ~25 Hz Doppler bins
        acq_doppler_max_hz=4000.0, acq_doppler_step_hz=25.0,
        # 20 ms loop updates: keep BW*T well under 0.4 (the reference's L2C
        # conf uses narrow loops for the same reason)
        pll_bw_hz=12.0, dll_bw_hz=0.75, fll_bw_hz=5.0,
        pll_bw_narrow_hz=8.0, dll_bw_narrow_hz=0.5,
        pvt_apply_tropo=False, pvt_apply_iono=False)
    rx = Receiver(cfg)
    rx.run_source(ArraySignalSource(x, FS))
    return sc, rx


def test_l2c_satellites_tracked(l2c_run):
    sc, rx = l2c_run
    assert sorted(rx.tracked_prns()) == sorted(sc.prns)


def test_l2c_cnav_ephemerides(l2c_run):
    sc, rx = l2c_run
    assert len(rx.ephemerides) >= 5
    for (system, prn), eph in rx.ephemerides.items():
        assert system == "G"
        true = sc.ephemerides[prn]
        assert abs(eph.sqrt_a - true.sqrt_a) < 1e-3
        assert eph.toe == true.toe


def test_l2c_position_fix(l2c_run):
    sc, rx = l2c_run
    assert len(rx.fixes) >= 5, f"only {len(rx.fixes)} fixes"
    lat, lon, _ = sc.rcv_llh
    errs_enu = np.stack([
        geodesy.ecef_to_enu(f.pos_ecef - sc.rcv_ecef, lat, lon)
        for f in rx.fixes[-20:]])
    mean_enu = errs_enu.mean(axis=0)
    err_2d = np.hypot(mean_enu[0], mean_enu[1])
    err_3d = np.linalg.norm(mean_enu)
    # 511.5 kcps chips are 586 m (2x the C/A chip): same relaxed budget
    # as the GLONASS-only test (the reference's 2 m / 5 m rows target L1)
    assert err_2d < 10.0, f"2D error {err_2d:.2f} m"
    assert err_3d < 20.0, f"3D error {err_3d:.2f} m"
