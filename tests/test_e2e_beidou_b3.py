"""System test: BeiDou B3I chain to a position fix (heavy: 12 Msps).

The reference assembles B3I channels from the BEIDOU_B3I_* adapters
(``GNSSBlockFactory::GetChannel_B3``, gnss_block_factory.cc) — same D1
message and NH20 overlay as B1I, 10.23 Mcps code at 1268.52 MHz. This
drives the same chain with signal="B3": doubled-FFT acquisition (NH20),
overlay phase sync, D1 subframes 1-3, BDS-only PVT. Budgets as in
test_e2e_beidou.py.
"""

import numpy as np
import pytest

from gnss_sdr_tpu.receiver.pvt import geodesy
from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
from gnss_sdr_tpu.io.sources import ArraySignalSource
from gnss_sdr_tpu.utils import fixture_cache, scenario as scen

FS = 12.0e6   # > 11 Msps for the 10.23 Mcps code, incommensurate
DUR = 30.0


@pytest.fixture(scope="module")
def b3_run():
    sc = scen.build_beidou_b1i_scenario(duration_s=DUR, n_sats=4,
                                        cn0_dbhz=48.0, fs=FS, band="B3")
    assert sc.spec.signal == "B3"
    x = fixture_cache.cached_iq(
        "e2e_b3i", dict(dur=DUR, n=4, cn0=48.0, fs=FS, seed=88),
        lambda: sc.generate(seed=88))
    cfg = ReceiverConfig(
        signal="B3", fs=FS, n_channels=4, prns=tuple(sc.prns), chunk_ms=100,
        acq_doppler_max_hz=5000.0, acq_doppler_step_hz=250.0,
        pvt_apply_tropo=False, pvt_apply_iono=False)
    rx = Receiver(cfg)
    rx.run_source(ArraySignalSource(x, FS))
    return sc, rx


def test_b3i_satellites_tracked(b3_run):
    sc, rx = b3_run
    assert sorted(rx.tracked_prns()) == sorted(sc.prns)


def test_b3i_d1_ephemerides(b3_run):
    sc, rx = b3_run
    assert len(rx.ephemerides) >= 4
    for (system, prn), eph in rx.ephemerides.items():
        assert system == "C"
        true = sc.ephemerides[prn]
        assert abs(eph.sqrt_a - true.sqrt_a) < 1e-3
        assert eph.toe == true.toe


def test_b3i_position_fix(b3_run):
    sc, rx = b3_run
    assert len(rx.fixes) >= 5, f"only {len(rx.fixes)} fixes"
    lat, lon, _ = sc.rcv_llh
    errs_enu = np.stack([
        geodesy.ecef_to_enu(f.pos_ecef - sc.rcv_ecef, lat, lon)
        for f in rx.fixes[-10:]])
    mean_enu = errs_enu.mean(axis=0)
    err_2d = np.hypot(mean_enu[0], mean_enu[1])
    err_3d = np.linalg.norm(mean_enu)
    assert err_2d < 2.0, f"2D error {err_2d:.2f} m"
    assert err_3d < 5.0, f"3D error {err_3d:.2f} m"
