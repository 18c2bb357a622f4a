"""System test: Galileo E5a-I chain to a position fix.

Exercises 10.23 Mcps wideband tracking with the CS20 secondary overlay,
F/NAV page decode (types 4,1,2,3 rotation so the ephemeris completes in one
pass) and E5a-only PVT — the reference's ``Channels_5X`` configuration
(galileo_e5a_noncoherent_iq_acquisition_caf / galileo_e5a_dll_pll_tracking
adapters + galileo_telemetry_decoder in FNAV mode).
"""

import numpy as np
import pytest

from gnss_sdr_tpu.receiver.pvt import geodesy
from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
from gnss_sdr_tpu.io.sources import ArraySignalSource
from gnss_sdr_tpu.utils import fixture_cache, scenario as scen

FS = 12.0e6


@pytest.fixture(scope="module")
def e5a_run():
    sc = scen.build_galileo_e5a_scenario(fs=FS, n_sats=4, cn0_dbhz=50.0)
    x = fixture_cache.cached_iq(
        "e2e_gal_e5a", dict(duration_s=round(sc.duration_s, 3), n_sats=4,
                            cn0_dbhz=50.0, fs=FS, seed=87),
        lambda: sc.generate(seed=87))
    cfg = ReceiverConfig(
        signal="5X", fs=FS, n_channels=4, prns=tuple(sc.prns),
        chunk_ms=100, acq_doppler_max_hz=5000.0, acq_doppler_step_hz=125.0,
        pll_bw_hz=25.0, dll_bw_hz=2.0,
        pvt_apply_tropo=False, pvt_apply_iono=False)
    rx = Receiver(cfg)
    rx.run_source(ArraySignalSource(x, FS))
    return sc, rx


def test_e5a_satellites_tracked(e5a_run):
    sc, rx = e5a_run
    assert sorted(rx.tracked_prns()) == sorted(sc.prns)


def test_e5a_fnav_ephemerides(e5a_run):
    sc, rx = e5a_run
    assert len(rx.ephemerides) >= 4
    for (system, prn), eph in rx.ephemerides.items():
        assert system == "E"
        true = sc.ephemerides[prn]
        assert abs(eph.sqrt_a - true.sqrt_a) < 1e-4
        assert eph.toe == true.toe


def test_e5a_position_fix(e5a_run):
    sc, rx = e5a_run
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
