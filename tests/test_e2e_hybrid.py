"""System test: hybrid GPS L1 C/A + Galileo E1-B receiver to a combined fix.

The reference's flagship multi-constellation mode
(conf/gnss-sdr_multisource_Hybrid_*.conf: Channels_1C + Channels_1B feeding
one Hybrid_Observables/PVT): here both signals share one baseband stream
(L1/E1 share the 1575.42 MHz carrier), each runs its own signal-group
tracking scan, and the PVT estimates per-system receiver clocks.
"""

import numpy as np
import pytest

from gnss_sdr_tpu.receiver.pvt import geodesy
from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
from gnss_sdr_tpu.io.sources import ArraySignalSource
from gnss_sdr_tpu.utils import fixture_cache, scenario as scen

FS = 4.0e6
T0 = 352800.13
DUR = 26.0


@pytest.fixture(scope="module")
def hybrid_run():
    sc_g = scen.build_gps_l1_scenario(t0_gps=T0, duration_s=DUR, fs=FS,
                                      n_sats=4, cn0_dbhz=47.0)
    # vis_offset=3 + 0 deg mask: the two builders share one simulated
    # constellation, so without the offset every Galileo satellite would sit
    # exactly on a GPS one and the mixed fix would have 4-direction geometry
    # for 5 unknowns (position + two clocks) — pathological DOP. The offset
    # gives Galileo a mostly disjoint set (7 distinct directions total).
    sc_e = scen.build_galileo_e1_scenario(t0_gps=T0, duration_s=DUR, fs=FS,
                                          n_sats=4, cn0_dbhz=48.0,
                                          vis_offset=3, el_mask_deg=0.0)
    # both sims are referenced to the same receiver epoch and share the
    # carrier; sum the clean signals and add one unit-variance noise floor
    def _build():
        x = (sc_g.generate(seed=31, noise=False)
             + sc_e.generate(seed=32, noise=False))
        rng = np.random.default_rng(33)
        n = len(x)
        return (x + (rng.standard_normal(n) + 1j * rng.standard_normal(n))
                / np.sqrt(2.0)).astype(np.complex64)

    x = fixture_cache.cached_iq(
        "e2e_hybrid", dict(t0=T0, duration_s=DUR, fs=FS, n_sats=4,
                           seeds=(31, 32, 33), gal_vis_offset=3), _build)

    cfg = ReceiverConfig(
        fs=FS, chunk_ms=100,
        signal_plan=(("1C", 4, tuple(sc_g.prns)),
                     ("1B", 4, tuple(sc_e.prns))),
        acq_doppler_max_hz=5000.0, acq_doppler_step_hz=125.0,
        pll_bw_hz=20.0, dll_bw_hz=2.0, pll_bw_narrow_hz=8.0,
        dll_bw_narrow_hz=0.75,
        pvt_apply_tropo=False, pvt_apply_iono=False)
    rx = Receiver(cfg)
    rx.run_source(ArraySignalSource(x, FS))
    return sc_g, sc_e, rx


def test_both_systems_tracked(hybrid_run):
    sc_g, sc_e, rx = hybrid_run
    g_tracked = {ch.prn for ch in rx.groups[0].channels
                 if ch.state == "tracking"}
    e_tracked = {ch.prn for ch in rx.groups[1].channels
                 if ch.state == "tracking"}
    assert len(g_tracked & set(sc_g.prns)) >= 3
    assert len(e_tracked & set(sc_e.prns)) >= 3


def test_ephemerides_keyed_per_system(hybrid_run):
    sc_g, sc_e, rx = hybrid_run
    systems = {s for s, _ in rx.ephemerides}
    assert systems == {"G", "E"}
    # a mixed 2-clock fix needs >= 5 usable satellites overall; each system
    # must contribute at least 2 decoded ephemerides in the 26 s window
    assert sum(1 for s, _ in rx.ephemerides if s == "G") >= 2
    assert sum(1 for s, _ in rx.ephemerides if s == "E") >= 2
    assert len(rx.ephemerides) >= 5


def test_hybrid_position_fix(hybrid_run):
    sc_g, sc_e, rx = hybrid_run
    assert len(rx.fixes) >= 3, f"only {len(rx.fixes)} fixes"
    # the last fixes must combine both systems: per-system clock states exist
    mixed = [f for f in rx.fixes if set(f.system_clock_s) == {"E", "G"}]
    assert mixed, "no fix used both constellations"
    f = mixed[-1]
    # both sims share the truth timescale -> inter-system bias ~ 0
    isb = f.system_clock_s["E"] - f.system_clock_s["G"]
    assert abs(isb) < 1e-6, f"ISB {isb*1e9:.1f} ns"

    lat, lon, _ = sc_g.rcv_llh
    errs_enu = np.stack([
        geodesy.ecef_to_enu(f.pos_ecef - sc_g.rcv_ecef, lat, lon)
        for f in mixed[-5:]])
    mean_enu = errs_enu.mean(axis=0)
    err_2d = np.hypot(mean_enu[0], mean_enu[1])
    err_3d = np.linalg.norm(mean_enu)
    assert err_2d < 2.0, f"2D error {err_2d:.2f} m"
    assert err_3d < 5.0, f"3D error {err_3d:.2f} m"
