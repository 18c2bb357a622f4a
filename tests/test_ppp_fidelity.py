"""PPP observation-model fidelity: phase wind-up, antenna offsets, ANTEX.

Reference analogs: rtklib_ppp.cc windupcorr, rtklib_preceph.cc satantoff,
rtklib_rtkcmn.cc readpcv/antmodel. The regression test injects wind-up
into the simulated dual-frequency phases and shows PPP-AR fixes WITH the
correction and degrades WITHOUT it — the proof that the model matters.
"""

import numpy as np

from gnss_sdr_tpu import constants as C
from gnss_sdr_tpu.receiver.pvt import corrections, geodesy, ppp
from gnss_sdr_tpu.utils import constellation

TRUE_LLH = (np.deg2rad(41.275), np.deg2rad(1.9876), 80.0)
T0 = 352800.0
F1 = 1_575_420_000.0
F5 = 1_176_450_000.0
LAM1 = C.SPEED_OF_LIGHT_M_S / F1
LAM5 = C.SPEED_OF_LIGHT_M_S / F5


def test_sun_position_sane():
    s = corrections.sun_position_ecef(T0)
    r = np.linalg.norm(s)
    assert 1.45e11 < r < 1.55e11               # ~1 AU
    # moves over 6 hours, magnitude stays at 1 AU
    s2 = corrections.sun_position_ecef(T0 + 21600.0)
    assert np.linalg.norm(s2 - s) > 1e9        # Earth rotation dominates
    assert abs(np.linalg.norm(s2) - r) < 2e9


def test_satellite_body_axes_orthonormal():
    sat = np.array([2.0e7, 1.1e7, 8.0e6])
    sun = corrections.sun_position_ecef(T0)
    ex, ey, ez = corrections.satellite_body_axes(sat, sun)
    for v in (ex, ey, ez):
        assert abs(np.linalg.norm(v) - 1.0) < 1e-12
    assert abs(ex @ ey) < 1e-12 and abs(ey @ ez) < 1e-12
    assert ez @ sat < 0                        # toward the Earth


def test_phase_windup_continuity_and_rate():
    """Wind-up is continuous across epochs and slow (geometry rotates at
    orbital timescales); forcing a flipped dipole changes it by ~half a
    cycle."""
    ephs = constellation.almanac_constellation()
    rcv = geodesy.geodetic_to_ecef(*TRUE_LLH)
    prn = constellation.visible_sats(ephs, rcv, T0)[0][0]
    w_prev = None
    ws = []
    for k in range(10):
        t = T0 + 30.0 * k
        sat = ephs[prn].position_velocity(t)[0]
        sun = corrections.sun_position_ecef(t)
        w_prev = corrections.phase_windup_cycles(
            sat, sun, rcv, TRUE_LLH[0], TRUE_LLH[1], prev_cycles=w_prev)
        ws.append(w_prev)
    dws = np.abs(np.diff(ws))
    assert np.all(dws < 0.05), f"wind-up jumped {dws.max():.3f} cyc/30 s"
    assert np.any(dws > 0), "wind-up frozen"


def test_satellite_antenna_offset_geometry():
    """The z-PCO points at the Earth: for a satellite straight above the
    receiver the offset shortens the geometric range by ~|z PCO|."""
    rcv = geodesy.geodetic_to_ecef(*TRUE_LLH)
    sat = rcv * (26_560e3 / np.linalg.norm(rcv))     # radially above
    sun = corrections.sun_position_ecef(T0)
    off = corrections.satellite_antenna_offset(sat, sun)
    e = (rcv - sat) / np.linalg.norm(rcv - sat)
    # range reduction = e . off ~ z-PCO (1.6 m), x-PCO projects ~0
    assert abs(e @ off - corrections.DEFAULT_SAT_PCO_BODY_M[2]) < 0.05


def test_antex_receiver_parse(tmp_path):
    antex = """\
     1.4            M                                           ANTEX VERSION / SYST
A                                                           PCV TYPE / REFANT
                                                            END OF HEADER
                                                            START OF ANTENNA
TESTANT  NONE                                               TYPE / SERIAL NO
     0.0  90.0   5.0                                        ZEN1 / ZEN2 / DZEN
   G01                                                      START OF FREQUENCY
      2.50      1.20     80.00                              NORTH / EAST / UP
   NOAZI    0.0    0.3    0.8    1.5    2.0    2.6    3.0    3.3    3.5    3.6    3.6    3.5    3.3    3.0    2.6    2.0    1.5    0.8    0.3
                                                            END OF FREQUENCY
                                                            END OF ANTENNA
"""
    p = tmp_path / "rcv.atx"
    p.write_text(antex)
    ant = corrections.parse_antex_receiver(p, "TESTANT  NONE")
    # mm -> m, ENU ordering (east, north, up)
    assert abs(ant.pco_enu_m[0] - 1.2e-3) < 1e-9
    assert abs(ant.pco_enu_m[1] - 2.5e-3) < 1e-9
    assert abs(ant.pco_enu_m[2] - 80.0e-3) < 1e-9
    # zenith: PCO up-projection + PCV(0)
    d_zen = ant.correction_m(0.0, np.pi / 2)
    assert abs(d_zen - 0.080) < 1e-6
    # mid elevation includes the interpolated PCV
    d45 = ant.correction_m(0.0, np.deg2rad(45.0))
    assert d45 != d_zen


def _run_ppp(correct_windup: bool):
    """Dual-frequency PPP-AR on synthetic obs WITH wind-up in the phases;
    returns (engine, truth position)."""
    from gnss_sdr_tpu.receiver.observables import ChannelObservable
    from gnss_sdr_tpu.receiver.pvt.ppp_engine import PppEngine

    ephs_all = constellation.almanac_constellation()
    for e in ephs_all.values():
        e.tgd = 0.0       # dual-frequency oracle with no inter-signal bias
    rcv = geodesy.geodetic_to_ecef(*TRUE_LLH)
    vis = constellation.visible_sats(ephs_all, rcv, T0, el_mask_deg=15.0)
    prns = [p for p, _, _ in vis[:6]]
    ephs = {("G", p): ephs_all[p] for p in prns}

    rng = np.random.default_rng(31)
    n1 = {p: int(rng.integers(-800, 800)) for p in prns}
    n5 = {p: int(rng.integers(-800, 800)) for p in prns}
    ztd = 0.12

    eng = PppEngine(ephs, x0_ecef=(0.0, 0.0, 0.0), mode="static",
                    sigma_pr_m=0.8, sigma_phase_m=0.01)
    eng.seed_position(rcv + np.array([9.0, -6.0, 14.0]))
    if correct_windup:
        eng.enable_precise_models(windup=True)

    windup_truth: dict = {}
    for k in range(240):
        t = T0 + 1.0 * k
        chans = []
        for p in prns:
            eph = ephs[("G", p)]
            o = constellation.simulate_observation(eph, rcv, t,
                                                   rcv_clock_bias_s=1e-4)
            o2 = constellation.simulate_observation(eph, rcv, t + 1.0,
                                                    rcv_clock_bias_s=1e-4)
            rate = o2.pseudorange_m - o.pseudorange_m
            sat = eph.position_velocity(o.t_tx_sv)[0]
            az, el = geodesy.az_el(rcv, sat)
            trop = ztd * ppp.tropo_mapping(el)
            rho = o.pseudorange_m + trop
            # inject the TRUE wind-up into both carriers (cycles), with
            # per-sat continuity — the physical effect under test
            sun = corrections.sun_position_ecef(t)
            w = corrections.phase_windup_cycles(
                sat, sun, rcv, TRUE_LLH[0], TRUE_LLH[1],
                prev_cycles=windup_truth.get(p))
            windup_truth[p] = w
            chans.append(ChannelObservable(
                prn=p, signal="1C", t_tx_sv=o.t_tx_sv,
                pseudorange_m=rho + rng.normal(0, 0.5),
                carrier_phase_cycles=(rho / LAM1 + n1[p] + w
                                      + rng.normal(0, 0.008)),
                doppler_hz=-rate / LAM1, cn0_dbhz=45.0))
            chans.append(ChannelObservable(
                prn=p, signal="L5", t_tx_sv=o.t_tx_sv,
                pseudorange_m=rho + rng.normal(0, 0.5),
                carrier_phase_cycles=(rho / LAM5 + n5[p] + w
                                      + rng.normal(0, 0.008)),
                doppler_hz=-rate / LAM5, cn0_dbhz=45.0))
        eng.push_epoch(k, chans)
    return eng, rcv


def test_ppp_ar_with_windup_corrected_fixes():
    eng, rcv = _run_ppp(correct_windup=True)
    assert eng.solutions
    assert eng.filter.n_fixed_epochs > 0, \
        f"AR never fixed with wind-up corrected (ratio {eng.filter.last_ratio:.2f})"
    final = eng.solutions[-1]
    err = np.linalg.norm(final.pos_ecef - rcv)
    assert err < 0.05, f"corrected PPP-AR error {err * 100:.1f} cm"


def test_ppp_ar_without_windup_correction_degrades():
    """Disabling the wind-up correction on wind-up-bearing phases must
    visibly hurt: either AR never fixes or the solution is worse than the
    corrected run by a clear margin (regression proof the model matters)."""
    eng_off, rcv = _run_ppp(correct_windup=False)
    eng_on, _ = _run_ppp(correct_windup=True)
    err_on = np.linalg.norm(eng_on.solutions[-1].pos_ecef - rcv)
    if eng_off.filter.n_fixed_epochs == 0:
        return                                    # AR blocked: model matters
    err_off = np.linalg.norm(eng_off.solutions[-1].pos_ecef - rcv)
    assert err_off > 2.0 * max(err_on, 0.01), (
        f"wind-up made no difference: off={err_off*100:.1f} cm "
        f"on={err_on*100:.1f} cm")
