"""Kinematic RTK filter + cycle slips + kinematic PPP tests.

Reference analogs: rtklib_rtkpos.cc relpos/udstate (filtered kinematic DD
positioning with ambiguity bookkeeping and slip resets) and rtklib_ppp.cc
pppos in PMODE_PPP_KINEMA. Truth from the synthetic constellation oracle: a
constant-velocity rover must stay fixed at carrier-phase accuracy through
the trajectory, survive an injected cycle slip, and kinematic PPP must track
the moving antenna at sub-meter level.
"""

import numpy as np
import pytest

from gnss_sdr_tpu import constants as C
from gnss_sdr_tpu.receiver.pvt import geodesy, ppp, rtk
from gnss_sdr_tpu.receiver.pvt.rtk_filter import RtkFilter, RtkFilterConfig
from gnss_sdr_tpu.utils import constellation

LAM = C.SPEED_OF_LIGHT_M_S / 1_575_420_000.0
TRUE_LLH = (np.deg2rad(41.275), np.deg2rad(1.9876), 80.0)
T0 = 354000.0


@pytest.fixture(scope="module")
def world():
    ephs = constellation.almanac_constellation()
    base = geodesy.geodetic_to_ecef(*TRUE_LLH)
    vis = constellation.visible_sats(ephs, base, T0, el_mask_deg=10.0)
    prns = [p for p, _, _ in vis[:8]]
    return {("G", p): ephs[p] for p in prns}, base, prns


def _obs_at(ephs_keyed, prns, pos, t, n_amb, rng, pr_sigma=0.3,
            cp_sigma_cyc=0.005, clock_bias_s=0.0, slip_cycles=None,
            vel_ecef=None):
    """Observations of ``prns`` from ``pos`` at GPS time t (with injected
    integer ambiguities and optional per-PRN extra slip cycles)."""
    out = []
    for prn in prns:
        eph = ephs_keyed[("G", prn)]
        o = constellation.simulate_observation(eph, pos, t,
                                               rcv_clock_bias_s=clock_bias_s)
        extra = (slip_cycles or {}).get(prn, 0)
        # Doppler from the range rate (finite difference of the oracle,
        # RINEX sign D = -d(rho)/dt/lambda); receiver motion included
        pos2 = pos if vel_ecef is None else pos + vel_ecef
        o2 = constellation.simulate_observation(eph, pos2, t + 1.0,
                                                rcv_clock_bias_s=clock_bias_s)
        dop = -(o2.pseudorange_m - o.pseudorange_m) / LAM
        out.append(rtk.RtkObs(
            prn=prn, system="G",
            pseudorange_m=o.pseudorange_m + rng.normal(0, pr_sigma),
            carrier_phase_cycles=(o.pseudorange_m / LAM + n_amb[prn] + extra
                                  + rng.normal(0, cp_sigma_cyc)),
            doppler_hz=dop, t_tx_sv=o.t_tx_sv))
    return out


def test_kinematic_rtk_moving_rover(world):
    """Constant-velocity rover: fixed baselines at cm accuracy per epoch."""
    ephs, base_ecef, prns = world
    lat, lon, _ = TRUE_LLH
    v_enu = np.array([3.0, -1.5, 0.0])          # 3.4 m/s rover
    p0 = base_ecef + geodesy.enu_to_ecef_offset(
        np.array([50.0, 20.0, 1.0]), lat, lon)
    v_ecef = geodesy.enu_to_ecef_offset(v_enu, lat, lon)

    rng = np.random.default_rng(7)
    n_rov = {p: int(rng.integers(-2e6, 2e6)) for p in prns}
    n_bas = {p: int(rng.integers(-2e6, 2e6)) for p in prns}

    # moderately carrier-smoothed code (Hatch, observables.py): the filter
    # accumulates DD-ambiguity information across epochs (sigma_N ~ 1/sqrt(k))
    filt = RtkFilter(base_ecef, ephs,
                     RtkFilterConfig(mode="kinematic", sigma_pr_m=0.1,
                                     fix_and_hold=True))
    n_fixed = 0
    errs = []
    for k in range(30):
        t = T0 + 1.0 * k
        pos = p0 + v_ecef * k
        rover = _obs_at(ephs, prns, pos, t, n_rov, rng, pr_sigma=0.1,
                        clock_bias_s=1.3e-4, vel_ecef=v_ecef)
        basev = _obs_at(ephs, prns, base_ecef, t, n_bas, rng, pr_sigma=0.1,
                        clock_bias_s=-0.6e-4)
        sol = filt.update(rover, basev, t)
        assert sol.valid
        if k >= 2:
            assert sol.fixed, f"epoch {k} not fixed (ratio {sol.ratio:.1f})"
        if sol.fixed:
            n_fixed += 1
            errs.append(np.linalg.norm(sol.rover_ecef - pos))
    assert n_fixed >= 25
    assert filt.n_slips == 0, f"{filt.n_slips} false slips"
    assert max(errs) < 0.03, f"max kinematic fixed error {max(errs)*100:.1f} cm"


def test_kinematic_rtk_detects_cycle_slip(world):
    """A mid-run slip on one satellite is detected and re-fixed."""
    ephs, base_ecef, prns = world
    lat, lon, _ = TRUE_LLH
    p0 = base_ecef + geodesy.enu_to_ecef_offset(
        np.array([10.0, 5.0, 0.0]), lat, lon)

    rng = np.random.default_rng(13)
    n_rov = {p: int(rng.integers(-2e6, 2e6)) for p in prns}
    n_bas = {p: int(rng.integers(-2e6, 2e6)) for p in prns}

    filt = RtkFilter(base_ecef, ephs,
                     RtkFilterConfig(mode="static", sigma_pr_m=0.1,
                                     fix_and_hold=True))
    slip_prn = prns[2]
    errs_after = []
    for k in range(30):
        t = T0 + 1.0 * k
        slips = {slip_prn: 7} if k >= 15 else None   # +7 cycles from epoch 15
        rover = _obs_at(ephs, prns, p0, t, n_rov, rng, pr_sigma=0.1,
                        slip_cycles=slips)
        basev = _obs_at(ephs, prns, base_ecef, t, n_bas, rng, pr_sigma=0.1)
        sol = filt.update(rover, basev, t)
        if k >= 18:
            assert sol.fixed, f"epoch {k} lost fix after slip"
            errs_after.append(np.linalg.norm(sol.rover_ecef - p0))
    assert filt.n_slips >= 1, "slip not detected"
    assert max(errs_after) < 0.02, f"{max(errs_after)*100:.1f} cm after slip"


def test_kinematic_rtk_lli_reset(world):
    """An LLI flag forces the ambiguity reset even without a phase jump."""
    ephs, base_ecef, prns = world
    rng = np.random.default_rng(17)
    n_rov = {p: int(rng.integers(-2e6, 2e6)) for p in prns}
    n_bas = {p: int(rng.integers(-2e6, 2e6)) for p in prns}
    filt = RtkFilter(base_ecef, ephs, RtkFilterConfig(mode="static"))
    for k in range(6):
        t = T0 + 1.0 * k
        rover = _obs_at(ephs, prns, base_ecef + 5.0, t, n_rov, rng)
        basev = _obs_at(ephs, prns, base_ecef, t, n_bas, rng)
        lli = {("G", prns[0])} if k == 3 else None
        var_before = None
        if k == 3:
            i = filt.sat_index[("G", prns[0])]
            var_before = filt.p[i, i]
        sol = filt.update(rover, basev, t, lli=lli)
        if k == 3:
            assert filt.n_slips >= 1
    assert sol.valid


def test_ppp_kinematic_tracks_motion(world):
    """Kinematic PPP follows a moving antenna at sub-meter level."""
    ephs, base_ecef, prns = world
    lat, lon, _ = TRUE_LLH
    v_ecef = geodesy.enu_to_ecef_offset(np.array([2.0, 1.0, 0.0]), lat, lon)
    rng = np.random.default_rng(23)
    amb = {p: rng.normal(0, 30.0) for p in prns}
    ztd = 0.15

    filt = ppp.PppFilter(ephs, x0_ecef=base_ecef + np.array([20.0, -10.0, 30.0]),
                         mode="kinematic", q_pos_m2_s=1.0,
                         sigma_pr_m=0.7, sigma_phase_m=0.005)
    errs = []
    est = {}
    n_epochs = 480
    for k in range(n_epochs):
        t = T0 + 1.0 * k
        pos = base_ecef + v_ecef * k
        obs = []
        for p in prns:
            eph = ephs[("G", p)]
            o = constellation.simulate_observation(eph, pos, t,
                                                   rcv_clock_bias_s=1e-4)
            az, el = geodesy.az_el(pos, eph.position_velocity(o.t_tx_sv)[0])
            trop = ztd * ppp.tropo_mapping(el)
            obs.append(ppp.PppObs(
                prn=p, system="G", t_tx_sv=o.t_tx_sv,
                pr_if_m=o.pseudorange_m + trop + rng.normal(0, 0.7),
                phase_if_m=(o.pseudorange_m + trop + amb[p]
                            + rng.normal(0, 0.005))))
        sol = filt.update(obs, dt_s=1.0)
        est[k] = sol.pos_ecef.copy()
        if k >= n_epochs - 120:
            errs.append(np.linalg.norm(sol.pos_ecef - pos))
    # float kinematic PPP: ambiguities separate from position only through
    # geometry change, so meter-level after 8 min is the honest expectation
    # (RTKLIB PPP-kinematic behaves the same); the filter must bound the
    # error and follow the trajectory, not diverge
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    assert rmse < 3.5, f"kinematic PPP RMSE {rmse:.2f} m"
    # the carrier keeps epoch-to-epoch motion essentially exact: the
    # estimated displacement over the last 100 s must match |v| * dt
    moved = np.linalg.norm(est[n_epochs - 1] - est[n_epochs - 101])
    expect = np.linalg.norm(v_ecef) * 100.0
    assert moved == pytest.approx(expect, rel=0.02), (moved, expect)


def test_ppp_slip_reset_recovers(world):
    """A flagged cycle slip resets the ambiguity state; the filter must end
    close to its no-slip trajectory, while ignoring the slip corrupts it.
    (reference: udbias_ppp reinitializes biases on detected slips)"""
    ephs, base_ecef, prns = world
    pos = base_ecef
    slip_prn = prns[1]

    def run(flag_slip: bool, inject_slip: bool):
        rng = np.random.default_rng(29)
        amb = {p: rng.normal(0, 30.0) for p in prns}
        filt = ppp.PppFilter(ephs, x0_ecef=pos + 20.0, mode="static",
                             sigma_pr_m=0.7, sigma_phase_m=0.005)
        for k in range(480):
            t = T0 + 1.0 * k
            if k == 240 and inject_slip:
                amb[slip_prn] += 25.0 * LAM
            obs = []
            for p in prns:
                eph = ephs[("G", p)]
                o = constellation.simulate_observation(eph, pos, t)
                obs.append(ppp.PppObs(
                    prn=p, system="G", t_tx_sv=o.t_tx_sv,
                    pr_if_m=o.pseudorange_m + rng.normal(0, 0.7),
                    phase_if_m=(o.pseudorange_m + amb[p]
                                + rng.normal(0, 0.005))))
            slips = ({("G", slip_prn)} if (k == 240 and flag_slip) else None)
            sol = filt.update(obs, slips=slips)
        return filt, np.linalg.norm(sol.pos_ecef - pos)

    filt_clean, err_clean = run(flag_slip=False, inject_slip=False)
    filt_reset, err_reset = run(flag_slip=True, inject_slip=True)
    filt_blind, err_blind = run(flag_slip=False, inject_slip=True)
    assert filt_reset.n_slips == 1 and filt_blind.n_slips == 0
    # the reset confines the damage to near the no-slip trajectory ...
    assert err_reset < err_clean + 0.35, (err_reset, err_clean)
    # ... while swallowing a 25-cycle slip visibly corrupts the solution
    assert err_blind > err_reset + 0.3, (err_blind, err_reset)


def test_rtk_engine_kinematic_mode_from_rtcm(world):
    """RtkEngine(mode="kinematic"): base epochs over RTCM (1005/1019/MSM7
    with phase rates), moving rover pushed per epoch — filtered fixes track
    the trajectory (reference PVT.positioning_mode=Kinematic -> relpos)."""
    from gnss_sdr_tpu.receiver.observables import ChannelObservable
    from gnss_sdr_tpu.receiver.pvt import rtcm
    from gnss_sdr_tpu.receiver.pvt.rtk_engine import (RtcmBaseStation,
                                                      RtkEngine)

    ephs, base_ecef, prns = world
    lat, lon, _ = TRUE_LLH
    v_ecef = geodesy.enu_to_ecef_offset(np.array([2.5, -1.0, 0.0]), lat, lon)
    p0 = base_ecef + geodesy.enu_to_ecef_offset(
        np.array([30.0, 12.0, 0.5]), lat, lon)
    rng = np.random.default_rng(61)
    n_rov = {p: int(rng.integers(-5000, 5000)) for p in prns}
    n_bas = {p: int(rng.integers(-5000, 5000)) for p in prns}

    station = RtcmBaseStation()
    stream = b"".join(
        [rtcm.frame(rtcm.encode_1005(55, base_ecef))]
        + [rtcm.frame(rtcm.encode_1019(ephs[("G", p)])) for p in prns])
    station.push_bytes(stream)
    engine = RtkEngine(station, sigma_pr_m=0.1, mode="kinematic")

    errs = []
    for k in range(30):
        t = T0 + 1.0 * k
        pos = p0 + v_ecef * k
        basev = _obs_at(ephs, prns, base_ecef, t, n_bas, rng, pr_sigma=0.1)
        tow_base = (basev[0].t_tx_sv
                    + basev[0].pseudorange_m / C.SPEED_OF_LIGHT_M_S)
        msm = [rtcm.MsmObservation(
            prn=o.prn, signal_id=2, pseudorange_m=o.pseudorange_m,
            phase_range_m=o.carrier_phase_cycles * LAM,
            phase_rate_m_s=-o.doppler_hz * LAM, cn0_dbhz=44.0)
            for o in basev]
        station.push_bytes(rtcm.frame(rtcm.encode_msm7(
            rtcm.MSM7_GPS, 55, int(round(tow_base * 1e3)), msm)))

        rover = _obs_at(ephs, prns, pos, t, n_rov, rng, pr_sigma=0.1,
                        vel_ecef=v_ecef)
        rover_chan = [ChannelObservable(
            prn=o.prn, signal="1C", t_tx_sv=o.t_tx_sv,
            pseudorange_m=o.pseudorange_m,
            carrier_phase_cycles=o.carrier_phase_cycles,
            doppler_hz=o.doppler_hz, cn0_dbhz=45.0) for o in rover]
        engine.push_rover_epoch(0, rover_chan)
        if engine.solutions and engine.solutions[-1].fixed:
            errs.append(np.linalg.norm(
                engine.solutions[-1].rover_ecef - pos))
    assert engine._filter is not None          # filtered mode engaged
    assert len(errs) >= 10, f"only {len(errs)} fixed epochs"
    # MSM phase quantization (~0.1 mm) + 1019 ephemeris quantization leave
    # cm-level agreement
    assert max(errs[3:]) < 0.06, f"max {max(errs[3:])*100:.1f} cm"


def test_rtk_engine_kinematic_from_msm4_base(world):
    """MSM4 base epochs carry NO phase rate: the filter must fall back to
    the code-minus-carrier slip test instead of treating the missing base
    Doppler as a phase jump (which reset every ambiguity every epoch and
    made AR impossible). Fixes must still accumulate and no spurious slips
    may fire."""
    from gnss_sdr_tpu.receiver.observables import ChannelObservable
    from gnss_sdr_tpu.receiver.pvt import rtcm
    from gnss_sdr_tpu.receiver.pvt.rtk_engine import (RtcmBaseStation,
                                                      RtkEngine)

    ephs, base_ecef, prns = world
    lat, lon, _ = TRUE_LLH
    p0 = base_ecef + geodesy.enu_to_ecef_offset(
        np.array([25.0, -8.0, 0.3]), lat, lon)
    rng = np.random.default_rng(77)
    n_rov = {p: int(rng.integers(-5000, 5000)) for p in prns}
    # base ambiguities small enough for the MSM4 fine-phase field (+-1171 m
    # around the code-derived rough range): real receivers export
    # phase-range aligned to the pseudorange, not offset by km
    n_bas = {p: int(rng.integers(-300, 300)) for p in prns}

    station = RtcmBaseStation()
    station.push_bytes(b"".join(
        [rtcm.frame(rtcm.encode_1005(55, base_ecef))]
        + [rtcm.frame(rtcm.encode_1019(ephs[("G", p)])) for p in prns]))
    engine = RtkEngine(station, sigma_pr_m=0.1, mode="kinematic")

    errs = []
    for k in range(25):
        t = T0 + 1.0 * k
        basev = _obs_at(ephs, prns, base_ecef, t, n_bas, rng, pr_sigma=0.1)
        tow_base = (basev[0].t_tx_sv
                    + basev[0].pseudorange_m / C.SPEED_OF_LIGHT_M_S)
        msm = [rtcm.MsmObservation(
            prn=o.prn, signal_id=2, pseudorange_m=o.pseudorange_m,
            phase_range_m=o.carrier_phase_cycles * LAM, cn0_dbhz=44.0)
            for o in basev]
        station.push_bytes(rtcm.frame(rtcm.encode_msm(
            rtcm.MSM4_GPS, 55, int(round(tow_base * 1e3)), msm)))

        rover = _obs_at(ephs, prns, p0, t, n_rov, rng, pr_sigma=0.1)
        engine.push_rover_epoch(0, [ChannelObservable(
            prn=o.prn, signal="1C", t_tx_sv=o.t_tx_sv,
            pseudorange_m=o.pseudorange_m,
            carrier_phase_cycles=o.carrier_phase_cycles,
            doppler_hz=o.doppler_hz, cn0_dbhz=45.0) for o in rover])
        if engine.solutions and engine.solutions[-1].fixed:
            errs.append(np.linalg.norm(engine.solutions[-1].rover_ecef - p0))
    assert engine._filter is not None
    assert engine._filter.n_slips == 0, "no-Doppler base caused slip resets"
    assert len(errs) >= 10, f"only {len(errs)} fixed epochs with MSM4 base"
    assert max(errs[3:]) < 0.06


def test_rtk_filter_drops_and_readds_satellites(world):
    """Satellites leaving the common view drop their ambiguity states
    (with correct index remapping); re-appearing satellites re-initialize
    and the filter keeps producing valid fixed solutions throughout."""
    ephs, base_ecef, prns = world
    rng = np.random.default_rng(71)
    n_rov = {p: int(rng.integers(-5000, 5000)) for p in prns}
    n_bas = {p: int(rng.integers(-5000, 5000)) for p in prns}
    p0 = base_ecef + 8.0

    filt = RtkFilter(base_ecef, ephs,
                     RtkFilterConfig(mode="static", sigma_pr_m=0.1,
                                     fix_and_hold=True))
    n_all = len(prns)
    for k in range(24):
        t = T0 + 1.0 * k
        if k < 8:
            use = prns                   # full set
        elif k < 16:
            use = prns[:6]               # some satellites set
        else:
            use = prns                   # and return
        rover = _obs_at(ephs, use, p0, t, n_rov, rng, pr_sigma=0.1)
        basev = _obs_at(ephs, use, base_ecef, t, n_bas, rng, pr_sigma=0.1)
        sol = filt.update(rover, basev, t)
        assert sol.valid
        if k == 9:
            # states shrank: 3 pos + 6 ambiguities
            assert len(filt.x) == 3 + 6
            assert set(filt.sat_index) == {("G", p) for p in prns[:6]}
            # covariance stayed consistent with the state vector
            assert filt.p.shape == (len(filt.x), len(filt.x))
        if k == 23:
            assert len(filt.x) == 3 + n_all
            assert sol.fixed
            err = np.linalg.norm(sol.rover_ecef - p0)
            assert err < 0.03, f"{err*100:.1f} cm after drop/re-add"


def test_glonass_rover_pure_rtcm_stream():
    """GLONASS RTK rover fed ONLY by an RTCM stream: station from 1006,
    orbits from 1020, observables from GLONASS MSM7 (native dow/tod epochs
    + per-slot FDMA channels in the extended info). The float baseline must
    converge to decimetre level — proving a GLONASS rover needs nothing
    outside the stream (reference rtklib_rtcm3.cc input path)."""
    from gnss_sdr_tpu.models.nav.glonass_gnav import GlonassEphemeris
    from gnss_sdr_tpu.receiver.observables import ChannelObservable
    from gnss_sdr_tpu.receiver.pvt import rtcm
    from gnss_sdr_tpu.receiver.pvt.rtk_engine import (RtcmBaseStation,
                                                      RtkEngine)

    lat, lon, _ = TRUE_LLH
    base_ecef = geodesy.geodetic_to_ecef(*TRUE_LLH)
    t0 = 40000.0                     # GLONASS seconds-of-day
    tb = 900.0 * round(t0 / 900.0)
    slots = {3: 5, 9: -2, 14: 0, 17: 4, 21: -4}
    # state vectors sampled from the Kepler almanac shell (same recipe as
    # the GLONASS signal scenario)
    kep = constellation.almanac_constellation()
    vis = constellation.visible_sats(kep, base_ecef, 352800.0,
                                     el_mask_deg=15.0)
    prns = [p for p, _, _ in vis[:5]]
    gephs = {}
    for prn, (slot, k) in zip(prns, slots.items()):
        p, v = kep[prn].position_velocity(352800.0 + (tb - t0))
        gephs[("R", slot)] = GlonassEphemeris(
            slot=slot, freq_slot=k, tb_s=tb, pos_m=tuple(p),
            vel_m_s=tuple(v), acc_m_s2=(0.0, 0.0, 0.0))

    spec = C.SIGNALS["1G"]
    rng = np.random.default_rng(5)
    n_rov = {s: int(rng.integers(-200, 200)) for s in slots}
    n_bas = {s: int(rng.integers(-200, 200)) for s in slots}
    rover_pos = base_ecef + geodesy.enu_to_ecef_offset(
        np.array([18.0, -6.0, 0.4]), lat, lon)

    station = RtcmBaseStation()
    station.push_bytes(b"".join(
        [rtcm.frame(rtcm.encode_1006(12, base_ecef, 1.2, glo=True))]
        + [rtcm.frame(rtcm.encode_1020(e)) for e in gephs.values()]))
    assert station.base_ecef is not None
    assert all(("R", s) in station.ephemerides for s in slots)
    engine = RtkEngine(station, sigma_pr_m=0.3, mode="kinematic")

    def obs_of(pos, t, n_amb, pr_sigma):
        out = []
        for slot, k in slots.items():
            eph = station.ephemerides[("R", slot)]   # DECODED orbits only
            o = constellation.simulate_observation(
                eph, pos, t, carrier_freq_hz=spec.carrier_freq_hz
                + k * spec.fdma_step_hz)
            lam = C.SPEED_OF_LIGHT_M_S / (spec.carrier_freq_hz
                                          + k * spec.fdma_step_hz)
            out.append((slot, k, o, lam,
                        o.pseudorange_m + rng.normal(0, pr_sigma),
                        o.pseudorange_m / lam + n_amb[slot]
                        + rng.normal(0, 0.01)))
        return out

    for kk in range(20):
        t = t0 + 1.0 * kk
        basev = obs_of(base_ecef, t, n_bas, 0.3)
        tow_ms = int(round((basev[0][2].t_tx_sv
                            + basev[0][4] / C.SPEED_OF_LIGHT_M_S) * 1e3))
        msm = [rtcm.MsmObservation(
            prn=slot, signal_id=2, pseudorange_m=pr,
            phase_range_m=cp * lam, phase_rate_m_s=-o.doppler_hz * lam,
            cn0_dbhz=44.0, freq_slot=k)
            for slot, k, o, lam, pr, cp in basev]
        station.push_bytes(rtcm.frame(rtcm.encode_msm(
            rtcm.MSM7_GLO, 12, tow_ms, msm)))

        roverv = obs_of(rover_pos, t, n_rov, 0.3)
        engine.push_rover_epoch(0, [ChannelObservable(
            prn=slot, signal="1G", t_tx_sv=o.t_tx_sv,
            pseudorange_m=pr, carrier_phase_cycles=cp,
            doppler_hz=o.doppler_hz, cn0_dbhz=45.0,
            carrier_freq_hz=spec.carrier_freq_hz + k * spec.fdma_step_hz)
            for slot, k, o, lam, pr, cp in roverv])
    assert engine.solutions, "no solutions from the pure-RTCM stream"
    err = np.linalg.norm(engine.solutions[-1].rover_ecef - rover_pos)
    assert err < 0.5, f"float GLONASS RTK error {err:.2f} m"


def test_beidou_rover_pure_rtcm_stream():
    """BeiDou RTK rover fed ONLY by an RTCM stream: station from 1006,
    orbits from 1042 (BDS Kepler ephemeris), observables from BDS MSM7
    (1127, BDT epochs). The float baseline must converge to decimetre
    level — a BDS rover needs nothing outside the stream (reference
    rtklib_rtcm3.cc 1042/1121-1127 input path)."""
    from gnss_sdr_tpu.receiver.observables import ChannelObservable
    from gnss_sdr_tpu.receiver.pvt import rtcm
    from gnss_sdr_tpu.receiver.pvt.rtk_engine import (RtcmBaseStation,
                                                      RtkEngine)

    lat, lon, _ = TRUE_LLH
    base_ecef = geodesy.geodetic_to_ecef(*TRUE_LLH)
    t0 = 352800.0
    kep = constellation.almanac_constellation()
    vis = constellation.visible_sats(kep, base_ecef, t0, el_mask_deg=15.0)
    prns = [p for p, _, _ in vis[:5]]
    spec = C.SIGNALS["B1"]
    ephs = {}
    for prn in prns:
        e = kep[prn]
        e.prn = prn
        e.gm = C.GM_EARTH_BDS
        e.toe = 352800.0
        e.toc = 352800.0
        ephs[prn] = e

    station = RtcmBaseStation()
    station.push_bytes(b"".join(
        [rtcm.frame(rtcm.encode_1006(31, base_ecef, 0.7))]
        + [rtcm.frame(rtcm.encode_1042(e)) for e in ephs.values()]))
    assert station.base_ecef is not None
    assert all(("C", p) in station.ephemerides for p in prns)
    engine = RtkEngine(station, sigma_pr_m=0.3, mode="kinematic")

    lam = C.SPEED_OF_LIGHT_M_S / spec.carrier_freq_hz
    rng = np.random.default_rng(9)
    n_rov = {p: int(rng.integers(-200, 200)) for p in prns}
    n_bas = {p: int(rng.integers(-200, 200)) for p in prns}
    rover_pos = base_ecef + geodesy.enu_to_ecef_offset(
        np.array([-9.0, 14.0, -0.6]), lat, lon)

    def obs_of(pos, t, n_amb, pr_sigma):
        out = []
        for p in prns:
            eph = station.ephemerides[("C", p)]      # DECODED orbits only
            o = constellation.simulate_observation(
                eph, pos, t, carrier_freq_hz=spec.carrier_freq_hz)
            out.append((p, o,
                        o.pseudorange_m + rng.normal(0, pr_sigma),
                        o.pseudorange_m / lam + n_amb[p]
                        + rng.normal(0, 0.01)))
        return out

    for kk in range(20):
        t = t0 + 1.0 * kk
        basev = obs_of(base_ecef, t, n_bas, 0.3)
        tow_ms = int(round((basev[0][1].t_tx_sv
                            + basev[0][2] / C.SPEED_OF_LIGHT_M_S) * 1e3))
        msm = [rtcm.MsmObservation(
            prn=p, signal_id=2, pseudorange_m=pr,
            phase_range_m=cp * lam, phase_rate_m_s=-o.doppler_hz * lam,
            cn0_dbhz=44.0)
            for p, o, pr, cp in basev]
        station.push_bytes(rtcm.frame(rtcm.encode_msm(
            rtcm.MSM7_BDS, 31, tow_ms, msm)))

        roverv = obs_of(rover_pos, t, n_rov, 0.3)
        engine.push_rover_epoch(0, [ChannelObservable(
            prn=p, signal="B1", t_tx_sv=o.t_tx_sv,
            pseudorange_m=pr, carrier_phase_cycles=cp,
            doppler_hz=o.doppler_hz, cn0_dbhz=45.0,
            carrier_freq_hz=spec.carrier_freq_hz)
            for p, o, pr, cp in roverv])
    assert engine.solutions, "no solutions from the pure-RTCM BDS stream"
    err = np.linalg.norm(engine.solutions[-1].rover_ecef - rover_pos)
    assert err < 0.5, f"float BDS RTK error {err:.2f} m"


def test_rtk_engine_dgps_mode_from_rtcm(world):
    """PVT.positioning_mode=DGPS from a pure RTCM stream (reference
    PMODE_DGPS, rtklib_rtkpos.cc:2787): code-only differential. Common-mode
    per-satellite range errors (orbit/iono/sat-clock style) bias the
    single-point fix by meters but cancel in the base/rover differences."""
    from gnss_sdr_tpu.receiver.observables import ChannelObservable
    from gnss_sdr_tpu.receiver.pvt import rtcm
    from gnss_sdr_tpu.receiver.pvt.rtk_engine import (RtcmBaseStation,
                                                      RtkEngine)

    ephs, base_ecef, prns = world
    lat, lon, _ = TRUE_LLH
    p0 = base_ecef + geodesy.enu_to_ecef_offset(
        np.array([40.0, -15.0, 1.0]), lat, lon)
    rng = np.random.default_rng(83)
    # common-mode per-satellite errors, ~5 m scale — the DGPS cancellation
    # target (broadcast orbit + iono + satellite clock residuals)
    common_err = {p: rng.normal(0, 5.0) for p in prns}

    station = RtcmBaseStation()
    station.push_bytes(b"".join(
        [rtcm.frame(rtcm.encode_1005(55, base_ecef))]
        + [rtcm.frame(rtcm.encode_1019(ephs[("G", p)])) for p in prns]))
    engine = RtkEngine(station, sigma_pr_m=0.5, mode="dgps")

    for k in range(10):
        t = T0 + 1.0 * k
        basev = _obs_at(ephs, prns, base_ecef, t,
                        {p: 0 for p in prns}, rng, pr_sigma=0.4)
        for o in basev:
            o.pseudorange_m += common_err[o.prn]
        tow_base = (basev[0].t_tx_sv
                    + basev[0].pseudorange_m / C.SPEED_OF_LIGHT_M_S)
        msm = [rtcm.MsmObservation(
            prn=o.prn, signal_id=2, pseudorange_m=o.pseudorange_m,
            phase_range_m=0.0, cn0_dbhz=44.0) for o in basev]
        station.push_bytes(rtcm.frame(rtcm.encode_msm(
            rtcm.MSM5_GPS, 55, int(round(tow_base * 1e3)), msm)))

        rover = _obs_at(ephs, prns, p0, t, {p: 0 for p in prns}, rng,
                        pr_sigma=0.4)
        engine.push_rover_epoch(0, [ChannelObservable(
            prn=o.prn, signal="1C", t_tx_sv=o.t_tx_sv,
            pseudorange_m=o.pseudorange_m + common_err[o.prn],
            carrier_phase_cycles=o.carrier_phase_cycles,
            doppler_hz=o.doppler_hz, cn0_dbhz=45.0) for o in rover])
    assert len(engine.solutions) >= 8, "DGPS produced too few solutions"
    errs = [np.linalg.norm(s.rover_ecef - p0)
            for s in engine.solutions[-5:]]
    assert float(np.mean(errs)) < 2.0, \
        f"DGPS mean error {np.mean(errs):.2f} m (5 m common-mode injected)"
    assert not engine.solutions[-1].fixed       # code-only: no ambiguities


def test_rtk_engine_moving_base_from_rtcm(world):
    """PVT.positioning_mode=Moving_Base (reference PMODE_MOVEB): the base
    broadcasts observations but NO surveyed 1005 position — its location is
    re-solved per epoch; the DD baseline between the two moving receivers
    still fixes at centimeter accuracy."""
    from gnss_sdr_tpu.receiver.observables import ChannelObservable
    from gnss_sdr_tpu.receiver.pvt import rtcm
    from gnss_sdr_tpu.receiver.pvt.rtk_engine import (RtcmBaseStation,
                                                      RtkEngine)

    ephs, base_ecef, prns = world
    lat, lon, _ = TRUE_LLH
    v_ecef = geodesy.enu_to_ecef_offset(np.array([4.0, 2.0, 0.0]), lat, lon)
    # rover rides 12.3 m ahead of the base antenna (boat heading setup)
    off = geodesy.enu_to_ecef_offset(np.array([12.0, 2.5, 0.8]), lat, lon)
    rng = np.random.default_rng(97)
    n_rov = {p: int(rng.integers(-5000, 5000)) for p in prns}
    n_bas = {p: int(rng.integers(-5000, 5000)) for p in prns}

    station = RtcmBaseStation()
    station.push_bytes(b"".join(
        rtcm.frame(rtcm.encode_1019(ephs[("G", p)])) for p in prns))
    assert station.base_ecef is None            # no surveyed position
    engine = RtkEngine(station, sigma_pr_m=0.1, mode="moving_base")

    errs, errs_float = [], []
    for k in range(12):
        t = T0 + 1.0 * k
        bpos = base_ecef + v_ecef * k
        rpos = bpos + off
        # carrier-smoothed-code-grade noise (Hatch, observables.py):
        # single-epoch AR needs a tight code float; raw-code moving-base
        # runs float-only, exactly like rtklib's single-epoch moveb
        basev = _obs_at(ephs, prns, bpos, t, n_bas, rng, pr_sigma=0.03,
                        vel_ecef=v_ecef)
        tow_base = (basev[0].t_tx_sv
                    + basev[0].pseudorange_m / C.SPEED_OF_LIGHT_M_S)
        msm = [rtcm.MsmObservation(
            prn=o.prn, signal_id=2, pseudorange_m=o.pseudorange_m,
            phase_range_m=o.carrier_phase_cycles * LAM,
            phase_rate_m_s=-o.doppler_hz * LAM, cn0_dbhz=44.0)
            for o in basev]
        station.push_bytes(rtcm.frame(rtcm.encode_msm7(
            rtcm.MSM7_GPS, 55, int(round(tow_base * 1e3)), msm)))

        rover = _obs_at(ephs, prns, rpos, t, n_rov, rng, pr_sigma=0.03,
                        vel_ecef=v_ecef)
        engine.push_rover_epoch(0, [ChannelObservable(
            prn=o.prn, signal="1C", t_tx_sv=o.t_tx_sv,
            pseudorange_m=o.pseudorange_m,
            carrier_phase_cycles=o.carrier_phase_cycles,
            doppler_hz=o.doppler_hz, cn0_dbhz=45.0) for o in rover])
        if engine.solutions:
            s = engine.solutions[-1]
            (errs if s.fixed else errs_float).append(
                np.linalg.norm(s.baseline_m - off))
    assert len(errs) + len(errs_float) >= 10, "moving-base epochs missing"
    assert len(errs) >= 3, f"only {len(errs)} fixed moving-base epochs"
    assert max(errs) < 0.05, f"moving-base baseline error {max(errs)*100:.1f} cm"
    if errs_float:
        assert max(errs_float) < 0.6, "float moving-base baseline off"
