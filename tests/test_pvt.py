"""PVT solver tests against the synthetic constellation oracle.

The reference's equivalent is rtklib_solver_test.cc; here the truth is the
constellation simulator, so errors are attributable purely to the solver.
"""

import numpy as np
import pytest

from gnss_sdr_tpu import constants as C
from gnss_sdr_tpu.models.ephemeris import IonoParams
from gnss_sdr_tpu.receiver.pvt import geodesy, solver, atmosphere
from gnss_sdr_tpu.utils import constellation

TRUE_LLH = (np.deg2rad(41.275), np.deg2rad(1.9876), 80.0)  # near CTTC
T_RX = 354000.0


@pytest.fixture(scope="module")
def world():
    ephs = constellation.almanac_constellation()
    rcv = geodesy.geodetic_to_ecef(*TRUE_LLH)
    vis = constellation.visible_sats(ephs, rcv, T_RX, el_mask_deg=10.0)
    assert len(vis) >= 6, f"constellation gives only {len(vis)} visible sats"
    return ephs, rcv, vis


def test_geodesy_roundtrip():
    for lat, lon, h in [(0.6, -2.0, 120.0), (-1.2, 3.0, 4000.0), (0.0, 0.0, 0.0)]:
        xyz = geodesy.geodetic_to_ecef(lat, lon, h)
        la, lo, hh = geodesy.ecef_to_geodetic(xyz)
        assert abs(la - lat) < 1e-11 and abs(lo - lon) < 1e-11 and abs(hh - h) < 1e-6


def test_pvt_noise_free(world):
    ephs, rcv, vis = world
    bias = 2.31e-4
    obs = [constellation.simulate_observation(ephs[prn], rcv, T_RX,
                                              rcv_clock_bias_s=bias)
           for prn, _, _ in vis[:8]]
    sol = solver.solve_pvt(obs, ephs, iono=None, apply_tropo=False)
    assert sol.valid
    err = np.linalg.norm(sol.pos_ecef - rcv)
    # the simulator builds pr = c*(t_rx - t_tx_sv) from seconds-of-week
    # float64 times, whose representational granularity at t~3.5e5 s is
    # c*eps*t ~ 1.7 cm per observation — a ~2 cm noise floor, not a solver
    # error (RTKLIB splits time into int+frac for exactly this reason)
    assert err < 0.03, f"noise-free position error {err} m"
    assert abs(sol.clock_bias_s - bias) < 1e-10
    assert np.linalg.norm(sol.vel_ecef) < 0.01
    assert sol.pdop < 5.0


def test_pvt_with_noise(world):
    ephs, rcv, vis = world
    rng = np.random.default_rng(2)
    errs = []
    for trial in range(5):
        obs = [constellation.simulate_observation(ephs[prn], rcv, T_RX + trial,
                                                  rcv_clock_bias_s=1e-4)
               for prn, _, _ in vis[:8]]
        for o in obs:
            o.pseudorange_m += rng.normal(0, 2.0)     # 2 m UERE
            o.doppler_hz += rng.normal(0, 0.5)
        sol = solver.solve_pvt(obs, ephs, iono=None, apply_tropo=False)
        assert sol.valid
        errs.append(np.linalg.norm(sol.pos_ecef - rcv))
    assert np.mean(errs) < 15.0, errs


def test_pvt_moving_receiver_velocity(world):
    ephs, rcv, vis = world
    vel = np.array([12.0, -5.0, 3.0])
    obs = [constellation.simulate_observation(ephs[prn], rcv, T_RX,
                                              rcv_vel_ecef=vel)
           for prn, _, _ in vis[:8]]
    sol = solver.solve_pvt(obs, ephs, iono=None, apply_tropo=False)
    assert sol.valid
    assert np.linalg.norm(sol.vel_ecef - vel) < 0.05


def test_pvt_atmosphere_corrections_reduce_error(world):
    """With simulated iono+tropo on the ranges, enabling the models helps."""
    ephs, rcv, vis = world
    iono = IonoParams(alpha=(1.2e-8, 1.5e-8, -6.0e-8, -6.0e-8),
                      beta=(88064.0, 0.0, -196608.0, -65536.0), valid=True)
    lat, lon, hgt = geodesy.ecef_to_geodetic(rcv)
    obs = []
    for prn, az, el in vis[:8]:
        o = constellation.simulate_observation(ephs[prn], rcv, T_RX)
        d_iono = atmosphere.iono_delay_scaled(
            atmosphere.klobuchar_delay(iono.alpha, iono.beta, lat, lon, az, el,
                                       o.t_tx_sv), o.carrier_freq_hz)
        d_trop = atmosphere.saastamoinen_delay(el, hgt, lat)
        o.pseudorange_m += d_iono + d_trop
        obs.append(o)
    sol_off = solver.solve_pvt(obs, ephs, iono=None, apply_tropo=False)
    sol_on = solver.solve_pvt(obs, ephs, iono=iono, apply_tropo=True)
    e_off = np.linalg.norm(sol_off.pos_ecef - rcv)
    e_on = np.linalg.norm(sol_on.pos_ecef - rcv)
    assert sol_on.valid and sol_off.valid
    assert e_on < e_off
    assert e_on < 2.0, f"corrected error {e_on} m"


def test_pvt_insufficient_sats(world):
    ephs, rcv, vis = world
    obs = [constellation.simulate_observation(ephs[prn], rcv, T_RX)
           for prn, _, _ in vis[:3]]
    sol = solver.solve_pvt(obs, ephs)
    assert not sol.valid


def test_klobuchar_range():
    """Klobuchar delay must be positive, a few meters at L1, larger at low el."""
    alpha = (1.2e-8, 1.5e-8, -6.0e-8, -6.0e-8)
    beta = (88064.0, 0.0, -196608.0, -65536.0)
    d_hi = atmosphere.klobuchar_delay(alpha, beta, 0.7, 0.03, 1.0, np.deg2rad(80), 50400.0)
    d_lo = atmosphere.klobuchar_delay(alpha, beta, 0.7, 0.03, 1.0, np.deg2rad(10), 50400.0)
    assert 0 < d_hi * C.SPEED_OF_LIGHT_M_S < 30.0
    assert d_lo > d_hi


def test_saastamoinen_range():
    d_zenith = atmosphere.saastamoinen_delay(np.pi / 2, 0.0)
    d_low = atmosphere.saastamoinen_delay(np.deg2rad(10.0), 0.0)
    assert 2.0 < d_zenith < 3.0
    assert d_low > 3 * d_zenith


def test_pvt_multi_constellation_isb(world):
    """Mixed-system solve estimates one receiver clock per system
    (reference: rtklib pntpos NX=3+NSYS); an injected inter-system bias must
    land in the second system's clock state, not in the position."""
    ephs, rcv, vis = world
    bias_g = 1.0e-4
    isb = 120e-9          # 120 ns GGTO-like offset on the "E" half
    prns = [prn for prn, _, _ in vis[:8]]
    mixed_ephs = {}
    obs = []
    for k, prn in enumerate(prns):
        o = constellation.simulate_observation(ephs[prn], rcv, T_RX,
                                               rcv_clock_bias_s=bias_g)
        if k % 2 == 1:
            o.system = "E"
            o.pseudorange_m += isb * C.SPEED_OF_LIGHT_M_S
        mixed_ephs[(o.system, prn)] = ephs[prn]
        obs.append(o)
    sol = solver.solve_pvt(obs, mixed_ephs, iono=None, apply_tropo=False)
    assert sol.valid
    assert np.linalg.norm(sol.pos_ecef - rcv) < 0.02
    assert set(sol.system_clock_s) == {"E", "G"}
    assert abs(sol.system_clock_s["G"] - bias_g) < 1e-10
    assert abs(sol.system_clock_s["E"] - bias_g - isb) < 1e-10


def test_pvt_single_system_unchanged(world):
    """Legacy single-system calls (bare-prn ephemeris keys) still solve."""
    ephs, rcv, vis = world
    obs = [constellation.simulate_observation(ephs[prn], rcv, T_RX)
           for prn, _, _ in vis[:8]]
    sol = solver.solve_pvt(obs, ephs, iono=None, apply_tropo=False)
    assert sol.valid and np.linalg.norm(sol.pos_ecef - rcv) < 0.02
    assert list(sol.system_clock_s) == ["G"]


def test_dual_frequency_iono_free(world):
    """L1+L5 observations with a 1/f^2 iono delay: the iono-free
    combination must remove the bias without any broadcast iono model."""
    ephs, rcv, vis = world
    f1, f5 = 1_575_420_000.0, 1_176_450_000.0
    vtec_m_l1 = 4.0                      # vertical iono delay on L1 (m)
    obs = []
    for prn, az, el in vis[:8]:
        slant = vtec_m_l1 / max(np.sin(el), 0.2)   # obliquity: el-dependent
        o1 = constellation.simulate_observation(ephs[prn], rcv, T_RX,
                                                carrier_freq_hz=f1)
        o5 = constellation.simulate_observation(ephs[prn], rcv, T_RX,
                                                carrier_freq_hz=f5)
        o1.pseudorange_m += slant
        o5.pseudorange_m += slant * (f1 / f5) ** 2
        obs.extend([o1, o5])
    combined = solver.combine_iono_free(obs)
    n_sats = len({prn for prn, _, _ in vis[:8]})
    assert len(combined) == n_sats and all(o.iono_free for o in combined)
    sol = solver.solve_pvt(combined, ephs, iono=None, apply_tropo=False)
    assert sol.valid
    err = np.linalg.norm(sol.pos_ecef - rcv)
    assert err < 0.02, f"iono-free error {err:.3f} m"

    # single-frequency without a model keeps the bias (mostly in clock, but
    # geometry leaks several decimeters into position)
    sol1 = solver.solve_pvt([o for o in obs if o.carrier_freq_hz == f1],
                            ephs, iono=None, apply_tropo=False)
    err1 = np.linalg.norm(sol1.pos_ecef - rcv)
    assert err1 > err


def test_raim_excludes_faulty_satellite(world):
    """FDE (rtklib valsol role): a 60 m fault on one satellite must be
    detected by the chi-square test and excluded."""
    ephs, rcv, vis = world
    rng = np.random.default_rng(9)
    obs = []
    for prn, _, _ in vis[:8]:
        o = constellation.simulate_observation(ephs[prn], rcv, T_RX)
        o.pseudorange_m += rng.normal(0, 1.0)
        obs.append(o)
    bad_prn = obs[2].prn
    obs[2].pseudorange_m += 60.0                   # fault
    sol_plain = solver.solve_pvt(obs, ephs, iono=None, apply_tropo=False)
    sol_fde = solver.solve_pvt_fde(obs, ephs, sigma_pr_m=1.5,
                                   iono=None, apply_tropo=False)
    assert sol_fde.valid
    assert sol_fde.excluded_prn == ("G", bad_prn)
    err_plain = np.linalg.norm(sol_plain.pos_ecef - rcv)
    err_fde = np.linalg.norm(sol_fde.pos_ecef - rcv)
    assert err_fde < err_plain
    assert err_fde < 5.0, err_fde


def test_raim_passes_clean_set(world):
    ephs, rcv, vis = world
    obs = [constellation.simulate_observation(ephs[prn], rcv, T_RX)
           for prn, _, _ in vis[:8]]
    sol = solver.solve_pvt_fde(obs, ephs, iono=None, apply_tropo=False)
    assert sol.valid and sol.excluded_prn is None
    assert np.linalg.norm(sol.pos_ecef - rcv) < 0.05


def test_pvt_week_from_anchoring_ephemeris():
    """The fix week must come from the ephemeris that anchors tow_s, with
    half-week rollover correction (reference rtklib adjweek) — not from an
    arbitrary ephemeris in the store."""
    from gnss_sdr_tpu.utils import constellation
    from gnss_sdr_tpu.receiver.pvt import geodesy as geo

    ephs = constellation.almanac_constellation()
    rcv = geo.geodetic_to_ecef(np.deg2rad(41.275), np.deg2rad(1.9876), 80.0)
    t = 352800.0
    vis = constellation.visible_sats(ephs, rcv, t, el_mask_deg=10.0)
    prns = [p for p, _, _ in vis[:6]]
    keyed = {}
    for p in prns:
        e = ephs[p]
        e.week = 2140
        keyed[("G", p)] = e
    # a poisoned unrelated ephemeris that iteration order might surface
    import copy
    rogue = copy.deepcopy(ephs[prns[0]])
    rogue.week = 999
    keyed[("C", 63)] = rogue

    obs = []
    for p in prns:
        o = constellation.simulate_observation(keyed[("G", p)], rcv, t)
        obs.append(solver.ObsInput(prn=p, system="G", t_tx_sv=o.t_tx_sv,
                                   pseudorange_m=o.pseudorange_m,
                                   doppler_hz=0.0,
                                   carrier_freq_hz=1_575_420_000.0))
    sol = solver.solve_pvt(obs, keyed, apply_tropo=False)
    assert sol.valid
    assert sol.week == 2140

    # rollover: same geometry but tow near the week start with toe near the
    # end of the previous week -> week must advance by one
    for p in prns:
        keyed[("G", p)].toe = 604000.0
        keyed[("G", p)].toc = 604000.0
    t2 = 1200.0
    obs2 = []
    for p in prns:
        o = constellation.simulate_observation(keyed[("G", p)], rcv, t2)
        obs2.append(solver.ObsInput(prn=p, system="G", t_tx_sv=o.t_tx_sv,
                                    pseudorange_m=o.pseudorange_m,
                                    doppler_hz=0.0,
                                    carrier_freq_hz=1_575_420_000.0))
    sol2 = solver.solve_pvt(obs2, keyed, apply_tropo=False)
    assert sol2.valid
    assert sol2.week == 2141
