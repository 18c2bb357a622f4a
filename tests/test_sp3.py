"""SP3 precise ephemeris tests (reference: rtklib_preceph readsp3/peph2pos).

Truth from the Kepler oracle: sample SV positions at 5-minute epochs, write/
read SP3, and require the interpolation to reproduce the continuous orbit at
mm..cm level; then solve a position with SP3-only ephemerides.
"""

import numpy as np
import pytest

from gnss_sdr_tpu.receiver.pvt import geodesy, solver, sp3
from gnss_sdr_tpu.utils import constellation

TRUE_LLH = (np.deg2rad(41.275), np.deg2rad(1.9876), 80.0)
T_RX = 354000.0
WEEK = 245


@pytest.fixture(scope="module")
def sp3_world(tmp_path_factory):
    ephs = constellation.almanac_constellation()
    rcv = geodesy.geodetic_to_ecef(*TRUE_LLH)
    vis = constellation.visible_sats(ephs, rcv, T_RX, el_mask_deg=10.0)
    prns = [p for p, _, _ in vis[:8]]
    # 2 hours of 5-minute epochs around T_RX
    tows = T_RX + 300.0 * np.arange(-12, 13)
    epochs = []
    for tow in tows:
        sats = {}
        for p in prns:
            pos, _ = ephs[p].position_velocity(tow)
            # a precise clock product is referenced to the observed signal:
            # equivalent to the broadcast clock minus TGD for L1 (the solver
            # applies no TGD to providers that don't carry one)
            sats[("G", p)] = (pos, ephs[p].clock_offset(tow) - ephs[p].tgd)
        epochs.append((float(tow), sats))
    path = tmp_path_factory.mktemp("sp3") / "orbit.sp3"
    sp3.write_sp3(path, epochs, WEEK)
    return ephs, rcv, prns, sp3.read_sp3(path)


def test_sp3_roundtrip_and_interpolation(sp3_world):
    ephs, rcv, prns, pre = sp3_world
    assert set(pre) == {("G", p) for p in prns}
    # interpolate off-epoch and compare against the continuous Kepler orbit
    for p in prns[:4]:
        for dt in (37.0, 151.0, 299.0, -211.0):
            t = T_RX + dt
            pos_i, vel_i = pre[("G", p)].position_velocity(t)
            pos_t, vel_t = ephs[p].position_velocity(t)
            assert np.linalg.norm(pos_i - pos_t) < 0.02, (p, dt)
            assert np.linalg.norm(vel_i - vel_t) < 0.002
            dclk = (pre[("G", p)].clock_offset(t)
                    - (ephs[p].clock_offset(t) - ephs[p].tgd))
            assert abs(dclk) < 2e-10


def test_pvt_with_precise_ephemerides(sp3_world):
    """solve_pvt consumes the SP3 provider through the same protocol as
    broadcast ephemerides (rtklib peph2pos role)."""
    ephs, rcv, prns, pre = sp3_world
    obs = [constellation.simulate_observation(ephs[p], rcv, T_RX,
                                              rcv_clock_bias_s=1e-4)
           for p in prns]
    sol = solver.solve_pvt(obs, pre, iono=None, apply_tropo=False)
    assert sol.valid
    err = np.linalg.norm(sol.pos_ecef - rcv)
    assert err < 0.05, f"precise-orbit position error {err:.3f} m"
