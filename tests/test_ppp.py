"""Static PPP filter tests (reference: rtklib_ppp pppos).

Truth from the Kepler oracle with SP3-style exact orbits: iono-free code +
phase with constant float ambiguities; the filter must converge to cm-level
statically and estimate the residual zenith tropo delay.
"""

import numpy as np
import pytest

from gnss_sdr_tpu import constants as C
from gnss_sdr_tpu.receiver.pvt import geodesy, ppp
from gnss_sdr_tpu.utils import constellation

TRUE_LLH = (np.deg2rad(41.275), np.deg2rad(1.9876), 80.0)
T0 = 353000.0
ZTD_TRUE = 0.18          # residual zenith wet delay (m)


def test_ppp_static_convergence():
    ephs = constellation.almanac_constellation()
    for e in ephs.values():
        e.tgd = 0.0
    rcv = geodesy.geodetic_to_ecef(*TRUE_LLH)
    vis = constellation.visible_sats(ephs, rcv, T0, el_mask_deg=10.0)
    prns = [p for p, _, _ in vis[:8]]
    rng = np.random.default_rng(5)
    amb = {p: rng.normal(0, 30.0) for p in prns}     # float IF ambiguities (m)

    filt = ppp.PppFilter({("G", p): ephs[p] for p in prns},
                         x0_ecef=rcv + np.array([30.0, -20.0, 50.0]))
    sol = None
    for k in range(480):
        t = T0 + 1.0 * k
        obs = []
        for p in prns:
            o = constellation.simulate_observation(ephs[p], rcv, t,
                                                   rcv_clock_bias_s=2.0e-4)
            az, el = geodesy.az_el(rcv, ephs[p].position_velocity(o.t_tx_sv)[0])
            trop = ZTD_TRUE * ppp.tropo_mapping(el)
            obs.append(ppp.PppObs(
                prn=p, system="G", t_tx_sv=o.t_tx_sv,
                pr_if_m=o.pseudorange_m + trop + rng.normal(0, 0.7),
                phase_if_m=o.pseudorange_m + trop + amb[p]
                + rng.normal(0, 0.005)))
        sol = filt.update(obs)
    assert sol.valid
    err = np.linalg.norm(sol.pos_ecef - rcv)
    # static float PPP after 8 minutes: decimeter-level is on track (real
    # PPP needs tens of minutes for few-cm; the filter mechanics are what
    # this asserts)
    assert err < 0.12, f"PPP static error {err*100:.1f} cm"
    assert abs(sol.ztd_m - ZTD_TRUE) < 0.03, sol.ztd_m
    assert abs(sol.clock_bias_m - 2.0e-4 * C.SPEED_OF_LIGHT_M_S) < 0.3


def test_ppp_needs_enough_sats():
    ephs = constellation.almanac_constellation()
    rcv = geodesy.geodetic_to_ecef(*TRUE_LLH)
    filt = ppp.PppFilter({("G", 1): ephs[1]}, x0_ecef=rcv)
    sol = filt.update([])
    assert not sol.valid
