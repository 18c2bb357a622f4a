"""Real-data PVT oracle: the reference's own rtklib_solver fixtures.

``rtklib_solver_test.cc:519`` loads ``src/tests/data/rtklib_test/
{eph_GPS_L1CA_test1.xml, obs_test1.xml}`` (one epoch, 10 GPS L1 C/A
pseudoranges produced by gnss-sim — data this repo's builder did NOT
generate), solves a single-point fix with iono/tropo OFF and elevation
mask 0, and asserts < 0.2 m 3D ECEF error against the known reference
position (30.286502 N, 120.032669 E, 100 m).  This test applies the same
oracle to this package's ``solve_pvt`` — validating the entire
observables->PVT back end against external data.
"""

import os

import numpy as np
import pytest

from gnss_sdr_tpu.io import ref_xml
from gnss_sdr_tpu.receiver.pvt import geodesy, solver

REF_DIR = "/root/reference/src/tests/data/rtklib_test"
TRUTH_LLH = (30.286502, 120.032669, 100.0)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference fixtures not present")


def _load():
    eph = ref_xml.load_gps_ephemeris_xml(
        os.path.join(REF_DIR, "eph_GPS_L1CA_test1.xml"))
    synchros = ref_xml.load_gnss_synchro_map_xml(
        os.path.join(REF_DIR, "obs_test1.xml"))
    return eph, synchros


def test_fixture_parse():
    eph, synchros = _load()
    assert len(eph) == 11
    assert len(synchros) == 10
    assert all(s.system == "G" and s.signal == "1C" for s in synchros)
    assert all(s.valid_pseudorange for s in synchros)
    # all observations share one receiver epoch tag
    assert len({s.rx_time_s for s in synchros}) == 1
    e1 = eph[("G", 1)]
    assert e1.week == 799 and abs(e1.toe - 518400.0) < 1e-9


def test_reference_oracle_point_solution():
    """Match rtklib_solver_test.cc:519: 3D ECEF error < 0.2 m."""
    eph, synchros = _load()
    obs = ref_xml.synchro_to_obs_inputs(synchros)
    assert len(obs) == 10
    sol = solver.solve_pvt(obs, eph, iono=None, apply_tropo=False,
                           el_mask_rad=0.0)
    assert sol.valid
    truth = geodesy.geodetic_to_ecef(
        np.deg2rad(TRUTH_LLH[0]), np.deg2rad(TRUTH_LLH[1]), TRUTH_LLH[2])
    err = np.linalg.norm(sol.pos_ecef - truth)
    assert err < 0.2, f"3D error {err:.3f} m vs reference budget 0.2 m"
    # the epoch's receiver time matches the fixture's RX_time tag
    assert abs((sol.tow_s + sol.clock_bias_s) - synchros[0].rx_time_s) < 1e-3


def test_reference_oracle_raim_robustness():
    """FDE rejects a faulted pseudorange on the real-data epoch."""
    eph, synchros = _load()
    obs = ref_xml.synchro_to_obs_inputs(synchros)
    # corrupt one satellite by 300 m; FDE must exclude it and still meet
    # a (looser) budget on external data
    import dataclasses
    obs[3] = dataclasses.replace(
        obs[3], pseudorange_m=obs[3].pseudorange_m + 300.0)
    sol = solver.solve_pvt_fde(obs, eph, iono=None, apply_tropo=False,
                               el_mask_rad=0.0)
    assert sol.valid
    assert sol.excluded_prn == ("G", obs[3].prn)
    truth = geodesy.geodetic_to_ecef(
        np.deg2rad(TRUTH_LLH[0]), np.deg2rad(TRUTH_LLH[1]), TRUTH_LLH[2])
    assert np.linalg.norm(sol.pos_ecef - truth) < 0.5
