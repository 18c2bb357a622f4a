"""rinex2assist utility: RINEX nav writer -> parser -> assistance roundtrip."""

import numpy as np

from gnss_sdr_tpu.receiver.pvt.rinex import RinexNavWriter
from gnss_sdr_tpu.utils import rinex2assist
from gnss_sdr_tpu.receiver import control

from test_lnav import sample_ephemeris


def test_rinex_nav_parse_roundtrip(tmp_path):
    eph = sample_ephemeris()
    p = tmp_path / "nav.rnx"
    w = RinexNavWriter(p)
    w.write_ephemeris(eph, "G")
    eph2 = sample_ephemeris()
    eph2.prn = 11
    eph2.m0 = -0.5
    w.write_ephemeris(eph2, "G")
    w.close()

    parsed = rinex2assist.parse_rinex_nav(p)
    assert set(parsed["G"]) == {7, 11}
    d = parsed["G"][7]
    assert abs(d.sqrt_a - eph.sqrt_a) < 1e-6
    assert abs(d.m0 - eph.m0) < 1e-9
    assert abs(d.omega_dot - eph.omega_dot) < 1e-15
    assert abs(d.af0 - eph.af0) < 1e-12
    assert d.iode == eph.iode

    # satellite positions from written/parsed ephemeris agree to the cm
    t = eph.toe + 1800.0
    p1, v1 = eph.position_velocity(t)
    p2, v2 = d.position_velocity(t)
    assert np.linalg.norm(p1 - p2) < 0.05


def test_rinex2assist_end_to_end(tmp_path):
    eph = sample_ephemeris()
    nav = tmp_path / "nav.rnx"
    w = RinexNavWriter(nav)
    w.write_ephemeris(eph, "G")
    w.close()
    out = tmp_path / "assist.json"
    n = rinex2assist.rinex2assist(nav, out, "G")
    assert n == 1
    ephs = control.load_assistance(out).ephemerides
    assert ("G", 7) in ephs
    assert abs(ephs[("G", 7)].sqrt_a - eph.sqrt_a) < 1e-6
