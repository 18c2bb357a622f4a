"""Round-trip tests for GPS CNAV, GLONASS GNAV, BeiDou D1 nav messages
+ the GLONASS PZ-90 orbit integrator."""

import numpy as np
import pytest

from gnss_sdr_tpu.models.nav import beidou_d1, fec, glonass_gnav, gps_cnav
from gnss_sdr_tpu.models.ephemeris import IonoParams

from test_lnav import sample_ephemeris


# ---------------------------------------------------------------- GPS CNAV

def test_cnav_message_roundtrip():
    eph = sample_ephemeris()
    eph.toe = 352800.0  # multiple of 300
    eph.toc = 352800.0
    iono = IonoParams(alpha=(1.2e-8, 1.5e-8, -6.0e-8, -6.0e-8),
                      beta=(88064.0, 0.0, -196608.0, -65536.0), valid=True)
    asm = gps_cnav.CnavAssembler(7)
    for mt in (10, 11, 30):
        m = gps_cnav.encode_message(mt, 7, 352806.0, eph, iono)
        res = gps_cnav.decode_message(m)
        assert res is not None
        mtype, prn, tow, fields = res
        assert mtype == mt and prn == 7 and tow == 352806.0
        asm.push(mtype, fields)
    dec = asm.ephemeris()
    assert dec is not None
    assert abs(dec.sqrt_a - eph.sqrt_a) < 1e-5
    assert abs(dec.m0 - eph.m0) <= 2.0 ** -32 * np.pi
    assert abs(dec.omega_dot - eph.omega_dot) <= 2.0 ** -44 * np.pi
    assert abs(dec.af0 - eph.af0) <= 2.0 ** -35
    assert abs(dec.tgd - eph.tgd) <= 2.0 ** -35
    assert asm.iono.valid
    np.testing.assert_allclose(asm.iono.alpha, iono.alpha, atol=2.0 ** -24)


def test_cnav_crc_rejects_corruption():
    eph = sample_ephemeris()
    eph.toe = eph.toc = 352800.0
    m = gps_cnav.encode_message(10, 7, 352806.0, eph)
    bad = m.copy()
    bad[150] ^= 1
    assert gps_cnav.decode_message(bad) is None


def test_cnav_symbol_stream_decodes_through_fec():
    eph = sample_ephemeris()
    eph.toe = eph.toc = 352800.0
    sym = gps_cnav.encode_symbol_stream(eph, 352800.0, 3)
    soft = sym.astype(np.float64) * 2.0 - 1.0
    bits = fec.viterbi_decode(soft, 900)
    for k in range(3):
        res = gps_cnav.decode_message(bits[k * 300:(k + 1) * 300])
        assert res is not None, f"message {k}"


# ------------------------------------------------------------ GLONASS GNAV

def glonass_sample_eph():
    return glonass_gnav.GlonassEphemeris(
        slot=5, freq_slot=1, tb_s=11700.0,
        pos_m=(10521358.3, 15037252.1, 17452812.9),
        vel_m_s=(-1324.25, 2145.73, -1054.12),
        acc_m_s2=(1.86e-6, -0.93e-6, 2.79e-6),
        gamma_n=6.4e-10, tau_n=-8.3e-5, health=0)


def test_gnav_string_roundtrip():
    eph = glonass_sample_eph()
    asm = glonass_gnav.GnavAssembler()
    for sid in (1, 2, 3, 4):
        s = glonass_gnav.encode_string(sid, eph)
        assert glonass_gnav.hamming_check(s)
        res = glonass_gnav.decode_string(s)
        assert res is not None and res[0] == sid
        asm.push(*res)
    dec = asm.ephemeris()
    assert dec is not None
    np.testing.assert_allclose(dec.pos_m, eph.pos_m, atol=0.5)
    np.testing.assert_allclose(dec.vel_m_s, eph.vel_m_s, atol=1e-3)
    assert abs(dec.tau_n - eph.tau_n) <= 2.0 ** -30
    assert abs(dec.gamma_n - eph.gamma_n) <= 2.0 ** -40
    assert dec.slot == 5 and dec.tb_s == 11700.0


def test_gnav_hamming_rejects_errors():
    s = glonass_gnav.encode_string(1, glonass_sample_eph())
    bad = s.copy()
    bad[40] ^= 1
    assert glonass_gnav.decode_string(bad) is None


def test_glonass_orbit_integration():
    """RK4 propagation must preserve orbit energy and be time-reversible."""
    eph = glonass_sample_eph()
    r0 = np.linalg.norm(eph.pos_m)
    p, v = eph.position_velocity(eph.tb_s + 900.0)
    assert 24.0e6 < np.linalg.norm(p) < 26.5e6
    # propagate back
    eph2 = glonass_gnav.GlonassEphemeris(
        tb_s=eph.tb_s + 900.0, pos_m=tuple(p), vel_m_s=tuple(v),
        acc_m_s2=eph.acc_m_s2)
    p0, v0 = eph2.position_velocity(eph.tb_s)
    np.testing.assert_allclose(p0, eph.pos_m, atol=0.02)
    np.testing.assert_allclose(v0, eph.vel_m_s, atol=1e-5)


def test_gnav_symbol_stream():
    eph = glonass_sample_eph()
    sym = glonass_gnav.encode_symbol_stream(eph, n_frames=1)
    assert len(sym) == 4 * 200
    # strip meander of first string and decode
    s0 = sym[:170]
    bits = s0[0::2]
    assert np.array_equal(s0[1::2], bits ^ 1)   # meander property
    res = glonass_gnav.decode_string(bits)
    assert res is not None and res[0] == 1
    np.testing.assert_array_equal(sym[170:200], glonass_gnav.TIME_MARK)


# -------------------------------------------------------------- BeiDou D1

def test_bch15_codec():
    rng = np.random.default_rng(0)
    for _ in range(20):
        info = rng.integers(0, 2, 11).astype(np.uint8)
        cw = beidou_d1._bch15_encode(info)
        assert beidou_d1._bch15_check(cw)
        bad = cw.copy()
        bad[int(rng.integers(0, 15))] ^= 1
        assert not beidou_d1._bch15_check(bad)


def test_d1_subframe_roundtrip():
    eph = sample_ephemeris()
    eph.toe = 352800.0  # multiple of 8
    eph.toc = 352800.0  # multiple of 8
    iono = IonoParams(alpha=(1.2e-8, 1.5e-8, -6.0e-8, -6.0e-8),
                      beta=(88064.0, 0.0, -196608.0, -65536.0), valid=True)
    asm = beidou_d1.D1Assembler(13)
    for fraid in (1, 2, 3):
        tx = beidou_d1.encode_subframe(fraid, 352800.0 + fraid * 6, eph, iono)
        assert tx.shape == (300,)
        res = beidou_d1.decode_subframe(tx)
        assert res is not None
        fid, sow, fields = res
        assert fid == fraid
        assert sow == 352800.0 + fraid * 6
        asm.push(fid, fields)
    dec = asm.ephemeris()
    assert dec is not None
    assert abs(dec.sqrt_a - eph.sqrt_a) <= 2.0 ** -19
    assert dec.toe == eph.toe
    assert dec.toc == eph.toc
    assert abs(dec.m0 - eph.m0) <= 2.0 ** -31 * np.pi
    assert abs(dec.af0 - eph.af0) <= 2.0 ** -33
    assert abs(dec.tgd - eph.tgd) <= 0.1e-9
    assert asm.iono.valid
    assert dec.gm == pytest.approx(3.986004418e14)


def test_d1_bch_rejects_corruption():
    eph = sample_ephemeris()
    eph.toe = eph.toc = 352800.0
    tx = beidou_d1.encode_subframe(2, 352800.0, eph)
    bad = tx.copy()
    bad[45] ^= 1
    assert beidou_d1.decode_subframe(bad) is None


# ---------------------------------------------------------------------------
# Galileo E5a F/NAV
# ---------------------------------------------------------------------------


def test_fnav_page_roundtrip():
    from gnss_sdr_tpu.models.nav import galileo_fnav
    eph = sample_ephemeris()
    eph.toe = 352800.0
    eph.toc = 352740.0
    got = {}
    for ptype in (1, 2, 3, 4):
        nav = galileo_fnav.encode_page_bits(ptype, eph, wn=eph.week,
                                            tow=352800.0 + 10.0 * ptype)
        sym01 = galileo_fnav.encode_page(nav)
        assert len(sym01) == 500
        soft = -(1.0 - 2.0 * sym01.astype(np.float64))   # +amp == bit1
        res = galileo_fnav.decode_page(soft)
        assert res is not None, f"page type {ptype} failed"
        pt, fields = res
        assert pt == ptype
        got[pt] = fields
    assert got[1]["toc"] == eph.toc
    assert abs(got[1]["af0"] - eph.af0) <= 2.0 ** -34
    assert abs(got[2]["sqrt_a"] - eph.sqrt_a) <= 2.0 ** -19
    assert got[3]["toe"] == eph.toe
    assert abs(got[4]["cic"] - eph.cic) <= 2.0 ** -29
    assert got[2]["tow"] == 352820.0


def test_fnav_crc_rejects_corruption():
    from gnss_sdr_tpu.models.nav import galileo_fnav
    eph = sample_ephemeris()
    sym01 = galileo_fnav.encode_page(
        galileo_fnav.encode_page_bits(2, eph, tow=100.0))
    soft = -(1.0 - 2.0 * sym01.astype(np.float64))
    soft[100] = -soft[100]   # flip one symbol -> viterbi may correct it
    soft[101] = -soft[101]
    soft[140] = -soft[140]
    soft[260] = -soft[260]
    soft[261] = -soft[261]
    soft[262] = -soft[262]
    soft[300] = -soft[300]
    soft[301] = -soft[301]
    # enough paired flips to exceed the free distance -> CRC must catch it
    res = galileo_fnav.decode_page(soft)
    assert res is None or res[0] == 2   # never a wrong accepted page type


def test_fnav_assembler_builds_ephemeris():
    from gnss_sdr_tpu.models.nav import galileo_fnav
    from gnss_sdr_tpu import constants
    eph = sample_ephemeris()
    eph.toe = 352800.0
    asm = galileo_fnav.FnavAssembler(prn=eph.prn)
    assert asm.ephemeris() is None
    for ptype in (1, 2, 3, 4):
        nav = galileo_fnav.encode_page_bits(ptype, eph, wn=eph.week, tow=0.0)
        pt, fields = galileo_fnav.decode_page_bits(nav)
        asm.push(pt, fields)
    dec = asm.ephemeris()
    assert dec is not None
    assert dec.gm == constants.GM_EARTH_GAL
    assert abs(dec.m0 - eph.m0) < 3.2e-9
    assert abs(dec.cic - eph.cic) <= 2.0 ** -29
    assert dec.week == eph.week


# ---------------------------------------------------------------------------
# BeiDou D2 (GEO)
# ---------------------------------------------------------------------------


def test_d2_page_roundtrip():
    from gnss_sdr_tpu.models.nav import beidou_d2
    from gnss_sdr_tpu.models.ephemeris import IonoParams
    eph = sample_ephemeris()
    eph.toe = eph.toc = 352800.0
    iono = IonoParams(alpha=(1.2e-8, 1.5e-8, -6.0e-8, -6.0e-8),
                      beta=(88064.0, 0.0, -196608.0, -65536.0), valid=True)
    asm = beidou_d2.D2Assembler(prn=3)
    for pnum in range(1, 11):
        # SOW carries the 6 s cycle start (integer), shared by all pages
        tx = beidou_d2.encode_page(pnum, 352800.0, eph, iono)
        res = beidou_d2.decode_page(tx)
        assert res is not None, pnum
        pn, sow, fields = res
        assert pn == pnum
        assert sow == 352800.0
        asm.push(pn, fields)
    dec = asm.ephemeris()
    assert dec is not None
    assert abs(dec.sqrt_a - eph.sqrt_a) <= 2.0 ** -19
    assert dec.toe == eph.toe
    assert abs(dec.m0 - eph.m0) <= 2.0 ** -31 * np.pi
    assert abs(dec.af0 - eph.af0) <= 2.0 ** -33
    assert abs(asm.iono.alpha[0] - 1.2e-8) <= 2.0 ** -30
    # BCH must reject corruption
    tx = beidou_d2.encode_page(4, 352800.0, eph)
    bad = tx.copy()
    bad[40] ^= 1
    bad[41] ^= 1
    assert beidou_d2.decode_page(bad) is None


def test_cnav_mt33_utc_roundtrip():
    """MT33 (clock & UTC) encode/decode with the GPS_CNAV.h field layout;
    the assembler exposes a valid UtcParams after one message."""
    from gnss_sdr_tpu.models.ephemeris import UtcParams

    eph = sample_ephemeris()
    utc = UtcParams(a0=-2.79396772385e-09, a1=-7.105427357601e-15,
                    a2=1.0842021e-19, tot=405504.0, wnt=2185,
                    delta_t_ls=18, wn_lsf=2185, dn=7, delta_t_lsf=18,
                    valid=True)
    m = gps_cnav.encode_message(33, eph.prn, 345612.0, eph, utc=utc)
    got = gps_cnav.decode_message(m)
    assert got is not None
    mtype, prn, tow, f = got
    assert mtype == 33 and prn == eph.prn and tow == 345612.0
    assert abs(f["utc_a0"] - utc.a0) < 2.0 ** -35
    assert abs(f["utc_a1"] - utc.a1) < 2.0 ** -51
    assert abs(f["utc_a2"] - utc.a2) < 2.0 ** -68
    assert f["delta_t_ls"] == 18 and f["delta_t_lsf"] == 18
    assert f["utc_tot"] == utc.tot and f["utc_wnt"] == 2185
    assert f["wn_lsf"] == 2185 and f["dn"] == 7
    assert abs(f["af0"] - eph.af0) < 2.0 ** -34

    asm = gps_cnav.CnavAssembler(eph.prn)
    asm.push(mtype, f)
    assert asm.utc.valid
    assert abs(asm.utc.a0 - utc.a0) < 2.0 ** -35
    assert asm.utc.dn == 7


def test_cnav_mt32_eop_roundtrip():
    """MT32 (clock & Earth orientation) encode/decode per the IS-GPS-200
    Fig 30-9 layout; the assembler exposes a valid EopParams."""
    eph = sample_ephemeris()
    eop = gps_cnav.EopParams(
        t_eop=302400.0, pm_x=0.1021, pm_x_dot=-0.0023,
        pm_y=0.3817, pm_y_dot=0.0011, dut1=-0.0172455,
        dut1_dot=-6.4e-4, valid=True)
    m = gps_cnav.encode_message(32, eph.prn, 345612.0, eph, eop=eop)
    got = gps_cnav.decode_message(m)
    assert got is not None
    mtype, prn, tow, f = got
    assert mtype == 32 and prn == eph.prn and tow == 345612.0
    assert f["t_eop"] == eop.t_eop
    assert abs(f["pm_x"] - eop.pm_x) < 2.0 ** -20
    assert abs(f["pm_x_dot"] - eop.pm_x_dot) < 2.0 ** -21
    assert abs(f["pm_y"] - eop.pm_y) < 2.0 ** -20
    assert abs(f["pm_y_dot"] - eop.pm_y_dot) < 2.0 ** -21
    assert abs(f["dut1"] - eop.dut1) < 2.0 ** -24
    assert abs(f["dut1_dot"] - eop.dut1_dot) < 2.0 ** -25
    assert abs(f["af0"] - eph.af0) < 2.0 ** -34

    asm = gps_cnav.CnavAssembler(eph.prn)
    asm.push(mtype, f)
    assert asm.eop.valid
    assert abs(asm.eop.dut1 - eop.dut1) < 2.0 ** -24

    # the stream cycle interleaves MT32 when EOP is supplied
    sym = gps_cnav.encode_symbol_stream(eph, 345600.0, 5, eop=eop)
    assert sym.size > 0


def test_gnav_string5_utc_roundtrip():
    """GNAV string 5 (tau_c / N_4 / tau_GPS / day) with the reference's
    GLONASS_L1_L2_CA.h STRING 5 bit positions."""
    eph = glonass_gnav.GlonassEphemeris(slot=5, tb_s=11700.0)
    utc = glonass_gnav.GlonassUtc(tau_c=-9.3132257462e-09,
                                  tau_gps=1.3969838619e-08,
                                  n4=7, day_na=851, l_n=0, valid=True)
    bits = glonass_gnav.encode_string(5, eph, utc=utc)
    got = glonass_gnav.decode_string(bits)
    assert got is not None
    sid, f = got
    assert sid == 5
    assert abs(f["tau_c"] - utc.tau_c) < 2.0 ** -31
    assert abs(f["tau_gps"] - utc.tau_gps) < 2.0 ** -30
    assert f["n4"] == 7 and f["day_na"] == 851 and f["l_n"] == 0

    asm = glonass_gnav.GnavAssembler(slot=5)
    asm.push(sid, f)
    assert asm.utc_glo.valid
    assert abs(asm.utc_glo.tau_c - utc.tau_c) < 2.0 ** -31


def test_gnav_frame_stream_carries_string5():
    """encode_frame_stream(utc=...) emits a decodable string 5 in-frame."""
    eph = glonass_gnav.GlonassEphemeris(slot=3, tb_s=11700.0)
    utc = glonass_gnav.GlonassUtc(tau_c=5e-9, tau_gps=-2e-9, n4=6,
                                  day_na=100, valid=True)
    sym = glonass_gnav.encode_frame_stream(eph, tk0_s=11700.0, n_frames=1,
                                           utc=utc)
    # string 5 occupies the 5th string slot: 200 symbols per string
    s5 = sym[4 * 200: 4 * 200 + 170]
    bits = s5[0::2]                     # un-meander
    got = glonass_gnav.decode_string(bits)
    assert got is not None and got[0] == 5
    assert abs(got[1]["tau_c"] - 5e-9) < 2.0 ** -31
