"""GPS LNAV encoder/decoder round-trip and parity tests."""

import numpy as np
import pytest

from gnss_sdr_tpu.models.ephemeris import IonoParams, KeplerEphemeris, UtcParams
from gnss_sdr_tpu.models.nav import gps_lnav


def sample_ephemeris() -> KeplerEphemeris:
    """Plausible GPS ephemeris (values near a real MEO orbit)."""
    return KeplerEphemeris(
        prn=7, week=245, toc=352800.0, af0=2.3e-4, af1=-1.1e-11, af2=0.0,
        tgd=-4.6566e-9, toe=352800.0, sqrt_a=5153.72, e=0.0112,
        m0=1.2345, delta_n=4.5e-9, omega0=-2.1, omega_dot=-8.1e-9,
        omega=0.77, i0=0.96, idot=3.2e-10,
        cuc=1.2e-6, cus=7.3e-6, crc=221.4, crs=-45.2,
        cic=-6.5e-8, cis=8.4e-8, iode=33, iodc=33, health=0, ura=1)


def test_word_parity_roundtrip():
    rng = np.random.default_rng(0)
    d29s, d30s = 0, 0
    for _ in range(50):
        src = rng.integers(0, 2, 24).astype(np.uint8)
        tx = gps_lnav.encode_word(src, d29s, d30s)
        ok, dec = gps_lnav.check_and_decode_word(tx, d29s, d30s)
        assert ok and np.array_equal(dec, src)
        # corrupt one bit -> parity must fail
        bad = tx.copy()
        bad[int(rng.integers(0, 30))] ^= 1
        ok_bad, _ = gps_lnav.check_and_decode_word(bad, d29s, d30s)
        assert not ok_bad
        d29s, d30s = int(tx[28]), int(tx[29])


def test_solved_tail_words_end_zero():
    eph = sample_ephemeris()
    sf = gps_lnav.encode_subframe(1, 352800.0, eph)
    # words 2 and 10 end with D29=D30=0 so the next word starts clean
    assert sf[58] == 0 and sf[59] == 0
    assert sf[298] == 0 and sf[299] == 0


@pytest.mark.parametrize("sfid", [1, 2, 3])
def test_subframe_roundtrip(sfid):
    eph = sample_ephemeris()
    tow = 352806.0
    tx = gps_lnav.encode_subframe(sfid, tow, eph)
    assert tx.shape == (300,)
    sf = gps_lnav.decode_subframe(tx)
    assert sf is not None
    assert sf.sfid == sfid
    assert sf.tow_s == tow


def test_frame_assembles_ephemeris():
    eph = sample_ephemeris()
    iono = IonoParams(alpha=(1.2e-8, 1.5e-8, -6.0e-8, -6.0e-8),
                      beta=(88064.0, 0.0, -196608.0, -65536.0), valid=True)
    utc = UtcParams(a0=4.65e-9, a1=1.77e-15, tot=405504.0, wnt=245 % 256,
                    delta_t_ls=18, valid=True)
    bits = gps_lnav.encode_frames(eph, 352800.0, 5, iono, utc)
    asm = gps_lnav.LnavAssembler(7)
    for k in range(5):
        sf = gps_lnav.decode_subframe(bits[k * 300:(k + 1) * 300])
        assert sf is not None, f"subframe {k} failed"
        asm.push(sf)
    dec = asm.ephemeris()
    assert dec is not None
    # all fields reproduced to within LNAV quantization
    assert dec.week == eph.week % 1024
    assert dec.iode == eph.iode and dec.iodc == eph.iodc
    assert dec.toe == eph.toe and dec.toc == eph.toc
    assert abs(dec.sqrt_a - eph.sqrt_a) <= 2.0 ** -19
    assert abs(dec.e - eph.e) <= 2.0 ** -33
    assert abs(dec.m0 - eph.m0) <= 2.0 ** -31 * np.pi
    assert abs(dec.omega0 - eph.omega0) <= 2.0 ** -31 * np.pi
    assert abs(dec.omega - eph.omega) <= 2.0 ** -31 * np.pi
    assert abs(dec.i0 - eph.i0) <= 2.0 ** -31 * np.pi
    assert abs(dec.delta_n - eph.delta_n) <= 2.0 ** -43 * np.pi
    assert abs(dec.omega_dot - eph.omega_dot) <= 2.0 ** -43 * np.pi
    assert abs(dec.idot - eph.idot) <= 2.0 ** -43 * np.pi
    assert abs(dec.af0 - eph.af0) <= 2.0 ** -31
    assert abs(dec.af1 - eph.af1) <= 2.0 ** -43
    assert abs(dec.tgd - eph.tgd) <= 2.0 ** -31
    assert abs(dec.cuc - eph.cuc) <= 2.0 ** -29
    assert abs(dec.cus - eph.cus) <= 2.0 ** -29
    assert abs(dec.crc - eph.crc) <= 2.0 ** -5
    assert abs(dec.crs - eph.crs) <= 2.0 ** -5
    # iono/utc from subframe 4 page 18
    assert asm.iono.valid
    np.testing.assert_allclose(asm.iono.alpha, iono.alpha, atol=2.0 ** -24)
    np.testing.assert_allclose(asm.iono.beta, iono.beta, atol=2.0 ** 16)
    assert asm.utc.valid
    assert abs(asm.utc.a0 - utc.a0) <= 2.0 ** -30
    assert asm.utc.delta_t_ls == 18


def test_inverted_polarity_rejected_by_preamble():
    eph = sample_ephemeris()
    tx = gps_lnav.encode_subframe(2, 352806.0, eph)
    assert gps_lnav.decode_subframe(1 - tx) is None
