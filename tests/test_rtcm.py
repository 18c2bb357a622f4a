"""RTCM 3.x codec + server tests (reference analog: rtcm_test.cc)."""

import socket

import numpy as np
import pytest

from gnss_sdr_tpu.receiver.pvt import rtcm

from test_lnav import sample_ephemeris


def test_frame_roundtrip_and_crc():
    bits = rtcm.encode_1005(1234, np.array([4797671.3, 166498.8, 4185477.1]))
    data = rtcm.frame(bits)
    assert data[0] == 0xD3
    payloads = rtcm.deframe(b"\x00garbage" + data + b"trail")
    assert len(payloads) == 1
    assert rtcm.message_number(payloads[0]) == 1005
    # corrupt one byte -> CRC must reject
    bad = bytearray(data)
    bad[7] ^= 0x40
    assert rtcm.deframe(bytes(bad)) == []


def test_1005_roundtrip():
    ecef = np.array([4797671.2969, 166498.7981, 4185477.0519])
    d = rtcm.decode_1005(rtcm.encode_1005(42, ecef))
    assert d["station_id"] == 42
    np.testing.assert_allclose(d["ecef"], ecef, atol=1e-4)
    assert d["gps"] and d["gal"]


def test_1019_gps_ephemeris_roundtrip():
    eph = sample_ephemeris()
    dec = rtcm.decode_1019(rtcm.encode_1019(eph))
    assert dec.prn == eph.prn
    assert dec.iode == eph.iode
    assert dec.toe == eph.toe           # 16 s quantization, toe multiple
    assert abs(dec.sqrt_a - eph.sqrt_a) <= 2.0 ** -19
    assert abs(dec.e - eph.e) <= 2.0 ** -33
    assert abs(dec.m0 - eph.m0) <= 2.0 ** -31 * np.pi
    assert abs(dec.af0 - eph.af0) <= 2.0 ** -31
    assert abs(dec.omega_dot - eph.omega_dot) <= 2.0 ** -43 * np.pi
    assert abs(dec.crs - eph.crs) <= 2.0 ** -5
    assert abs(dec.tgd - eph.tgd) <= 2.0 ** -31


def test_1045_galileo_ephemeris_roundtrip():
    from gnss_sdr_tpu import constants
    eph = sample_ephemeris()
    eph.toc = 352800.0          # 60 s multiples for Galileo scaling
    eph.toe = 352800.0
    dec = rtcm.decode_1045(rtcm.encode_1045(eph))
    assert dec.prn == eph.prn and dec.toe == eph.toe
    assert abs(dec.af0 - eph.af0) <= 2.0 ** -34
    assert abs(dec.af1 - eph.af1) <= 2.0 ** -46
    assert abs(dec.i0 - eph.i0) <= 2.0 ** -31 * np.pi
    assert dec.gm == constants.GM_EARTH_GAL


def test_msm7_roundtrip():
    obs = [
        rtcm.MsmObservation(prn=7, signal_id=2, pseudorange_m=21_936_123.456,
                            phase_range_m=21_936_124.789,
                            phase_rate_m_s=534.2345, cn0_dbhz=44.5,
                            lock_time_s=12.0),
        rtcm.MsmObservation(prn=13, signal_id=2, pseudorange_m=23_101_987.12,
                            phase_range_m=23_101_986.9,
                            phase_rate_m_s=-712.0012, cn0_dbhz=39.25),
        rtcm.MsmObservation(prn=13, signal_id=15, pseudorange_m=23_101_989.0,
                            phase_range_m=23_101_988.5,
                            phase_rate_m_s=-712.0, cn0_dbhz=41.0),
    ]
    bits = rtcm.encode_msm7(rtcm.MSM7_GPS, 99, 345_600_123, obs)
    hdr, dec = rtcm.decode_msm7(bits)
    assert hdr["msg"] == rtcm.MSM7_GPS and hdr["station_id"] == 99
    assert hdr["epoch_ms"] == 345_600_123
    assert len(dec) == 3
    by_key = {(o.prn, o.signal_id): o for o in dec}
    for o in obs:
        d = by_key[(o.prn, o.signal_id)]
        # MSM7 fine pseudorange resolution: 2^-29 ms ~ 0.6 mm
        assert abs(d.pseudorange_m - o.pseudorange_m) < 0.01
        assert abs(d.phase_range_m - o.phase_range_m) < 0.001
        assert abs(d.phase_rate_m_s - o.phase_rate_m_s) < 0.001
        assert abs(d.cn0_dbhz - o.cn0_dbhz) <= 2.0 ** -4


def test_rtcm_tcp_server_broadcast():
    srv = rtcm.RtcmServer()
    try:
        cli = socket.create_connection(("127.0.0.1", srv.port), timeout=2.0)
        import time
        time.sleep(0.3)          # let the accept loop register the client
        bits = rtcm.encode_1005(7, np.array([1.0e6, 2.0e6, 3.0e6]))
        srv.send(bits)
        cli.settimeout(2.0)
        data = cli.recv(4096)
        payloads = rtcm.deframe(data)
        assert len(payloads) == 1
        assert rtcm.message_number(payloads[0]) == 1005
        cli.close()
    finally:
        srv.close()


def _sample_msm_obs():
    return [
        rtcm.MsmObservation(prn=7, signal_id=2, pseudorange_m=21_936_123.45,
                            phase_range_m=21_936_124.12, phase_rate_m_s=531.25,
                            cn0_dbhz=44.0, lock_time_s=120.0),
        rtcm.MsmObservation(prn=7, signal_id=15, pseudorange_m=21_936_125.01,
                            phase_range_m=21_936_124.88, phase_rate_m_s=531.10,
                            cn0_dbhz=39.0, lock_time_s=15.0),
        rtcm.MsmObservation(prn=23, signal_id=2, pseudorange_m=24_112_874.2,
                            phase_range_m=24_112_873.9, phase_rate_m_s=-712.4,
                            cn0_dbhz=47.5, lock_time_s=3.0),
    ]


@pytest.mark.parametrize("msg,pr_tol,ph_tol", [
    (rtcm.MSM4_GPS, 0.02, 6e-4),
    (rtcm.MSM5_GPS, 0.02, 6e-4),
    (rtcm.MSM4_GAL, 0.02, 6e-4),
    (rtcm.MSM5_GLO, 0.02, 6e-4),
    (rtcm.MSM7_GAL, 1e-3, 3e-4),
])
def test_msm_levels_roundtrip(msg, pr_tol, ph_tol):
    """MSM4/5/7 encode->frame->deframe->decode round-trips within the
    per-level quantization (reference Rtcm::print_MSM_4/5/7)."""
    obs = _sample_msm_obs()
    bits = rtcm.encode_msm(msg, 902, 345_600_123, obs)
    payloads = rtcm.deframe(rtcm.frame(bits))
    assert len(payloads) == 1
    hdr, dec = rtcm.decode_msm(payloads[0])
    assert hdr["msg"] == msg and hdr["station_id"] == 902
    assert len(dec) == 3
    level, _sys = rtcm.MSM_MESSAGES[msg]
    for o, d in zip(sorted(obs, key=lambda o: (o.prn, o.signal_id)),
                    sorted(dec, key=lambda o: (o.prn, o.signal_id))):
        assert (d.prn, d.signal_id) == (o.prn, o.signal_id)
        assert abs(d.pseudorange_m - o.pseudorange_m) < pr_tol
        assert abs(d.phase_range_m - o.phase_range_m) < ph_tol
        if level >= 5:
            assert abs(d.phase_rate_m_s - o.phase_rate_m_s) < 1e-3
        assert abs(d.cn0_dbhz - o.cn0_dbhz) <= 1.0


def test_legacy_1002_1004_roundtrip():
    obs = [rtcm.LegacyObservation(
               prn=5, pseudorange_m=22_123_456.78,
               phase_range_m=22_123_457.01, lock_time_s=90.0, cn0_dbhz=46.5,
               pseudorange_l2_m=22_123_458.11, phase_range_l2_m=22_123_457.5,
               cn0_l2_dbhz=41.0),
           rtcm.LegacyObservation(
               prn=19, pseudorange_m=20_456_789.12,
               phase_range_m=20_456_788.9, lock_time_s=2.0, cn0_dbhz=50.0)]
    for encode, msg in ((rtcm.encode_1002, 1002), (rtcm.encode_1004, 1004)):
        bits = encode(77, 123_456_000, obs)
        hdr, dec = rtcm.decode_legacy_obs(rtcm.deframe(rtcm.frame(bits))[0])
        assert hdr["msg"] == msg and hdr["station_id"] == 77
        assert hdr["epoch_ms"] == 123_456_000
        for o, d in zip(obs, dec):
            assert d.prn == o.prn
            assert abs(d.pseudorange_m - o.pseudorange_m) < 0.02
            assert abs((d.phase_range_m - d.pseudorange_m)
                       - (o.phase_range_m - o.pseudorange_m)) < 6e-4
            assert abs(d.cn0_dbhz - o.cn0_dbhz) <= 0.25
            if msg == 1004 and o.pseudorange_l2_m is not None:
                assert abs(d.pseudorange_l2_m - o.pseudorange_l2_m) < 0.03
            else:
                assert d.pseudorange_l2_m is None


def test_legacy_1012_glonass_roundtrip():
    obs = [rtcm.LegacyObservation(
        prn=3, pseudorange_m=19_876_543.21, phase_range_m=19_876_543.05,
        lock_time_s=33.0, cn0_dbhz=43.25, freq_slot=-4)]
    bits = rtcm.encode_1012(14, 43_200_123, obs)
    hdr, dec = rtcm.decode_legacy_obs(rtcm.deframe(rtcm.frame(bits))[0])
    assert hdr["msg"] == 1012 and hdr["epoch_ms"] == 43_200_123
    d = dec[0]
    assert d.prn == 3 and d.freq_slot == -4
    assert abs(d.pseudorange_m - obs[0].pseudorange_m) < 0.02
    assert abs((d.phase_range_m - d.pseudorange_m)
               - (obs[0].phase_range_m - obs[0].pseudorange_m)) < 6e-4


def test_base_station_ingests_legacy_and_msm45():
    """RtcmBaseStation consumes 1004 / 1012 / MSM4 epochs (the rover side
    previously understood only the message set it emits itself)."""
    from gnss_sdr_tpu.receiver.pvt.rtk_engine import RtcmBaseStation

    bs = RtcmBaseStation()
    legacy = [rtcm.LegacyObservation(
        prn=5, pseudorange_m=22e6, phase_range_m=22e6 + 0.2,
        pseudorange_l2_m=22e6 + 1.0, phase_range_l2_m=22e6 + 0.1)]
    glo = [rtcm.LegacyObservation(
        prn=9, pseudorange_m=20e6, phase_range_m=20e6 - 0.1, freq_slot=2)]
    msm4 = [rtcm.MsmObservation(prn=11, signal_id=2,
                                pseudorange_m=23e6, phase_range_m=23e6 + 0.3)]
    stream = (rtcm.frame(rtcm.encode_1004(1, 100_000, legacy))
              + rtcm.frame(rtcm.encode_1012(1, 50_000, glo))
              + rtcm.frame(rtcm.encode_msm(rtcm.MSM4_GPS, 1, 100_000, msm4)))
    # feed in awkward pieces to exercise the incremental deframer
    bs.push_bytes(stream[:17])
    bs.push_bytes(stream[17:])
    assert len(bs.epochs) == 3
    (t1, s1, o1, d1), (t2, s2, o2, d2), (t3, s3, o3, d3) = bs.epochs
    assert (s1, s2, s3) == ("G", "R", "G")
    assert {o.signal_id for o in o1} == {2, 15}      # L1 + L2 from 1004
    assert o2[0].prn == 9 and s2 == "R"
    assert o3[0].prn == 11
    assert abs(t1 - 100.0) < 1e-9
    # 1012's epoch is GLONASS time-of-day: stored as GPS second-of-day
    # with the day unresolved; messages without a rate field say so
    assert d1 and d3 and not d2
    assert abs(t2 - ((50.0 - 10800.0 + rtcm.GPS_UTC_LEAP_S) % 86400)) < 1e-9
    assert all(not o.has_rate for o in o1 + o2 + o3)


def test_ntrip_client_against_fake_caster():
    """NTRIP v1 negotiation + streaming into the base station."""
    import threading
    from gnss_sdr_tpu.io.ntrip import NtripClient, NtripError
    from gnss_sdr_tpu.receiver.pvt.rtk_engine import RtcmBaseStation

    payload = rtcm.frame(rtcm.encode_1005(42, np.array([4e6, 1e5, 4.8e6])))

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    seen = {}

    def caster():
        conn, _ = srv.accept()
        req = b""
        while b"\r\n\r\n" not in req:
            req += conn.recv(4096)
        seen["request"] = req.decode()
        if b"GET /BASE1 " in req:
            conn.sendall(b"ICY 200 OK\r\n" + payload)
        else:
            conn.sendall(b"SOURCETABLE 200 OK\r\n\r\n")
        import time
        time.sleep(0.3)
        conn.close()

    th = threading.Thread(target=caster, daemon=True)
    th.start()

    bs = RtcmBaseStation()
    cli = NtripClient("127.0.0.1", port, "BASE1",
                      username="user", password="pw")
    cli.stream_to(bs.push_bytes)
    import time
    deadline = time.time() + 3.0
    while bs.base_ecef is None and time.time() < deadline:
        time.sleep(0.05)
    cli.close()
    th.join(timeout=2.0)
    srv.close()
    assert bs.base_ecef is not None
    np.testing.assert_allclose(bs.base_ecef, [4e6, 1e5, 4.8e6], atol=1e-3)
    assert "GET /BASE1 HTTP/1.0" in seen["request"]
    assert "Authorization: Basic" in seen["request"]


def test_ntrip_client_rejects_bad_mountpoint():
    import threading
    from gnss_sdr_tpu.io.ntrip import NtripClient, NtripError

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def caster():
        conn, _ = srv.accept()
        req = b""
        while b"\r\n\r\n" not in req:
            req += conn.recv(4096)
        conn.sendall(b"SOURCETABLE 200 OK\r\n\r\n")
        conn.close()

    th = threading.Thread(target=caster, daemon=True)
    th.start()
    cli = NtripClient("127.0.0.1", port, "NOPE")
    with pytest.raises(NtripError):
        cli.connect()
    cli.close()
    th.join(timeout=2.0)
    srv.close()


def test_ssr_orbit_clock_roundtrip():
    """SSR 1057/1058 (GPS orbit/clock corrections) encode -> frame ->
    decode round-trip within quantization (reference rtklib_rtcm3.cc
    decode_ssr1/decode_ssr2 field layouts)."""
    orb = [rtcm.SsrOrbitCorrection(prn=7, iode=33, radial_m=1.2345,
                                   along_m=-0.5678, cross_m=0.0912,
                                   dot_radial_m_s=0.0005,
                                   dot_along_m_s=-0.0012),
           rtcm.SsrOrbitCorrection(prn=21, iode=101, radial_m=-2.01,
                                   along_m=1.5, cross_m=-0.75)]
    clk = [rtcm.SsrClockCorrection(prn=7, c0_m=0.8421, c1_m_s=0.0031),
           rtcm.SsrClockCorrection(prn=21, c0_m=-1.204)]

    bits_o = rtcm.encode_ssr_orbit_gps(345600.0, orb, iod=3)
    hdr, dec_o = rtcm.decode_ssr_orbit_gps(rtcm.deframe(rtcm.frame(bits_o))[0])
    assert hdr["msg"] == 1057 and hdr["iod"] == 3
    assert hdr["tow_s"] == 345600.0
    for o, d in zip(orb, dec_o):
        assert (d.prn, d.iode) == (o.prn, o.iode)
        assert abs(d.radial_m - o.radial_m) < 1e-4
        assert abs(d.along_m - o.along_m) < 4e-4
        assert abs(d.cross_m - o.cross_m) < 4e-4
        assert abs(d.dot_radial_m_s - o.dot_radial_m_s) < 1e-6

    bits_c = rtcm.encode_ssr_clock_gps(345600.0, clk, iod=3)
    hdr2, dec_c = rtcm.decode_ssr_clock_gps(
        rtcm.deframe(rtcm.frame(bits_c))[0])
    assert hdr2["msg"] == 1058
    for o, d in zip(clk, dec_c):
        assert d.prn == o.prn
        assert abs(d.c0_m - o.c0_m) < 1e-4
        assert abs(d.c1_m_s - o.c1_m_s) < 1e-6


def test_ssr_application_recovers_precise_orbit():
    """apply_ssr_orbit/clock: broadcast state + SSR correction recovers the
    'precise' state the corrections were derived from."""
    rng = np.random.default_rng(3)
    pos = np.array([15e6, -12e6, 18e6])
    vel = np.array([1200.0, 2400.0, 900.0])
    # derive corrections from a known precise offset, expressed in RAC
    ea = vel / np.linalg.norm(vel)
    ec = np.cross(pos, vel); ec /= np.linalg.norm(ec)
    er = np.cross(ea, ec)
    d_rac = np.array([0.85, -1.42, 0.33])
    precise = pos - (er * d_rac[0] + ea * d_rac[1] + ec * d_rac[2])
    corr = rtcm.SsrOrbitCorrection(prn=5, iode=17, radial_m=d_rac[0],
                                   along_m=d_rac[1], cross_m=d_rac[2])
    got = rtcm.apply_ssr_orbit(pos, vel, corr)
    np.testing.assert_allclose(got, precise, atol=1e-9)

    dts = 1.2e-4
    c = rtcm.SsrClockCorrection(prn=5, c0_m=0.9, c1_m_s=0.001)
    t = rtcm.apply_ssr_clock(dts, c, dt_s=10.0)
    assert abs(t - (dts + (0.9 + 0.01) / 299_792_458.0)) < 1e-15


def test_df013_lock_time_nonlinear_mapping():
    """DF013/DF019 is a piecewise seconds->indicator map (RTCM 10403 Table
    3.4-2), linear only below 24 s: indicators for longer locks step by
    2/4/8/16/32 s; 127 means >= 937 s. A linear min(int(s),127) encoding is
    wrong against real receivers for locks over 24 s."""
    from gnss_sdr_tpu.receiver.pvt.rtcm import _lock_indicator, _lock_seconds

    # exact table anchors
    assert _lock_indicator(0) == 0
    assert _lock_indicator(23) == 23
    assert _lock_indicator(24) == 24
    assert _lock_indicator(70) == 47       # 24 + (70-24)//2
    assert _lock_indicator(72) == 48
    assert _lock_indicator(168) == 72
    assert _lock_indicator(360) == 96
    assert _lock_indicator(744) == 120
    assert _lock_indicator(936) == 126
    assert _lock_indicator(937) == 127
    assert _lock_indicator(100000) == 127
    # inverse consistency: decode(encode(s)) lower-bounds s within its step
    for s in [0, 5, 23, 24, 30, 100, 200, 500, 800, 936, 937, 2000]:
        ind = _lock_indicator(s)
        lo = _lock_seconds(ind)
        assert lo <= s
        if ind < 127:
            assert s - lo < 32          # within one step of the segment
    # round-trip through a legacy message preserves the piecewise decode
    obs = [rtcm.LegacyObservation(prn=7, pseudorange_m=21e6,
                                  phase_range_m=21e6 + 0.1,
                                  lock_time_s=500.0)]
    dec = rtcm.decode_legacy_obs(rtcm.encode_1002(1, 1000, obs))[1][0]
    assert dec.lock_time_s == _lock_seconds(_lock_indicator(500.0))
    assert 480 <= dec.lock_time_s <= 500


def test_glonass_msm_epoch_is_dow_tod():
    """GLONASS MSM epochs are DF416 day-of-week + DF034 time-of-day in
    GLONASS time (UTC+3h), hours away from GPS TOW; the codec must convert
    both directions so epoch matching against a genuine caster works
    (reference rtklib_rtcm3.cc decode_msm_head GLONASS branch)."""
    tow_ms = 208_800_000            # GPS TOW: day 2, 10:00:00
    epoch = rtcm.gps_tow_ms_to_glonass_epoch(tow_ms)
    dow, tod = epoch >> 27, epoch & ((1 << 27) - 1)
    # GLONASS time = GPS - 18 s leap + 3 h
    assert tod == (10 * 3600 + 3 * 3600 - 18) * 1000
    assert dow == 2
    assert rtcm.glonass_epoch_to_gps_tow_ms(epoch) == tow_ms

    # encode/decode a GLONASS MSM: the wire field is GLONASS-format, the
    # decoded header reports GPS TOW
    obs = [rtcm.MsmObservation(prn=4, signal_id=2, pseudorange_m=20e6,
                               phase_range_m=20e6 + 0.2,
                               phase_rate_m_s=120.0)]
    bits = rtcm.encode_msm(rtcm.MSM7_GLO, 9, tow_ms, obs)
    hdr, dec = rtcm.decode_msm(bits)
    assert hdr["epoch_ms"] == tow_ms
    assert hdr["raw_epoch"] == epoch
    assert dec[0].prn == 4 and dec[0].has_rate

    # day-boundary behaviour: GPS 01:00 falls on the PREVIOUS GLONASS day
    # only when 3h-18s pushes past midnight the other way — check wrap at
    # GPS 22:30 (GLONASS 01:30 next day)
    tow2 = (1 * 86400 + 22 * 3600 + 1800) * 1000
    e2 = rtcm.gps_tow_ms_to_glonass_epoch(tow2)
    assert (e2 >> 27) == 2
    assert rtcm.glonass_epoch_to_gps_tow_ms(e2) == tow2


def test_1012_day_resolution_against_rover_tow():
    """1012 epochs (time-of-day only) must match a rover TOW on any day of
    the week via nearest-day folding in epoch_near."""
    from gnss_sdr_tpu.receiver.pvt.rtk_engine import RtcmBaseStation

    bs = RtcmBaseStation()
    glo = [rtcm.LegacyObservation(prn=3, pseudorange_m=20e6,
                                  phase_range_m=20e6 - 0.1, freq_slot=1)]
    # base epoch at GPS 10:00:00.000 (second-of-day 36000):
    # GLONASS TOD = 36000 + 10800 - 18 = 46782 s
    bs.push_bytes(rtcm.frame(rtcm.encode_1012(7, 46_782_000, glo)))
    assert len(bs.epochs) == 1 and not bs.epochs[0][3]
    # rover on day 4 at the same second-of-day
    rover_tow = 4 * 86400 + 36000.0
    got = bs.epoch_near(rover_tow)
    assert got is not None and got[0].prn == 3
    assert bs.epoch_near(rover_tow + 1.0) is None


def test_1006_station_with_height_roundtrip():
    ecef = np.array([4027893.1234, 307045.9876, 4919475.0001])
    d = rtcm.decode_1006(rtcm.encode_1006(901, ecef, 1.3456, glo=True))
    assert d["station_id"] == 901
    np.testing.assert_allclose(d["ecef"], ecef, atol=1e-4)
    assert abs(d["height_m"] - 1.3456) < 1e-4
    assert d["glo"]


def test_1020_glonass_ephemeris_roundtrip():
    """MT1020 GLONASS state-vector ephemeris: sign-magnitude km fields
    (reference Rtcm::print_MT1020 / rtklib decode_type1020)."""
    from gnss_sdr_tpu.models.nav.glonass_gnav import GlonassEphemeris

    eph = GlonassEphemeris(
        slot=9, freq_slot=-2, tb_s=40500.0,
        pos_m=(-12_345_678.9, 8_765_432.1, -20_123_456.7),
        vel_m_s=(-1234.5678, 2345.6789, -345.4321),
        acc_m_s2=(-1.86e-6, 9.3e-7, 2.79e-6),
        gamma_n=-3.2e-11, tau_n=-6.5e-5, health=0)
    dec = rtcm.decode_1020(rtcm.deframe(rtcm.frame(rtcm.encode_1020(eph)))[0])
    assert dec.slot == 9 and dec.freq_slot == -2
    assert dec.tb_s == eph.tb_s and dec.health == 0
    # quantization: pos 2^-11 km ~ 0.49 m, vel 2^-20 km/s ~ 0.95 mm/s
    for a, b in zip(dec.pos_m, eph.pos_m):
        assert abs(a - b) <= 0.5
    for a, b in zip(dec.vel_m_s, eph.vel_m_s):
        assert abs(a - b) <= 1e-3
    for a, b in zip(dec.acc_m_s2, eph.acc_m_s2):
        assert abs(a - b) <= 2.0 ** -30 * 1e3
    assert abs(dec.gamma_n - eph.gamma_n) <= 2.0 ** -40
    assert abs(dec.tau_n - eph.tau_n) <= 2.0 ** -30
    # propagated orbits agree at the quantization level
    p1, _ = eph.position_velocity(40800.0)
    p2, _ = dec.position_velocity(40800.0)
    assert np.linalg.norm(p1 - p2) < 2.0


def test_1042_beidou_ephemeris_roundtrip():
    from gnss_sdr_tpu import constants
    eph = sample_ephemeris()
    eph.toc = 352800.0             # 8 s multiples for BDS scaling
    eph.toe = 352800.0
    eph.tgd = 4.7e-9
    dec = rtcm.decode_1042(rtcm.deframe(rtcm.frame(rtcm.encode_1042(eph)))[0])
    assert dec.prn == eph.prn and dec.toe == eph.toe
    assert abs(dec.af0 - eph.af0) <= 2.0 ** -33
    assert abs(dec.af1 - eph.af1) <= 2.0 ** -50
    assert abs(dec.sqrt_a - eph.sqrt_a) <= 2.0 ** -19
    assert abs(dec.m0 - eph.m0) <= 2.0 ** -31 * np.pi
    assert abs(dec.crs - eph.crs) <= 2.0 ** -6
    assert abs(dec.tgd - eph.tgd) <= 1e-10
    assert dec.gm == constants.GM_EARTH_BDS


def test_1059_code_bias_roundtrip_and_application():
    biases = [rtcm.SsrCodeBias(prn=7, biases={0: 1.23, 14: -0.87}),
              rtcm.SsrCodeBias(prn=19, biases={0: -2.45})]
    bits = rtcm.encode_ssr_code_bias_gps(345600.0, biases, iod=5)
    hdr, dec = rtcm.decode_ssr_code_bias_gps(rtcm.deframe(rtcm.frame(bits))[0])
    assert hdr["msg"] == 1059 and hdr["iod"] == 5
    assert len(dec) == 2
    assert abs(dec[0].biases[0] - 1.23) < 0.01
    assert abs(dec[0].biases[14] + 0.87) < 0.01
    assert abs(dec[1].biases[0] + 2.45) < 0.01
    pr = rtcm.apply_ssr_code_bias(20_000_000.0, dec[0], 14)
    assert abs(pr - (20_000_000.0 - 0.87)) < 0.01
    # unknown signal id leaves the pseudorange unchanged
    assert rtcm.apply_ssr_code_bias(1.0, dec[1], 14) == 1.0


def test_base_station_ingests_new_messages():
    """1006/1020/1042/1059 flow into RtcmBaseStation state: a GLONASS or
    BeiDou rover can get ALL its orbits from the stream."""
    from gnss_sdr_tpu.models.nav.glonass_gnav import GlonassEphemeris
    from gnss_sdr_tpu.receiver.pvt.rtk_engine import RtcmBaseStation

    bs = RtcmBaseStation()
    geph = GlonassEphemeris(slot=4, freq_slot=5, tb_s=39600.0,
                            pos_m=(1e7, -2e7, 1.2e7),
                            vel_m_s=(900.0, 1100.0, -2000.0),
                            acc_m_s2=(0.0, 0.0, 0.0))
    beph = sample_ephemeris()
    beph.toc = beph.toe = 352800.0
    stream = (rtcm.frame(rtcm.encode_1006(3, np.array([4e6, 1e5, 4.8e6]),
                                          2.5))
              + rtcm.frame(rtcm.encode_1020(geph))
              + rtcm.frame(rtcm.encode_1042(beph))
              + rtcm.frame(rtcm.encode_ssr_code_bias_gps(
                  1000.0, [rtcm.SsrCodeBias(prn=7, biases={0: 0.5})])))
    bs.push_bytes(stream)
    assert bs.base_ecef is not None and bs.antenna_height_m == 2.5
    assert ("R", 4) in bs.ephemerides
    assert bs.ephemerides[("R", 4)].freq_slot == 5
    assert ("C", beph.prn) in bs.ephemerides
    assert ("G", 7) in bs.ssr_code_bias


def test_msm_glonass_freq_slot_in_extended_info():
    """The MSM extended-satellite-info field carries the GLONASS FDMA
    channel; differential processing needs it for per-slot wavelengths."""
    obs = [rtcm.MsmObservation(prn=11, signal_id=2, pseudorange_m=19.5e6,
                               phase_range_m=19.5e6 + 0.1,
                               phase_rate_m_s=50.0, freq_slot=-4)]
    hdr, dec = rtcm.decode_msm(rtcm.encode_msm(rtcm.MSM7_GLO, 1,
                                               100_000, obs))
    assert dec[0].freq_slot == -4
    # GPS MSM leaves the field zero
    hdr, dec = rtcm.decode_msm(rtcm.encode_msm(rtcm.MSM7_GPS, 1,
                                               100_000, obs))
    assert dec[0].freq_slot == 0


def test_ppp_engine_applies_code_biases():
    from gnss_sdr_tpu.receiver.pvt.ppp_engine import PppEngine

    eng = PppEngine({}, x0_ecef=(0, 0, 0))
    eng.set_code_biases([rtcm.SsrCodeBias(prn=3, biases={0: 2.0, 14: -1.0})])

    class O:
        prn = 3
        signal = "1C"
        pseudorange_m = 100.0
    assert eng._corrected_pr(O()) == 102.0
    O.signal = "L5"
    assert eng._corrected_pr(O()) == 99.0
    O.prn = 5
    assert eng._corrected_pr(O()) == 100.0


def test_1046_galileo_inav_ephemeris_roundtrip():
    """MT1046 carries the I/NAV Kepler set with BOTH BGDs and the E5b/E1-B
    health flags (rtklib decode_type1046 field order)."""
    eph = sample_ephemeris()
    eph.prn = 11
    eph.week = 1234
    eph.iode = 87
    eph.tgd = -4.7e-9                          # BGD E1/E5a
    eph.toc = eph.toe = 345600.0               # 60 s resolution
    bits = rtcm.encode_1046(eph, bgd_e5b=-5.1e-9, e5b_health=1,
                            e1b_health=2)
    dec, info = rtcm.decode_1046(rtcm.deframe(rtcm.frame(bits))[0])
    assert dec.prn == 11 and dec.week == 1234 and dec.iode == 87
    assert dec.toe == 345600.0
    assert abs(dec.tgd - eph.tgd) < 2.0 ** -32
    assert abs(info["bgd_e5b"] + 5.1e-9) < 2.0 ** -32
    assert info["e5b_health"] == 1 and info["e1b_health"] == 2
    assert dec.health == 2                     # E1-B HS drives the flag
    assert abs(dec.sqrt_a - eph.sqrt_a) < 2.0 ** -19
    assert abs(dec.m0 - eph.m0) < 1e-8


def test_ssr_glonass_galileo_roundtrips():
    """1063/1064/1065 (GLONASS, 17-bit time-of-day epoch, 5-bit slot) and
    1240/1241/1242 (Galileo, 10-bit IODnav) mirror the GPS triplet
    (rtklib decode_ssr1_head np/ni tables)."""
    orb = [rtcm.SsrOrbitCorrection(prn=4, iode=21, radial_m=0.8,
                                   along_m=-1.2, cross_m=0.4,
                                   dot_radial_m_s=1e-4)]
    bits = rtcm.encode_ssr_orbit(40000.0, orb, iod=2, system="R")
    hdr, dec = rtcm.decode_ssr_orbit(rtcm.deframe(rtcm.frame(bits))[0])
    assert hdr["msg"] == 1063 and hdr["system"] == "R"
    assert hdr["tow_s"] == 40000.0             # GLONASS tod fits 17 bits
    assert dec[0].system == "R" and dec[0].prn == 4 and dec[0].iode == 21
    assert abs(dec[0].radial_m - 0.8) < 1e-4

    clk = [rtcm.SsrClockCorrection(prn=4, c0_m=1.5, c1_m_s=2e-5)]
    bits = rtcm.encode_ssr_clock(40000.0, clk, system="R")
    hdr, dec = rtcm.decode_ssr_clock(rtcm.deframe(rtcm.frame(bits))[0])
    assert hdr["msg"] == 1064 and dec[0].system == "R"
    assert abs(dec[0].c0_m - 1.5) < 1e-4

    # Galileo: 10-bit IODnav survives values > 255
    orb_e = [rtcm.SsrOrbitCorrection(prn=12, iode=600, radial_m=-0.3,
                                     along_m=0.1, cross_m=0.0)]
    bits = rtcm.encode_ssr_orbit(345600.0, orb_e, system="E")
    hdr, dec = rtcm.decode_ssr_orbit(rtcm.deframe(rtcm.frame(bits))[0])
    assert hdr["msg"] == 1240 and dec[0].iode == 600

    bia = [rtcm.SsrCodeBias(prn=12, biases={1: 0.8, 14: -0.6},
                            system="E")]
    bits = rtcm.encode_ssr_code_bias(345600.0, bia, system="E")
    hdr, dec = rtcm.decode_ssr_code_bias(rtcm.deframe(rtcm.frame(bits))[0])
    assert hdr["msg"] == 1242 and dec[0].system == "E"
    assert abs(dec[0].biases[1] - 0.8) < 0.01


def test_base_station_ingests_multi_system_ssr_and_1046():
    from gnss_sdr_tpu.receiver.pvt.rtk_engine import RtcmBaseStation

    eph = sample_ephemeris()
    eph.prn = 19
    eph.toc = eph.toe = 345600.0
    stream = (
        rtcm.frame(rtcm.encode_1046(eph, bgd_e5b=1e-9))
        + rtcm.frame(rtcm.encode_ssr_orbit(
            40000.0, [rtcm.SsrOrbitCorrection(
                prn=4, iode=3, radial_m=0.5, along_m=0.0, cross_m=0.0,
                system="R")], system="R"))
        + rtcm.frame(rtcm.encode_ssr_clock(
            345600.0, [rtcm.SsrClockCorrection(prn=19, c0_m=0.9,
                                               system="E")], system="E"))
        + rtcm.frame(rtcm.encode_ssr_code_bias(
            40000.0, [rtcm.SsrCodeBias(prn=4, biases={0: 0.4},
                                       system="R")], system="R")))
    bs = RtcmBaseStation()
    bs.push_bytes(stream)
    assert ("E", 19) in bs.ephemerides
    assert ("R", 4) in bs.ssr_orbit and bs.ssr_orbit[("R", 4)].system == "R"
    assert ("E", 19) in bs.ssr_clock
    assert ("R", 4) in bs.ssr_code_bias


def test_ppp_engine_multi_system_bias_keys():
    """Galileo biases keyed ('E', prn) do not collide with GPS prn."""
    from gnss_sdr_tpu.receiver.pvt.ppp_engine import PppEngine

    eng = PppEngine({}, x0_ecef=(0, 0, 0))
    eng.set_code_biases([
        rtcm.SsrCodeBias(prn=3, biases={0: 2.0}, system="G"),
        rtcm.SsrCodeBias(prn=3, biases={1: -1.5}, system="E")])

    class O:
        prn = 3
        signal = "1C"
        pseudorange_m = 100.0
    assert eng._corrected_pr(O()) == 102.0
    O.signal = "1B"
    assert eng._corrected_pr(O()) == 98.5


@pytest.mark.parametrize("msg", [
    rtcm.MSM1_GPS, rtcm.MSM2_GPS, rtcm.MSM3_GPS,
    rtcm.MSM3_GLO, rtcm.MSM6_GAL, rtcm.MSM6_GPS,
])
def test_msm_low_levels_roundtrip(msg):
    """MSM1/2/3/6 (reference Rtcm::print_MSM_1/2/3/6): MSM1-3 round-trip
    modulo 1 ms (no DF397 field) and flag it; MSM6 is MSM7 without rates."""
    obs = _sample_msm_obs()
    bits = rtcm.encode_msm(msg, 17, 345_600_123, obs)
    hdr, dec = rtcm.decode_msm(rtcm.deframe(rtcm.frame(bits))[0])
    assert hdr["msg"] == msg
    assert len(dec) == 3
    level, _sys = rtcm.MSM_MESSAGES[msg]
    for o, d in zip(sorted(obs, key=lambda o: (o.prn, o.signal_id)),
                    sorted(dec, key=lambda o: (o.prn, o.signal_id))):
        assert (d.prn, d.signal_id) == (o.prn, o.signal_id)
        assert d.has_rate is False
        if level <= 3:
            assert d.modulo_1ms
            # the ambiguity resolves against an approximate range
            full = rtcm.resolve_modulo_range(
                d.pseudorange_m, o.pseudorange_m + 40_000.0)
            tol = {1: 0.02, 2: 300.0, 3: 0.02}[level]
            assert abs(full - o.pseudorange_m) < tol
            if level >= 2:
                ph = rtcm.resolve_modulo_range(
                    d.phase_range_m, o.phase_range_m + 40_000.0)
                assert abs(ph - o.phase_range_m) < 6e-4
            else:
                assert d.has_phase is False
        else:                               # MSM6: full ext-resolution
            assert not d.modulo_1ms
            assert abs(d.pseudorange_m - o.pseudorange_m) < 1e-3
            assert abs(d.phase_range_m - o.phase_range_m) < 3e-4
            assert abs(d.cn0_dbhz - o.cn0_dbhz) <= 0.1


def test_ssr_combined_roundtrip_all_systems():
    """SSR combined orbit+clock 1060/1066/1243 (rtklib decode_ssr4):
    one record per satellite carrying both correction sets."""
    for system, msg in (("G", 1060), ("R", 1066), ("E", 1243)):
        orb = [rtcm.SsrOrbitCorrection(prn=7, iode=33, radial_m=1.2345,
                                       along_m=-0.5678, cross_m=0.0912,
                                       dot_radial_m_s=0.0005, system=system),
               rtcm.SsrOrbitCorrection(prn=21, iode=101, radial_m=-2.01,
                                       along_m=1.5, cross_m=-0.75,
                                       system=system)]
        clk = [rtcm.SsrClockCorrection(prn=7, c0_m=0.8421, c1_m_s=0.0031,
                                       system=system),
               rtcm.SsrClockCorrection(prn=21, c0_m=-1.204, system=system)]
        tow = 45_600.0 if system == "R" else 345_600.0
        bits = rtcm.encode_ssr_combined(tow, orb, clk, iod=5, system=system)
        hdr, dec_o, dec_c = rtcm.decode_ssr_combined(
            rtcm.deframe(rtcm.frame(bits))[0])
        assert hdr["msg"] == msg and hdr["iod"] == 5
        assert hdr["tow_s"] == tow
        for o, d in zip(orb, dec_o):
            assert (d.prn, d.iode, d.system) == (o.prn, o.iode, system)
            assert abs(d.radial_m - o.radial_m) < 1e-4
            assert abs(d.along_m - o.along_m) < 4e-4
            assert abs(d.dot_radial_m_s - o.dot_radial_m_s) < 1e-6
        for o, d in zip(clk, dec_c):
            assert d.prn == o.prn and d.system == system
            assert abs(d.c0_m - o.c0_m) < 1e-4
            assert abs(d.c1_m_s - o.c1_m_s) < 1e-6


def test_rtk_engine_accepts_combined_ssr():
    """The rover dispatch stores 1060 combined corrections in the same
    ssr_orbit/ssr_clock maps the split messages feed."""
    from gnss_sdr_tpu.receiver.pvt import rtk_engine
    base = rtk_engine.RtcmBaseStation()
    orb = [rtcm.SsrOrbitCorrection(prn=9, iode=12, radial_m=0.5,
                                   along_m=0.1, cross_m=-0.2)]
    clk = [rtcm.SsrClockCorrection(prn=9, c0_m=0.33)]
    bits = rtcm.encode_ssr_combined(345600.0, orb, clk, system="G")
    base.push_bytes(rtcm.frame(bits))
    assert ("G", 9) in base.ssr_orbit and ("G", 9) in base.ssr_clock
    assert abs(base.ssr_clock[("G", 9)].c0_m - 0.33) < 1e-4


def test_msm_beidou_roundtrip_bdt_epoch():
    """BDS MSM (1124/1127): the 30-bit epoch is BDT TOW (GPST - 14 s,
    rtklib decode_msm_head BDT adjustment); ranges round-trip as usual."""
    obs = _sample_msm_obs()
    tow_gps_ms = 345_600_123
    for msg in (rtcm.MSM4_BDS, rtcm.MSM7_BDS):
        bits = rtcm.encode_msm(msg, 55, tow_gps_ms, obs)
        hdr, dec = rtcm.decode_msm(rtcm.deframe(rtcm.frame(bits))[0])
        assert hdr["msg"] == msg
        # epoch reported back in GPS TOW; the raw field is BDT
        assert hdr["epoch_ms"] == tow_gps_ms
        assert hdr["raw_epoch"] == tow_gps_ms - rtcm.BDT_GPS_OFFSET_MS
        assert len(dec) == 3
        for o, d in zip(sorted(obs, key=lambda o: (o.prn, o.signal_id)),
                        sorted(dec, key=lambda o: (o.prn, o.signal_id))):
            assert abs(d.pseudorange_m - o.pseudorange_m) < 0.02


def test_1044_qzss_ephemeris_roundtrip():
    """QZSS MT1044 (rtklib decode_type1044): GPS LNAV scalings with the
    clock block leading and a 4-bit PRN-192 satellite id."""
    eph = sample_ephemeris()
    eph.prn = 195
    dec = rtcm.decode_1044(rtcm.encode_1044(eph))
    assert dec.prn == 195
    assert dec.iode == eph.iode and dec.iodc == eph.iodc
    assert dec.toe == eph.toe and dec.toc == eph.toc
    assert abs(dec.sqrt_a - eph.sqrt_a) <= 2.0 ** -19
    assert abs(dec.e - eph.e) <= 2.0 ** -33
    assert abs(dec.m0 - eph.m0) <= 2.0 ** -31 * np.pi
    assert abs(dec.af0 - eph.af0) <= 2.0 ** -31
    assert abs(dec.idot - eph.idot) <= 2.0 ** -43 * np.pi
    assert abs(dec.tgd - eph.tgd) <= 2.0 ** -31
    assert dec.week == eph.week % 1024
