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
