"""SUPL A-GNSS client: UPER codec, ULP/RRLP round trips, full session.

Reference analogs: src/core/libs/supl/supl.c (protocol flow),
gnss_sdr_supl_client.cc (assistance -> Gps_Ephemeris conversions), and the
asn1c-generated ULP/RRLP codecs (here: io/uper.py schema engine).
"""

import numpy as np
import pytest

from gnss_sdr_tpu.io import supl, uper
from gnss_sdr_tpu.models.ephemeris import IonoParams, KeplerEphemeris, UtcParams


# ------------------------------------------------------------- UPER engine
def test_uper_constrained_int_bit_widths():
    """X.691 10.5.7: constrained ints take ceil(log2(range)) bits."""
    for lo, hi, v, nbits in [(0, 7, 5, 3), (0, 255, 200, 8), (1, 1, 1, 0),
                             (-2048, 2047, -1, 12), (0, 65535, 65535, 16),
                             (-2147483648, 2147483647, -123456789, 32)]:
        s = uper.INT(lo, hi)
        w = uper.BitW()
        s.encode(w, v)
        assert w.n == nbits, (lo, hi)
        assert uper.decode(s, w.tobytes()) == v


def test_uper_known_vectors():
    """Hand-checkable encodings: a non-extensible SEQUENCE of two
    constrained ints packs with no alignment or tags."""
    s = uper.SEQ(uper.F("a", uper.INT(0, 15)), uper.F("b", uper.INT(0, 15)))
    assert uper.encode(s, {"a": 0xA, "b": 0x5}) == b"\xa5"
    # optional absent -> leading presence bit 0
    s2 = uper.SEQ(uper.F("a", uper.INT(0, 7), optional=True))
    assert uper.encode(s2, {}) == b"\x00"
    assert uper.decode(s2, b"\x00") == {}


def test_uper_extension_skip():
    """A decoder built from the base schema skips unknown extension
    additions (release-98/5 IEs from real SLPs)."""
    base = uper.SEQ(uper.F("a", uper.INT(0, 255)), ext=True)
    # hand-build an extended encoding: ext=1, a=7, bitmap len 1, one
    # present addition carried as a 2-octet open type
    w = uper.BitW()
    w.bits(1, 1)
    w.bits(7, 8)
    w.bits(0, 7)          # normally-small bitmap length - 1 = 0
    w.bits(1, 1)          # addition present
    w.bits(2, 8)          # open type: length 2
    w.bits(0xBEEF, 16)
    out = uper.decode(base, w.tobytes())
    assert out["a"] == 7
    assert out["_ext"] == [b"\xbe\xef"]


def test_uper_charstr_constrained_alphabet():
    v = "supl.example-1.com"
    assert uper.decode(supl.FQDN, uper.encode(supl.FQDN, v)) == v


# ----------------------------------------------------------- ULP messages
def _roundtrip_ulp(message):
    sid = {"setSessionID": {"sessionId": 7,
                            "setId": ("msisdn", supl._MSISDN)}}
    raw = supl.encode_ulp(sid, message)
    assert int.from_bytes(raw[:2], "big") == len(raw)   # patched length
    pdu = supl.decode_ulp(raw)
    assert pdu["sessionID"]["setSessionID"]["sessionId"] == 7
    return pdu["message"]


def test_ulp_suplstart_roundtrip():
    kind, msg = _roundtrip_ulp(("msSUPLSTART", {
        "sETCapabilities": supl._CAPABILITIES,
        "locationId": {"cellInfo": ("gsmCell", {
            "refMCC": 244, "refMNC": 5, "refLAC": 0x59E2, "refCI": 0x31B0}),
            "status": "current"},
        "qoP": {"horacc": 0}}))
    assert kind == "msSUPLSTART"
    assert msg["sETCapabilities"]["posProtocol"]["rrlp"] is True
    assert msg["locationId"]["cellInfo"][1]["refLAC"] == 0x59E2


def test_ulp_suplend_status_roundtrip():
    kind, msg = _roundtrip_ulp(("msSUPLEND",
                                {"statusCode": "posMethodFailure"}))
    assert kind == "msSUPLEND" and msg["statusCode"] == "posMethodFailure"


# ----------------------------------------------------------- RRLP payloads
def _test_eph(prn=13):
    return KeplerEphemeris(
        prn=prn, toc=345600.0, af0=4.2e-4, af1=-1.8e-11, af2=0.0,
        tgd=-5.2e-9, toe=345600.0, sqrt_a=5153.71, e=0.0123,
        m0=1.21, delta_n=4.9e-9, omega0=-2.71, omega_dot=-8.1e-9,
        omega=0.93, i0=0.958, idot=2.2e-10, cuc=1.2e-6, cus=7.6e-6,
        crc=221.3, crs=-11.6, cic=-6.3e-8, cis=1.1e-7,
        iode=46, iodc=46, health=0, ura=2)


def test_rrlp_ephemeris_roundtrip_scale_factors():
    """Ephemeris -> RRLP UncompressedEphemeris -> ephemeris is lossless to
    the LNAV quantization (gnss_sdr_supl_client.cc:300-340 factors)."""
    eph = _test_eph()
    raw = uper.encode(supl.RRLP_PDU, {
        "referenceNumber": 3,
        "component": ("assistanceData", {
            "gps-AssistData": {"controlHeader": {
                "navigationModel": {"navModelList": [
                    {"satelliteID": eph.prn - 1,
                     "satStatus": ("newSatelliteAndModelUC",
                                   supl.eph_to_rrlp(eph))}]}}}})})
    pdu = uper.decode(supl.RRLP_PDU, raw)
    assist = supl.SuplAssist()
    assert supl.collect_rrlp(assist, pdu) is False
    [(prn, ue)] = assist.ephemerides
    back = supl.eph_from_rrlp(prn, ue)
    assert back.prn == eph.prn and back.iodc == 46
    assert back.toe == eph.toe and back.toc == eph.toc
    for f, tol in [("sqrt_a", 2.0 ** -19), ("e", 2.0 ** -33),
                   ("m0", 2.0 ** -31 * 4), ("omega0", 2.0 ** -31 * 4),
                   ("i0", 2.0 ** -31 * 4), ("omega", 2.0 ** -31 * 4),
                   ("af0", 2.0 ** -31), ("tgd", 2.0 ** -31),
                   ("crc", 2.0 ** -5), ("cus", 2.0 ** -29)]:
        assert abs(getattr(back, f) - getattr(eph, f)) <= tol, f


def test_rrlp_almanac_iono_utc_reftime_refloc():
    from gnss_sdr_tpu.models.almanac import GpsAlmanac
    alm = GpsAlmanac(prn=5, e=0.004, toa=319488.0, delta_i=0.02,
                     omega_dot=-7.9e-9, sqrt_a=5153.6, omega0=1.1,
                     omega=-0.5, m0=2.2, af0=3.1e-5, af1=3.6e-12,
                     health=0, wna=77)
    iono = IonoParams(alpha=(1.2e-8, -7.5e-9, -6.0e-8, 1.2e-7),
                      beta=(96256.0, -32768.0, -196608.0, 65536.0),
                      valid=True)
    utc = UtcParams(a0=9.3e-9, a1=-2.7e-15, tot=405504.0, wnt=2240 % 256,
                    delta_t_ls=18, valid=True)
    srv_hdr_batches = supl.SuplServer(
        almanacs=[alm], wna=77, iono=iono, utc=utc,
        ref_llh=(41.275, 1.9876, 80.0), gps_week=2240,
        gps_tow=345600.0)._control_headers({
            "almanacRequested": True, "ionosphericModelRequested": True,
            "utcModelRequested": True, "referenceTimeRequested": True,
            "referenceLocationRequested": True})
    assist = supl.SuplAssist()
    for hdr in srv_hdr_batches:
        raw = uper.encode(supl.RRLP_PDU, {
            "referenceNumber": 0,
            "component": ("assistanceData",
                          {"gps-AssistData": {"controlHeader": hdr}})})
        supl.collect_rrlp(assist, uper.decode(supl.RRLP_PDU, raw))
    a = supl.to_assistance(assist)
    alm_b = a.almanacs[("G", 5)]
    assert abs(alm_b.delta_i - alm.delta_i) < 2.0 ** -19 * 4
    assert abs(alm_b.sqrt_a - alm.sqrt_a) < 2.0 ** -11
    assert alm_b.toa == alm.toa and alm_b.wna == 77
    assert a.iono.valid and abs(a.iono.alpha[0] - iono.alpha[0]) < 2.0 ** -30
    assert abs(a.iono.beta[2] - iono.beta[2]) < 2.0 ** 16
    assert a.utc.valid and a.utc.delta_t_ls == 18
    assert abs(a.utc.a0 - utc.a0) < 2.0 ** -30
    assert a.tow_s == pytest.approx(345600.0, abs=0.08)
    # GAD reference location decodes back to the commanded lat/lon
    # (within the 23/24-bit GAD quantization, ~1e-5 deg)
    from gnss_sdr_tpu.receiver.pvt.geodesy import ecef_to_geodetic
    lat, lon, _h = ecef_to_geodetic(a.position_ecef)
    assert abs(np.degrees(lat) - 41.275) < 1e-4
    assert abs(np.degrees(lon) - 1.9876) < 1e-4


# --------------------------------------------------------- full session
def test_supl_session_end_to_end():
    """Client <-> QA server over a real socket: START/RESPONSE/POSINIT/
    POS(+ack paging)/END, ephemeris + reference time collected."""
    ephs = [_test_eph(prn) for prn in (2, 5, 13, 21, 29)]
    srv = supl.SuplServer(ephemerides=ephs, gps_week=2240,
                          gps_tow=345600.0, n_batches=3)
    srv.start()
    client = supl.SuplClient("127.0.0.1", srv.port)
    assist = client.get_assist(supl.REQUEST_EPHEMERIS)
    srv.join(timeout=10)
    if srv.error:
        raise srv.error
    assert srv.n_acks >= 1                       # paging loop exercised
    assert srv.got_posinit["requestedAssistData"]["navigationModelRequested"]
    assert assist.gps_week == 2240 % 1024
    assert assist.gps_tow == pytest.approx(345600.0, abs=0.08)
    a = supl.to_assistance(assist)
    assert sorted(prn for (_s, prn) in a.ephemerides) == [2, 5, 13, 21, 29]
    got = a.ephemerides[("G", 13)]
    assert abs(got.sqrt_a - 5153.71) < 1e-2


def test_fetch_supl_assistance_from_ini():
    """The reference's GNSS-SDR.SUPL_* keys drive the whole fetch."""
    from gnss_sdr_tpu.config.ini import InMemoryConfiguration
    ephs = [_test_eph(7)]
    iono = IonoParams(alpha=(1.2e-8, 0, 0, 0), beta=(96256.0, 0, 0, 0),
                      valid=True)
    # fetch runs two sequential sessions (request=1 then request=0) like
    # the reference control thread; one server answers both, selecting
    # payloads from each session's RequestedAssistData flags
    srv = supl.SuplServer(ephemerides=ephs, iono=iono,
                          ref_llh=(41.0, 2.0, 50.0), gps_week=2240,
                          gps_tow=1000.0, n_batches=1, n_sessions=3,
                          acq_assist=[(7, 1250.0, 431.0)])
    srv.start()
    conf = InMemoryConfiguration({
        "GNSS-SDR.SUPL_gps_enabled": "true",
        "GNSS-SDR.SUPL_gps_ephemeris_server": "127.0.0.1",
        "GNSS-SDR.SUPL_gps_ephemeris_port": str(srv.port),
    })
    a = supl.fetch_supl_assistance(conf)
    srv.join(timeout=30)
    if srv.error:
        raise srv.error
    assert a is not None
    assert ("G", 7) in a.ephemerides
    assert a.iono is not None and a.iono.valid
    assert a.position_ecef is not None
    # third (acquisition) session produced direct Doppler hints
    hint = a.acq[("G", 7)]
    assert hint["doppler_hz"] == pytest.approx(1250.0, abs=2.5)
    assert hint["code_phase_chips"] == 431.0


def test_fetch_supl_disabled_returns_none():
    from gnss_sdr_tpu.config.ini import InMemoryConfiguration
    assert supl.fetch_supl_assistance(InMemoryConfiguration({})) is None


def test_receiver_applies_supl_assistance():
    """SUPL fetch -> Receiver warm-start state (the __main__ wiring)."""
    from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
    srv = supl.SuplServer(ephemerides=[_test_eph(9)],
                          ref_llh=(41.0, 2.0, 50.0),
                          gps_week=2240, gps_tow=1000.0, n_batches=1)
    srv.start()
    client = supl.SuplClient("127.0.0.1", srv.port)
    assist = client.get_assist(supl.REQUEST_EPHEMERIS)
    srv.join(timeout=10)
    if srv.error:
        raise srv.error
    # second session: almanac request carries ref location + time
    # (the reference control thread runs the same two-session sequence)
    srv2 = supl.SuplServer(ref_llh=(41.0, 2.0, 50.0),
                           gps_week=2240, gps_tow=1000.0, n_batches=1)
    srv2.start()
    assist2 = supl.SuplClient("127.0.0.1", srv2.port).get_assist(
        supl.REQUEST_ALMANAC)
    srv2.join(timeout=10)
    if srv2.error:
        raise srv2.error
    rx = Receiver(ReceiverConfig(signal="1C", fs=2.0e6, n_channels=1,
                                 prns=(9,)))
    rx.apply_assistance(supl.to_assistance(assist))
    rx.apply_assistance(supl.to_assistance(assist2))
    assert ("G", 9) in rx.ephemerides
    assert rx.assist_pos is not None
    assert rx.assist_tow == pytest.approx(1000.0, abs=0.08)


def test_acq_assist_drives_predicted_dopplers():
    """SUPL acquisition assistance narrows assisted acquisition directly,
    without ephemerides (reference pcps_assisted_acquisition window)."""
    from gnss_sdr_tpu.receiver.control import Assistance
    from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig

    rx = Receiver(ReceiverConfig(signal="1C", fs=2.0e6, n_channels=2,
                                 prns=(4, 9)))
    rx.apply_assistance(Assistance(acq={
        ("G", 4): {"doppler_hz": -2200.0, "doppler_rate_hz_s": 0.5,
                   "tow_s": 1000.0},
        ("G", 9): {"doppler_hz": 3100.0, "doppler_rate_hz_s": 0.0,
                   "tow_s": 1000.0}}))
    g = rx.groups[0]
    preds = rx._predicted_dopplers(g, [4, 9])
    assert preds is not None
    assert preds[0] == pytest.approx(-2200.0)
    assert preds[1] == pytest.approx(3100.0)
    # candidate without any hint or ephemeris -> no full coverage
    assert rx._predicted_dopplers(g, [4, 5]) is None
    # stale hints (> 10 min old receiver time) are ignored
    rx.assist_pos = __import__("numpy").zeros(3)
    rx.assist_tow = 2000.0
    rx.almanacs.clear(); rx.ephemerides.clear()
    rx.acq_assist[("G", 4)]["tow_s"] = 100.0
    assert rx._predicted_dopplers(g, [4]) is None
