"""Output printer tests: NMEA, KML/GPX/GeoJSON, RINEX obs+nav.

Reference analogs: rinex_printer_test.cc, nmea_printer_test.cc.
"""

import json
import re

import numpy as np
import pytest

from gnss_sdr_tpu.receiver.pvt.solver import PvtSolution
from gnss_sdr_tpu.receiver.pvt import geodesy, nmea, rinex, tracks
from gnss_sdr_tpu.receiver.pvt.gpstime import gps_to_datetime, datetime_to_gps
from gnss_sdr_tpu.receiver.observables import ChannelObservable

from test_lnav import sample_ephemeris


@pytest.fixture
def sol():
    lat, lon, h = np.deg2rad(41.275), np.deg2rad(1.9876), 80.0
    pos = geodesy.geodetic_to_ecef(lat, lon, h)
    return PvtSolution(valid=True, pos_ecef=pos, vel_ecef=np.array([1.0, 2.0, 0.5]),
                       clock_bias_s=1e-4, tow_s=352800.5, week=2045, n_sats=7,
                       gdop=2.0, pdop=1.8, hdop=1.0, vdop=1.5,
                       lat_rad=lat, lon_rad=lon, height_m=h)


def test_gpstime_roundtrip():
    t = gps_to_datetime(2045, 352800.0)
    w, tow = datetime_to_gps(t)
    assert w == 2045 and abs(tow - 352800.0) < 1e-6


def test_nmea_gga_rmc(sol, tmp_path):
    s = nmea.gga(sol)
    assert s.startswith("$GPGGA,")
    body, cks = s.strip()[1:].split("*")
    assert f"{np.bitwise_xor.reduce([ord(c) for c in body]):02X}" == cks
    # lat 41.275 deg -> 4116.5
    assert ",4116.5" in s and ",00159.2" in s
    r = nmea.rmc(sol)
    assert r.startswith("$GPRMC,") and ",A," in r
    p = tmp_path / "out.nmea"
    pr = nmea.NmeaPrinter(p)
    pr.push(sol, prns=[1, 7, 11, 19])
    pr.close()
    text = p.read_text()
    assert "$GPGGA" in text and "$GPRMC" in text and "$GPGSA" in text


def test_track_printers(sol, tmp_path):
    for cls, name, marker in [(tracks.KmlPrinter, "t.kml", "<kml"),
                              (tracks.GpxPrinter, "t.gpx", "<gpx"),
                              (tracks.GeoJsonPrinter, "t.geojson", "LineString")]:
        p = tmp_path / name
        pr = cls(p)
        pr.push(sol)
        pr.push(sol)
        pr.close()
        text = p.read_text()
        assert marker in text
    gj = json.loads((tmp_path / "t.geojson").read_text())
    assert len(gj["geometry"]["coordinates"]) == 2
    assert abs(gj["geometry"]["coordinates"][0][1] - 41.275) < 1e-6


def test_rinex_obs(tmp_path):
    p = tmp_path / "obs.rnx"
    w = rinex.RinexObsWriter(p, signals=["1C"], approx_pos=(4787678.0, 166130.0, 4197615.0))
    obs = [ChannelObservable(prn=7, signal="1C", t_tx_sv=352800.0,
                             pseudorange_m=21345678.123, carrier_phase_cycles=12345.678,
                             doppler_hz=1234.5, cn0_dbhz=45.2),
           ChannelObservable(prn=11, signal="1C", t_tx_sv=352800.0,
                             pseudorange_m=23456789.456, carrier_phase_cycles=-321.0,
                             doppler_hz=-2345.6, cn0_dbhz=41.0)]
    w.write_epoch(2045, 352800.0, obs)
    w.write_epoch(2045, 352800.1, obs)
    w.close()
    text = p.read_text()
    assert "RINEX VERSION / TYPE" in text
    assert "SYS / # / OBS TYPES" in text
    assert "END OF HEADER" in text
    lines = text.splitlines()
    ep = [l for l in lines if l.startswith(">")]
    assert len(ep) == 2
    assert re.match(r"^> \d{4} \d{2} \d{2} \d{2} \d{2}[ \d.]+  0  2$", ep[0])
    svline = [l for l in lines if l.startswith("G07")][0]
    assert "21345678.123" in svline


def test_rinex_obs_glonass_slot_header(tmp_path):
    """3.02 requires GLONASS SLOT / FRQ # + COD/PHS/BIS when R obs are
    present (rinex_printer.cc GLONASS header blocks). 9 slots: one full
    8-pair line plus one continuation."""
    p = tmp_path / "obs_glo.rnx"
    slots = {1: 1, 2: -4, 3: 5, 4: 6, 5: 1, 6: -4, 7: 5, 8: 6, 9: -2}
    w = rinex.RinexObsWriter(p, signals=["1G"], glo_slots=slots)
    obs = [ChannelObservable(prn=1, signal="1G", t_tx_sv=352800.0,
                             pseudorange_m=19345678.1,
                             carrier_phase_cycles=1000.0,
                             doppler_hz=500.0, cn0_dbhz=44.0)]
    w.write_epoch(2045, 352800.0, obs)
    w.close()
    lines = p.read_text().splitlines()
    slot_lines = [l for l in lines if l.rstrip().endswith("GLONASS SLOT / FRQ #")]
    assert len(slot_lines) == 2
    assert slot_lines[0].startswith("  9 R01  1 R02 -4")
    assert "R09 -2" in slot_lines[1]
    assert slot_lines[1][:3] == "   "        # continuation: blank count
    assert any(l.rstrip().endswith("GLONASS COD/PHS/BIS") for l in lines)
    # header records stay inside the 60-char content field
    for l in slot_lines:
        assert l.index("GLONASS SLOT") == 60


def test_rinex_nav(tmp_path):
    p = tmp_path / "nav.rnx"
    w = rinex.RinexNavWriter(p)
    eph = sample_ephemeris()
    w.write_ephemeris(eph, "G")
    w.write_ephemeris(eph, "G")  # dedup
    w.close()
    text = p.read_text()
    assert "N: GNSS NAV DATA" in text
    body = text.split("END OF HEADER")[1].split("\n", 1)[1]
    assert body.startswith("G07 ")
    assert len(body.strip().splitlines()) == 8
    # quantities round-trip through the D-exponent format
    m = re.findall(r"[ -]\d\.\d{12}D[+-]\d{2}", body)
    assert len(m) >= 28
    sqrt_a_line = body.strip().splitlines()[2]
    assert f"{eph.sqrt_a:.6f}"[:6] in sqrt_a_line.replace("D", "E") or True
    vals = [float(v.replace("D", "E")) for v in re.findall(r"[ -]\d\.\d{12}D[+-]\d{2}", body)]
    assert any(abs(v - eph.sqrt_a) < 1e-6 for v in vals)
    assert any(abs(v - eph.m0) < 1e-9 for v in vals)


def test_rinex_obs_roundtrip_via_reader(tmp_path):
    from gnss_sdr_tpu.receiver.observables import ChannelObservable
    from gnss_sdr_tpu.receiver.pvt.rinex import RinexObsReader, RinexObsWriter
    obs = [ChannelObservable(prn=7, signal="1C", t_tx_sv=352799.93,
                             pseudorange_m=21_936_123.456,
                             carrier_phase_cycles=1234.5,
                             doppler_hz=820.0, cn0_dbhz=44.0),
           ChannelObservable(prn=11, signal="1B", t_tx_sv=352799.92,
                             pseudorange_m=23_101_987.125,
                             carrier_phase_cycles=-321.25,
                             doppler_hz=-1200.5, cn0_dbhz=41.5)]
    p = tmp_path / "o.obs"
    w = RinexObsWriter(p, ["1C", "1B"])
    w.write_epoch(2245, 352800.0, obs)
    w.write_epoch(2245, 352800.02, obs)
    w.close()
    epochs = RinexObsReader(p).read_epochs()
    assert len(epochs) == 2
    (week, tow), rows = epochs[0]
    assert week == 2245 and abs(tow - 352800.0) < 1e-6
    assert rows[0]["system"] == "G" and rows[0]["prn"] == 7
    assert abs(rows[0]["pseudorange_m"] - 21_936_123.456) < 1e-3
    assert rows[1]["system"] == "E" and rows[1]["prn"] == 11
    assert abs(rows[1]["doppler_hz"] + 1200.5) < 1e-3


def test_rinex_211_writer(tmp_path):
    from gnss_sdr_tpu.receiver.observables import ChannelObservable
    from gnss_sdr_tpu.receiver.pvt.rinex import RinexObsWriter
    obs = [ChannelObservable(prn=7, signal="1C", t_tx_sv=352799.93,
                             pseudorange_m=21_936_123.456,
                             carrier_phase_cycles=1234.5,
                             doppler_hz=820.0, cn0_dbhz=44.0)]
    p = tmp_path / "o211.obs"
    w = RinexObsWriter(p, ["1C"], version="2.11")
    w.write_epoch(2245, 352800.0, obs)
    w.close()
    text = p.read_text()
    assert "2.11" in text.splitlines()[0]
    assert "# / TYPES OF OBSERV" in text
    assert "G07" in text
    assert "21936123.456" in text


def test_rinex_nav_mixed_roundtrip(tmp_path):
    """Mixed G/E/C/R nav file round-trips through writer -> reader.

    Reference analog: rinex_printer.h:290-310 (log_rinex_nav overloads for
    GPS/Galileo/BeiDou Kepler records and GLONASS state vectors)."""
    from gnss_sdr_tpu.models.nav.glonass_gnav import GlonassEphemeris

    p = tmp_path / "mixed_nav.rnx"
    w = rinex.RinexNavWriter(p)
    g = sample_ephemeris()
    e = sample_ephemeris()
    e.prn = 11
    e.tgd = 2.3e-9                      # BGD E5a/E1
    c = sample_ephemeris()
    c.prn = 14
    r = GlonassEphemeris(
        slot=5, freq_slot=-3, tb_s=12600.0,
        pos_m=(11_234_567.8, -9_876_543.2, 19_123_456.7),
        vel_m_s=(1234.5678, -2345.6789, 345.6789),
        acc_m_s2=(1.2e-6, -2.3e-6, 0.9e-6),
        gamma_n=3.2e-12, tau_n=-4.5e-7, health=0)
    w.write_ephemeris(g, "G")
    w.write_ephemeris(e, "E")
    w.write_ephemeris(c, "C")
    w.write_ephemeris(r)
    w.close()

    text = p.read_text()
    assert "R05 " in text and "E11 " in text and "C14 " in text
    got = rinex.RinexNavReader(p).read()
    assert set(got) == {("G", g.prn), ("E", 11), ("C", 14), ("R", 5)}
    for system, eph in (("G", g), ("E", e), ("C", c)):
        dec = got[(system, eph.prn)]
        for f in ("sqrt_a", "e", "m0", "omega0", "i0", "omega", "toe",
                  "af0", "af1", "tgd", "delta_n", "omega_dot", "idot"):
            assert abs(getattr(dec, f) - getattr(eph, f)) < 1e-9, (system, f)
        assert dec.week == eph.week and dec.iode == eph.iode
    gr = got[("R", 5)]
    assert gr.tb_s == r.tb_s and gr.freq_slot == r.freq_slot
    np.testing.assert_allclose(gr.pos_m, r.pos_m, atol=1e-3)
    np.testing.assert_allclose(gr.vel_m_s, r.vel_m_s, atol=1e-6)
    np.testing.assert_allclose(gr.acc_m_s2, r.acc_m_s2, atol=1e-12)
    assert abs(gr.tau_n - r.tau_n) < 1e-15
    assert abs(gr.gamma_n - r.gamma_n) < 1e-18
    # the decoded GLONASS record must propagate: position at tb + 900 s
    p1, v1 = gr.position_velocity(r.tb_s + 900.0)
    p2, v2 = r.position_velocity(r.tb_s + 900.0)
    np.testing.assert_allclose(p1, p2, atol=1e-3)


def test_rinex_nav_rejects_unknown_system(tmp_path):
    w = rinex.RinexNavWriter(tmp_path / "bad.rnx")
    with pytest.raises(ValueError):
        w.write_ephemeris(sample_ephemeris(), "R")   # Kepler record as R
    w.close()


def test_rinex_211_nav_writer_reader_roundtrip(tmp_path):
    """RINEX 2.11 GPS nav (reference PVT.rinex_version=2 nav path,
    rinex_printer.cc v2 builders): write + read back field-exact, with
    iono/UTC/leap header lines."""
    from gnss_sdr_tpu.models.ephemeris import IonoParams, UtcParams
    from gnss_sdr_tpu.receiver.pvt.rinex import (RinexNavReader,
                                                 RinexNavWriter)

    eph = sample_ephemeris()
    iono = IonoParams(alpha=(1.2e-8, -7.45e-9, -5.96e-8, 1.19e-7),
                      beta=(96256.0, -32768.0, -196608.0, 196608.0),
                      valid=True)
    utc = UtcParams(a0=-2.79e-9, a1=-7.1e-15, tot=405504.0, wnt=245,
                    delta_t_ls=18, valid=True)
    p = tmp_path / "nav211.rnx"
    w = RinexNavWriter(p, version="2.11", iono=iono, utc=utc)
    w.write_ephemeris(eph, "G")
    w.close()
    text = p.read_text()
    assert "2.11           N: GPS NAV DATA" in text
    assert "ION ALPHA" in text and "ION BETA" in text
    assert "DELTA-UTC: A0,A1,T,W" in text and "LEAP SECONDS" in text
    got = RinexNavReader(p).read()
    assert ("G", eph.prn) in got
    dec = got[("G", eph.prn)]
    for f in ("sqrt_a", "e", "m0", "omega0", "i0", "omega", "omega_dot",
              "delta_n", "idot", "cuc", "cus", "crc", "crs", "cic", "cis",
              "af0", "af1", "af2", "tgd", "toe", "toc"):
        assert abs(getattr(dec, f) - getattr(eph, f)) < 1e-11 * max(
            1.0, abs(getattr(eph, f))), f
    assert dec.week == eph.week and dec.iode == eph.iode
    # orbits agree
    import numpy as np
    p1, _ = dec.position_velocity(eph.toe + 300.0)
    p2, _ = eph.position_velocity(eph.toe + 300.0)
    assert np.linalg.norm(p1 - p2) < 1e-4


def test_rinex_211_nav_rejects_non_gps(tmp_path):
    from gnss_sdr_tpu.models.nav.glonass_gnav import GlonassEphemeris
    from gnss_sdr_tpu.receiver.pvt.rinex import RinexNavWriter
    import pytest as _pytest

    w = RinexNavWriter(tmp_path / "nav211b.rnx", version="2.11")
    with _pytest.raises(ValueError, match="GPS-only"):
        w.write_ephemeris(sample_ephemeris(), "E")
    with _pytest.raises(ValueError, match="GPS-only"):
        w.write_ephemeris(GlonassEphemeris(slot=1, tb_s=900.0,
                                           pos_m=(1e7, 1e7, 1e7),
                                           vel_m_s=(1e3, 1e3, 1e3),
                                           acc_m_s2=(0, 0, 0)), "R")
    w.close()


def test_rinex_302_nav_correction_headers(tmp_path):
    from gnss_sdr_tpu.models.ephemeris import IonoParams, UtcParams
    from gnss_sdr_tpu.receiver.pvt.rinex import RinexNavWriter

    iono = IonoParams(alpha=(1e-8, 0, 0, 0), beta=(90112.0, 0, 0, 0),
                      valid=True)
    utc = UtcParams(a0=1e-9, a1=0.0, tot=61440.0, wnt=245, delta_t_ls=18,
                    valid=True)
    p = tmp_path / "nav302.rnx"
    w = RinexNavWriter(p, version="3.02", iono=iono, utc=utc)
    w.write_ephemeris(sample_ephemeris(), "G")
    w.close()
    text = p.read_text()
    assert "IONOSPHERIC CORR" in text
    assert "TIME SYSTEM CORR" in text
    assert "LEAP SECONDS" in text


def test_nmea_gsv_golden():
    """GSV against a canonical documented GPS receiver frame (the widely
    published 11-satellite GPGSV example), checksums included — not a
    round-trip of our own encoder."""
    sats = [
        (3, 3, 111, 0), (4, 15, 270, 0), (6, 1, 10, 0), (13, 6, 292, 0),
        (14, 25, 170, 0), (16, 57, 208, 39), (18, 67, 296, 40),
        (19, 40, 246, 0),
        (22, 42, 67, 42), (24, 14, 311, 43), (27, 5, 244, 0),
    ]
    out = nmea.gsv(sats)
    assert out[0].strip() == ("$GPGSV,3,1,11,03,03,111,00,04,15,270,00,"
                              "06,01,010,00,13,06,292,00*74")
    assert out[1].strip() == ("$GPGSV,3,2,11,14,25,170,00,16,57,208,39,"
                              "18,67,296,40,19,40,246,00*74")
    assert out[2].strip() == ("$GPGSV,3,3,11,22,42,067,42,24,14,311,43,"
                              "27,05,244,00,,,,*4D")


def test_nmea_gsv_from_solution(sol):
    """sats_in_view derives el/az from the ephemeris store at the fix."""
    import dataclasses as _dc
    from gnss_sdr_tpu.utils import scenario as scen
    sc = scen.build_gps_l1_scenario(duration_s=1.0, n_sats=4, fs=2.0e6)
    keyed = {("G", p): sc.ephemerides[p] for p in sc.prns}
    s = _dc.replace(sol, pos_ecef=sc.rcv_ecef, tow_s=sc.t0_gps) \
        if _dc.is_dataclass(sol) else sol
    rows = nmea.sats_in_view(s, keyed, {sc.prns[0]: 45.0})
    assert len(rows) == 4
    for prn, el, az, cn0 in rows:
        assert 0.0 <= el <= 90.0 and 0.0 <= az < 360.0
    sentences = nmea.gsv(rows)
    assert sentences and sentences[0].startswith("$GPGSV,1,1,04,")


def test_rinex_sbas_geo_nav_record(tmp_path):
    """MT9 GEO nav -> RINEX 3.02 'S' record, hand-checked field layout
    (rinex_printer.cc SBAS nav analog: epoch + aGf0/aGf1/Ttom, state
    vector in km, health/URA/IODN trailers; RINEX SBAS id = PRN - 100)."""
    import datetime
    from gnss_sdr_tpu.models.nav.sbas import SbasGeoEphemeris

    eph = SbasGeoEphemeris(
        prn=123, iodn=7, t0_s=43200.0, ura=3,
        pos_m=(26_000_123.4, -34_000_456.7, 12_345.6),
        vel_m_s=(0.5, -1.25, 0.004),
        acc_m_s2=(1.25e-5, 0.0, -6.25e-5),
        agf0_s=2.5e-8, agf1_s_s=3.0e-12)
    p = tmp_path / "sbas.nav"
    w = rinex.RinexNavWriter(p)
    w.write_ephemeris(eph, glonass_date=datetime.date(2021, 3, 4))
    w.close()
    lines = p.read_text().splitlines()
    body = [ln for ln in lines if ln.startswith("S") or ln.startswith("    ")]
    rec = [ln for ln in lines if ln.startswith("S23")]
    assert rec, lines
    head = rec[0]
    assert head.startswith("S23 2021 03 04 12 00 00")
    # aGf0 field, D exponent
    assert "2.500000000000D-08" in head
    i = lines.index(head)
    # X in km, velocity in km/s, acceleration in km/s^2 (the GLONASS
    # state-vector convention the SBAS records share)
    assert "2.600012340000D+04" in lines[i + 1]
    assert "5.000000000000D-04" in lines[i + 1]
    assert "1.250000000000D-08" in lines[i + 1]
    # URA on the Y line, IODN on the Z line
    assert "3.000000000000D+00" in lines[i + 2]
    assert "7.000000000000D+00" in lines[i + 3]


def test_sbas_geo_nav_message_roundtrip_through_telemetry():
    """MT9 encodes into the MOPS stream and the SBAS telemetry decoder
    recovers the GEO ephemeris (stream-level, through FEC + CRC)."""
    from gnss_sdr_tpu.models.nav import sbas as sb

    eph = sb.SbasGeoEphemeris(prn=122, iodn=3, t0_s=7200.0,
                              pos_m=(26.1e6, -3.41e7, 5000.0),
                              vel_m_s=(0.1, 0.2, -0.3),
                              agf0_s=1e-8, agf1_s_s=0.0)
    msgs = [(9, sb.encode_type9_geo_nav(eph)), (9, sb.encode_type9_geo_nav(eph))]
    sym = sb.encode_stream(msgs)
    got = sb.decode_stream(np.where(sym > 0, 1.0, -1.0))
    assert got
    _, mtype, data = got[0]
    assert mtype == 9
    d = sb.parse_type9_geo_nav(data, prn=122)
    assert abs(d.pos_m[1] - eph.pos_m[1]) < 0.4
    assert abs(d.agf0_s - eph.agf0_s) < 2.0 ** -31
    p, v = d.position_velocity(7230.0)
    assert abs(p[0] - (26.1e6 + 0.1 * 30)) < 1.0
