"""Output-product wiring: printers, RTCM server and monitors attached from
configuration (reference: rtklib_pvt_gs output instantiation)."""

import socket
import time

import numpy as np

from gnss_sdr_tpu.config.ini import InMemoryConfiguration
from gnss_sdr_tpu.receiver.observables import ChannelObservable
from gnss_sdr_tpu.receiver.outputs import attach_outputs
from gnss_sdr_tpu.receiver.pvt import rtcm
from gnss_sdr_tpu.receiver.pvt.solver import PvtSolution
from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig

from test_lnav import sample_ephemeris


def _solution():
    return PvtSolution(
        valid=True, pos_ecef=np.array([4797671.3, 166498.8, 4185477.1]),
        vel_ecef=np.zeros(3), tow_s=352800.0, week=2245, n_sats=6,
        gdop=2.0, pdop=1.7, hdop=1.1, vdop=1.3,
        lat_rad=np.deg2rad(41.275), lon_rad=np.deg2rad(1.9876),
        height_m=80.0)


def _observables():
    return [ChannelObservable(prn=7, signal="1C", t_tx_sv=352799.93,
                              pseudorange_m=21_936_123.4,
                              carrier_phase_cycles=1234.5,
                              doppler_hz=820.0, cn0_dbhz=44.0),
            ChannelObservable(prn=13, signal="1C", t_tx_sv=352799.92,
                              pseudorange_m=23_101_987.1,
                              carrier_phase_cycles=-321.25,
                              doppler_hz=-1200.0, cn0_dbhz=41.5)]


def test_attach_outputs_files_and_rtcm(tmp_path):
    conf = InMemoryConfiguration()
    conf.set_property("PVT.nmea_dump_filename", str(tmp_path / "out.nmea"))
    conf.set_property("PVT.kml_filename", str(tmp_path / "out.kml"))
    conf.set_property("PVT.gpx_filename", str(tmp_path / "out.gpx"))
    conf.set_property("PVT.geojson_filename", str(tmp_path / "out.geojson"))
    conf.set_property("PVT.rinex_obs_filename", str(tmp_path / "out.obs"))
    conf.set_property("PVT.rinex_nav_filename", str(tmp_path / "out.nav"))
    conf.set_property("PVT.flag_rtcm_server", True)
    conf.set_property("PVT.rtcm_tcp_port", 0)      # ephemeral
    conf.set_property("PVT.rtcm_station_id", 77)

    rx = Receiver(ReceiverConfig(fs=2.0e6, n_channels=2))
    rx.ephemerides[("G", 7)] = sample_ephemeris()
    outputs = attach_outputs(rx, conf)
    srv = outputs.rtcm_server

    cli = socket.create_connection(("127.0.0.1", srv.port), timeout=2.0)
    time.sleep(0.3)

    sol = _solution()
    obs = _observables()
    rx.fixes.append(sol)
    for sink in rx.fix_sinks:
        sink(sol)
    for sink in rx.obs_sinks:
        sink(123456, obs)

    cli.settimeout(2.0)
    data = b""
    t0 = time.time()
    while time.time() - t0 < 2.0:
        try:
            chunk = cli.recv(8192)
        except socket.timeout:
            break
        if not chunk:
            break
        data += chunk
        if len(rtcm.deframe(data)) >= 3:
            break
    msgs = [rtcm.message_number(p) for p in rtcm.deframe(data)]
    assert 1005 in msgs
    assert 1019 in msgs
    assert rtcm.MSM7_GPS in msgs
    # MSM7 payload must reconstruct the pseudoranges
    for p in rtcm.deframe(data):
        if rtcm.message_number(p) == rtcm.MSM7_GPS:
            hdr, dec = rtcm.decode_msm7(p)
            by_prn = {o.prn: o for o in dec}
            assert abs(by_prn[7].pseudorange_m - obs[0].pseudorange_m) < 0.01
            assert abs(by_prn[13].pseudorange_m - obs[1].pseudorange_m) < 0.01
    cli.close()
    outputs.close()

    assert "GGA" in (tmp_path / "out.nmea").read_text()
    assert "coordinates" in (tmp_path / "out.kml").read_text()
    assert "trkpt" in (tmp_path / "out.gpx").read_text()
    assert "Point" in (tmp_path / "out.geojson").read_text() or \
           "LineString" in (tmp_path / "out.geojson").read_text()
    assert "END OF HEADER" in (tmp_path / "out.obs").read_text()
    nav_text = (tmp_path / "out.nav").read_text()
    assert "END OF HEADER" in nav_text and len(nav_text.splitlines()) > 10


def test_sbas_fast_corrections_applied_in_pvt(monkeypatch):
    """A tracked SBAS channel's fast corrections must be added to the
    matching GPS pseudoranges before the solver (PR + PRC, DO-229)."""
    from gnss_sdr_tpu.receiver import receiver as rxmod

    rx = Receiver(ReceiverConfig(fs=2.0e6, n_channels=2))
    ch = rx.groups[0].channels[0]
    ch.state = "tracking"
    ch.prn = 120

    class FakeSbas:
        prn_mask = [7, 13, 21]
        fast_corrections = {0: +3.25, 2: -1.5}
        def ephemeris(self):
            return None
        assembler = type("A", (), {"iono": None})()
    ch.telemetry = FakeSbas()

    seen = {}
    def fake_solve(inputs, ephs, **kw):
        seen["pr"] = {i.prn: i.pseudorange_m for i in inputs}
        from gnss_sdr_tpu.receiver.pvt.solver import PvtSolution
        return PvtSolution(valid=False)
    monkeypatch.setattr(rxmod.pvt_solver, "solve_pvt", fake_solve)

    obs = _observables()                  # PRNs 7 and 13 on 1C
    rx._run_pvt(obs)
    assert abs(seen["pr"][7] - (obs[0].pseudorange_m + 3.25)) < 1e-9
    assert abs(seen["pr"][13] - obs[1].pseudorange_m) < 1e-9   # slot 1 absent


def test_protobuf_monitors_wire_format():
    """Protobuf monitors serialize the reference's documented wire schema
    (docs/protobuf/gnss_synchro.proto + monitor_pvt.proto): datagrams parse
    with the generated classes and carry the right fields."""
    import socket as sock_mod
    from gnss_sdr_tpu.io import monitor_pb2
    from gnss_sdr_tpu.io.monitor import (ProtobufGnssSynchroMonitor,
                                         ProtobufPvtMonitor)
    from gnss_sdr_tpu.receiver.observables import ChannelObservable

    rxsock = sock_mod.socket(sock_mod.AF_INET, sock_mod.SOCK_DGRAM)
    rxsock.bind(("127.0.0.1", 0))
    rxsock.settimeout(2.0)
    port = rxsock.getsockname()[1]

    mon = ProtobufGnssSynchroMonitor([("127.0.0.1", port)], fs=2e6)
    obs = [ChannelObservable(prn=17, signal="1C", t_tx_sv=352800.1,
                             pseudorange_m=21_345_678.9,
                             carrier_phase_cycles=123.25, doppler_hz=-812.5,
                             cn0_dbhz=44.5)]
    mon.push(123456, obs)
    data, _ = rxsock.recvfrom(65536)
    msg = monitor_pb2.Observables()
    msg.ParseFromString(data)
    assert len(msg.observable) == 1
    s = msg.observable[0]
    assert s.prn == 17 and s.system == "G" and s.signal == "1C"
    assert abs(s.pseudorange_m - 21_345_678.9) < 1e-6
    assert abs(s.carrier_doppler_hz + 812.5) < 1e-9
    assert s.fs == 2_000_000 and s.flag_valid_pseudorange

    pvt_mon = ProtobufPvtMonitor([("127.0.0.1", port)])
    sol = _solution()
    pvt_mon.push(sol)
    data, _ = rxsock.recvfrom(65536)
    m = monitor_pb2.MonitorPvt()
    m.ParseFromString(data)
    assert m.week == sol.week
    assert abs(m.pos_x - sol.pos_ecef[0]) < 1e-6
    assert m.valid_sats == sol.n_sats
    assert abs(m.latitude - np.degrees(sol.lat_rad)) < 1e-9
    rxsock.close()
    mon.sink.close()
    pvt_mon.sink.close()
