"""Control plane tests: telecommand TCP server, assistance checkpoint/restore,
standby/coldstart dispatch.

Reference analogs: control_thread_test.cc, tcp cmd interface behavior.
"""

import socket
import time

import numpy as np
import pytest

from gnss_sdr_tpu.models.ephemeris import IonoParams
from gnss_sdr_tpu.receiver import control
from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig

from test_lnav import sample_ephemeris


def _send(port, line):
    s = socket.create_connection(("127.0.0.1", port), timeout=3)
    f = s.makefile("rw")
    f.write(line + "\n")
    f.flush()
    reply = f.readline().strip()
    s.close()
    return reply


def test_telecommand_server():
    q = control.ControlQueue()
    srv = control.TelecommandServer(q, status_fn=lambda: "STATUS-OK")
    try:
        assert _send(srv.port, "status") == "STATUS-OK"
        assert _send(srv.port, "standby") == "OK: standby"
        assert _send(srv.port, "coldstart") == "OK: coldstart"
        assert _send(srv.port, "set_ch_satellite 2 17") == "OK: set_ch_satellite"
        assert _send(srv.port, "bogus").startswith("ERROR")
        time.sleep(0.1)
        cmds = q.pop_all()
        names = [c.command for c in cmds]
        assert names == ["standby", "coldstart", "set_ch_satellite"]
        assert cmds[2].args == (2, 17)
    finally:
        srv.close()


def test_assistance_roundtrip(tmp_path):
    eph = sample_ephemeris()
    iono = IonoParams(alpha=(1e-8, 2e-8, -1e-7, 3e-8),
                      beta=(88064.0, 0.0, -196608.0, 0.0), valid=True)
    p = tmp_path / "assist.json"
    from gnss_sdr_tpu.models.almanac import GpsAlmanac
    alm = GpsAlmanac.from_ephemeris(eph)
    control.save_assistance(p, {7: eph}, iono,
                            almanacs={("G", eph.prn): alm},
                            position_ecef=np.array([4.7e6, 1.6e5, 4.1e6]),
                            tow_s=345601.5)
    a = control.load_assistance(p)
    ephs, iono2 = a.ephemerides, a.iono
    assert ("G", 7) in ephs
    assert ephs[("G", 7)].sqrt_a == eph.sqrt_a
    assert ephs[("G", 7)].m0 == eph.m0
    assert iono2.valid and iono2.alpha == iono.alpha
    # warm-start state round-trips: almanac + position + time
    assert a.almanacs[("G", eph.prn)].sqrt_a == alm.sqrt_a
    assert a.almanacs[("G", eph.prn)].toa == alm.toa
    np.testing.assert_allclose(a.position_ecef, [4.7e6, 1.6e5, 4.1e6])
    assert a.tow_s == 345601.5
    # missing file -> empty
    a3 = control.load_assistance(tmp_path / "nope.json")
    assert a3.ephemerides == {} and a3.iono is None
    assert a3.almanacs == {} and a3.position_ecef is None


def test_receiver_command_dispatch():
    rng = np.random.default_rng(0)
    cfg = ReceiverConfig(signal="1C", fs=1.023e6, n_channels=2, chunk_ms=20,
                         prns=(1, 2))
    rx = Receiver(cfg)
    noise = (rng.standard_normal(cfg.fs.__int__() // 10)
             + 1j * rng.standard_normal(int(cfg.fs) // 10)).astype(np.complex64)
    rx.control_queue.push(control.CommandEvent("standby"))
    rx.process(noise)
    assert rx.standby
    rx.control_queue.push(control.CommandEvent("coldstart"))
    rx.process(noise)
    assert not rx.standby
    rx.control_queue.push(control.CommandEvent("reset"))
    rx.process(noise)
    assert rx.restart_requested
    assert "NO FIX" in rx.status_text()


def test_reset_stops_run_loop(tmp_path):
    """The reset telecommand aborts the chunk loop early (reference: the
    restart path, control_thread.cc:381) — both the plain and the
    double-buffered run loops must honor it."""
    rng = np.random.default_rng(1)
    fs = 1.023e6
    raw = (rng.standard_normal(int(fs)) * 40).astype(np.int16)  # ~0.5 s I/Q
    f = tmp_path / "noise.dat"
    raw.tofile(f)
    from gnss_sdr_tpu.io.sources import FileSignalSource
    for double_buffer in (False, True):
        cfg = ReceiverConfig(signal="1C", fs=fs, n_channels=1, chunk_ms=20,
                             prns=(1,))
        rx = Receiver(cfg)
        rx.control_queue.push(control.CommandEvent("reset"))
        src = FileSignalSource(str(f), item_type="ishort",
                               sampling_frequency=fs)
        rx.run_file_source(src, double_buffer=double_buffer)
        assert rx.restart_requested
        # reset fired on the first chunk; the loop must not consume the file
        assert rx._sample_base <= 2 * rx.chunk_len


def test_stop_command_halts_without_restart(tmp_path):
    """The stop/quit command (keyboard 'q', control_thread.h:180) ends the
    run loop like reset but does NOT request a harness restart."""
    rng = np.random.default_rng(2)
    fs = 1.023e6
    raw = (rng.standard_normal(int(fs)) * 40).astype(np.int16)
    f = tmp_path / "noise.dat"
    raw.tofile(f)
    from gnss_sdr_tpu.io.sources import FileSignalSource
    for double_buffer in (False, True):
        cfg = ReceiverConfig(signal="1C", fs=fs, n_channels=1, chunk_ms=20,
                             prns=(1,))
        rx = Receiver(cfg)
        rx.control_queue.push(control.CommandEvent("stop"))
        src = FileSignalSource(str(f), item_type="ishort",
                               sampling_frequency=fs)
        rx.run_file_source(src, double_buffer=double_buffer)
        assert rx.stop_requested and not rx.restart_requested
        assert rx._sample_base <= 2 * rx.chunk_len


def test_periodic_status_report(caplog):
    """GNSS-SDR.status_period_s logs the channel/fix status every N seconds
    of stream time (reference: the channel status collector feeding the
    monitors, channel_status_msg_receiver.cc)."""
    import logging
    rng = np.random.default_rng(3)
    fs = 1.023e6
    cfg = ReceiverConfig(signal="1C", fs=fs, n_channels=1, chunk_ms=100,
                         prns=(1,), status_period_s=0.3)
    rx = Receiver(cfg)
    noise = (rng.standard_normal(int(fs)) +
             1j * rng.standard_normal(int(fs))).astype(np.complex64)
    with caplog.at_level(logging.INFO, logger="gnss_sdr_tpu"):
        rx.process(noise)                      # 1 s -> 3 status lines
    lines = [r.message for r in caplog.records if "status @" in r.message]
    assert len(lines) == 3, lines
    assert "NO FIX" in lines[0]


def test_cli_reset_returns_42(tmp_path):
    """End-to-end restart-harness contract: a `reset` sent over the
    telecommand TCP interface makes the CLI exit with code 42 (reference
    main.cc + gnss-sdr-harness.sh)."""
    import socket as socket_mod
    import threading

    from gnss_sdr_tpu import __main__ as cli

    rng = np.random.default_rng(2)
    fs = 1.023e6
    raw = (rng.standard_normal(int(fs) * 4) * 40).astype(np.int16)  # ~2 s I/Q
    data = tmp_path / "noise.dat"
    raw.tofile(data)
    # pick a free port for the command server
    probe = socket_mod.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()
    conf = tmp_path / "rx.conf"
    conf.write_text(f"""
[GNSS-SDR]
GNSS-SDR.internal_fs_sps={int(fs)}
GNSS-SDR.telecommand_enabled=true
GNSS-SDR.telecommand_tcp_port={port}
SignalSource.implementation=File_Signal_Source
SignalSource.filename={data}
SignalSource.item_type=ishort
SignalSource.sampling_frequency={int(fs)}
Channels_1C.count=1
Channels.in_acquisition=1
PVT.implementation=RTKLIB_PVT
""")

    def send_reset():
        deadline = time.time() + 30
        while time.time() < deadline:
            try:
                assert _send(port, "reset") == "OK: reset"
                return
            except OSError:
                time.sleep(0.1)

    t = threading.Thread(target=send_reset, daemon=True)
    t.start()
    rc = cli.main(["-c", str(conf)])
    t.join(timeout=5)
    assert rc == 42


def test_receiver_checkpoint_restore(tmp_path):
    cfg = ReceiverConfig(signal="1C", fs=1.023e6, n_channels=1)
    rx = Receiver(cfg)
    rx.ephemerides[("G", 7)] = sample_ephemeris()
    p = tmp_path / "ck.json"
    rx.checkpoint(p)
    rx2 = Receiver(cfg)
    rx2.restore(p)
    assert ("G", 7) in rx2.ephemerides
    assert rx2.ephemerides[("G", 7)].toe == rx.ephemerides[("G", 7)].toe


def test_predicted_doppler():
    from gnss_sdr_tpu.utils import constellation
    from gnss_sdr_tpu.receiver.pvt import geodesy
    ephs = constellation.almanac_constellation()
    rcv = geodesy.geodetic_to_ecef(np.deg2rad(41.275), np.deg2rad(1.9876), 80.0)
    vis = constellation.visible_sats(ephs, rcv, 354000.0)
    prn = vis[0][0]
    fd = control.predicted_doppler(ephs[prn], rcv, 354000.0, 1.57542e9)
    # compare with the full observation simulator
    o = constellation.simulate_observation(ephs[prn], rcv, 354000.0)
    assert abs(fd - o.doppler_hz) < 30.0   # clock-drift term excluded
    assert abs(fd) < 5000.0


def test_assisted_warm_start_acquisition():
    """Warm start (reference assist_GNSS + pcps_assisted_acquisition): with
    restored ephemerides and a position estimate, acquisition searches a
    narrow Doppler window around the per-satellite prediction and still
    finds every satellite."""
    import numpy as np
    from gnss_sdr_tpu.receiver.pvt import solver as pvt_solver
    from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
    from gnss_sdr_tpu.io.sources import ArraySignalSource
    from gnss_sdr_tpu.utils import scenario as scen

    sc = scen.build_gps_l1_scenario(duration_s=2.0, n_sats=5, cn0_dbhz=47.0,
                                    fs=2.0e6)
    x = sc.generate(seed=81)
    cfg = ReceiverConfig(signal="1C", fs=sc.fs, n_channels=5,
                         prns=tuple(sc.prns), chunk_ms=100,
                         acq_assisted=True, acq_two_step=False,
                         pvt_apply_tropo=False, pvt_apply_iono=False)
    rx = Receiver(cfg)
    # warm-start state: assistance + a prior fix at the true position/time
    for p in sc.prns:
        rx.ephemerides[("G", p)] = sc.ephemerides[p]
    rx.fixes.append(pvt_solver.PvtSolution(
        valid=True, pos_ecef=sc.rcv_ecef.copy(), vel_ecef=np.zeros(3),
        tow_s=sc.t0_gps, week=sc.ephemerides[sc.prns[0]].week, n_sats=5))
    # sanity: every prediction lands within the narrow assisted window
    preds = rx._predicted_dopplers(rx.groups[0], list(sc.prns))
    assert preds is not None
    for prn, fd_pred in zip(sc.prns, preds):
        sat = next(s for s in sc.sats if s.prn == prn)
        assert abs(fd_pred - sat.doppler_hz) < 200.0, (prn, fd_pred)
    rx.run_source(ArraySignalSource(x, sc.fs))
    assert len(set(rx.tracked_prns()) & set(sc.prns)) >= 4
