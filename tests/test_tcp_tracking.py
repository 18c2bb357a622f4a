"""TCP-connector tracking: wire protocol + closed loop through a TCP peer.

Reference analogs: gps_l1_ca_tcp_connector_tracking_cc.cc (epoch loop and
NCO command application), tcp_communication.cc (packet exchange),
tcp_packet_data.h (field layout). The closed-loop test plays the role of
the reference's MATLAB helper on the other end of the socket.
"""

import socket
import struct
import threading

import numpy as np
import pytest

from gnss_sdr_tpu import constants
from gnss_sdr_tpu.config.ini import InMemoryConfiguration, receiver_config_from_ini
from gnss_sdr_tpu.io.sources import ArraySignalSource
from gnss_sdr_tpu.models import codes
from gnss_sdr_tpu.receiver import tcp_tracking as tcp
from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
from gnss_sdr_tpu.utils import generator

SPEC = constants.GPS_L1_CA
FS = 2.5e6
FD_TRUE = 1234.0
DELAY_S = 0.0003


def _capture(duration_s: float, seed: int = 3) -> np.ndarray:
    rng = np.random.default_rng(1)
    bits = generator.lnav_bits_to_symbols(rng.integers(0, 2, 200))
    return generator.generate(
        SPEC, [generator.SatParams(prn=7, cn0_dbhz=48.0, doppler_hz=FD_TRUE,
                                   code_delay_s=DELAY_S, data_bits=bits)],
        FS, duration_s, seed=seed)


def test_wire_format_gps_l1():
    """TX is 9 float32 LE [id, E, L, P (re/im), acq_doppler, enable]; RX is
    4 float32 [id_echo, code_error, carr_error, doppler] — the exact layout
    of tcp_packet_data.h / NUM_TX_VARIABLES_GPS_L1_CA."""
    x = _capture(0.12)
    eng = tcp.TcpTrackingEngine(spec=SPEC, fs=FS, n_channels=1, n_steps=55,
                                n_max=int(FS * 1e-3) + 64, port_ch0=0)
    got: list = []

    def raw_peer():
        s = socket.create_connection(("127.0.0.1", eng.ports[0]), timeout=10)
        try:
            while True:
                buf = b""
                while len(buf) < 36:
                    part = s.recv(36 - len(buf))
                    if not part:
                        return
                    buf += part
                pkt = struct.unpack("<9f", buf)
                if pkt[8] == 0.0:
                    return
                got.append(pkt)
                # echo the control id, command no corrections
                s.sendall(struct.pack("<4f", pkt[0], 0.0, 0.0, pkt[7]))
        finally:
            s.close()

    t = threading.Thread(target=raw_peer, daemon=True)
    t.start()
    eng.start_channel(0, code_table=codes.code_chips("1C", 7),
                      code_freq=SPEC.code_rate_cps, doppler_hz=FD_TRUE,
                      sample_offset=round(DELAY_S * FS))
    chunk_len = int(FS * 0.05)
    eng.process_chunk(x[: chunk_len + eng.n_max], chunk_len)
    eng.close()
    t.join(timeout=5)
    assert len(got) >= 40
    ids = [p[0] for p in got]
    assert ids == sorted(ids) and ids[0] == 1.0   # control id counts from 1
    for p in got:
        assert p[7] == pytest.approx(FD_TRUE)     # acq Doppler every packet
        assert p[8] == 1.0                        # enable flag
    # on-peak epochs: prompt power well above the +-0.5-chip taps
    powers = np.array([[p[1] ** 2 + p[2] ** 2, p[3] ** 2 + p[4] ** 2,
                        p[5] ** 2 + p[6] ** 2] for p in got[5:]])
    # +-0.5-chip taps correlate at ~0.5 amplitude (power 1/4) against the
    # floor-sampled code, so 2x is the robust dominance bound here
    assert np.median(powers[:, 2]) > 2 * np.median(powers[:, 0])
    assert np.median(powers[:, 2]) > 2 * np.median(powers[:, 1])


def test_closed_loop_convergence():
    """Loop filters running in the external peer keep code and carrier
    locked: the analog of the reference block driven by its MATLAB side."""
    x = _capture(1.6)
    eng = tcp.TcpTrackingEngine(spec=SPEC, fs=FS, n_channels=1, n_steps=55,
                                n_max=int(FS * 1e-3) + 64, port_ch0=0)
    peer = tcp.LoopFilterPeer(eng.ports[0], code_period_s=1e-3)
    peer.start()
    doppler_acq = FD_TRUE + 40.0          # half an acq bin of initial error
    code_freq = SPEC.code_rate_cps * (1 + doppler_acq / SPEC.carrier_freq_hz)
    eng.start_channel(0, code_table=codes.code_chips("1C", 7),
                      code_freq=code_freq, doppler_hz=doppler_acq,
                      sample_offset=round(DELAY_S * FS))
    chunk_len = int(FS * 0.05)
    base = 0
    rows = []
    for _ in range(30):
        f32, i32, _ = eng.process_chunk(
            x[base: base + chunk_len + eng.n_max], chunk_len)
        base += chunk_len
        v = f32[:, 0, 8] > 0.5
        for s in np.nonzero(v)[0]:
            rows.append((base - chunk_len + i32[s, 0, 1], f32[s, 0, 2],
                         f32[s, 0, 4], f32[s, 0, 6]))
    eng.close()
    if peer.error:
        raise peer.error
    true_codef = SPEC.code_rate_cps * (1 + FD_TRUE / SPEC.carrier_freq_hz)
    tail = rows[-100:]
    # carrier: within a few Hz of truth after pull-in
    dops = np.array([r[2] for r in tail])
    assert abs(np.median(dops) - FD_TRUE) < 3.0
    # code: replica phase within 0.02 chips of the signal's true phase
    errs = []
    for s0, rem, _, _ in tail:
        chip_true = ((s0 / FS - DELAY_S) * true_codef) % 1023.0
        d = (chip_true - rem) % 1023.0
        errs.append(d - 1023.0 if d > 511 else d)
    assert np.median(np.abs(errs)) < 0.02
    # C/N0 estimator near the simulated 48 dB-Hz
    cn0 = np.array([r[3] for r in tail])
    assert 42.0 < np.median(cn0) < 54.0


def test_ini_maps_tcp_connector_implementation():
    conf = InMemoryConfiguration({
        "GNSS-SDR.internal_fs_sps": "2500000",
        "Channels_1C.count": "2",
        "Tracking_1C.implementation": "GPS_L1_CA_TCP_CONNECTOR_Tracking",
        "Tracking_1C.port_ch0": "0",
    })
    cfg = receiver_config_from_ini(conf)
    assert cfg.tcp_connector
    gp = dict(cfg.group_params)
    assert dict(gp["1C"])["tcp_port_ch0"] == 0


def test_receiver_runs_tcp_connector_group():
    """Full Receiver drive: acquisition hands off to the TCP engine, the
    peer closes the loops, records/telemetry accumulate as usual."""
    x = _capture(1.2, seed=5)
    rx = Receiver(ReceiverConfig(
        signal="1C", fs=FS, n_channels=1, prns=(7,), chunk_ms=50,
        tcp_connector=True, tcp_port_ch0=0))
    g = rx.groups[0]
    peers = [tcp.LoopFilterPeer(p, code_period_s=1e-3)
             for p in g.tcp_engine.ports]
    for p in peers:
        p.start()
    rx.run_source(ArraySignalSource(x, FS))
    ch = g.channels[0]
    assert ch.state == "tracking" and ch.prn == 7
    assert len(ch.records) > 0
    last = ch.records[-1]
    assert abs(last.carrier_freq - FD_TRUE) < 5.0
    assert last.cn0_dbhz > 40.0
    rx.close()
    for p in peers:
        if p.error:
            raise p.error
