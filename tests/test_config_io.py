"""Config system, signal sources, FIR conditioner, monitor tests.

Reference analogs: control-plane unit tests (file_configuration_test.cc,
in_memory_configuration_test.cc) and source/adapter tests.
"""

import json
import socket

import numpy as np
import pytest
import jax.numpy as jnp

from gnss_sdr_tpu.config import ini
from gnss_sdr_tpu.io import sources
from gnss_sdr_tpu.ops import fir, iq

from conftest import REFERENCE_SAMPLES


def test_in_memory_configuration():
    c = ini.InMemoryConfiguration()
    c.set_property("Tracking_1C.pll_bw_hz", 35.0)
    c.set_property("Channels_1C.count", 8)
    c.set_property("SignalSource.repeat", "true")
    assert c.property("Tracking_1C.pll_bw_hz", 40.0) == 35.0
    assert c.property("Channels_1C.count", 0) == 8
    assert c.property("SignalSource.repeat", False) is True
    assert c.property("missing.key", 7) == 7
    assert c.is_present("Channels_1C.count")


def test_file_configuration(tmp_path):
    p = tmp_path / "rx.conf"
    p.write_text("""
; comment
[GNSS-SDR]
GNSS-SDR.internal_fs_sps=2000000
SignalSource.item_type=ishort ; trailing comment
Channels_1C.count=8
Acquisition_1C.doppler_max=10000
Tracking_1C.pll_bw_hz=40.0;
""")
    c = ini.FileConfiguration(p)
    assert c.property("GNSS-SDR.internal_fs_sps", 0) == 2_000_000
    assert c.property("SignalSource.item_type", "") == "ishort"
    assert c.property("Tracking_1C.pll_bw_hz", 0.0) == 40.0
    rc = ini.receiver_config_from_ini(c)
    assert rc.signal == "1C" and rc.n_channels == 8
    assert rc.fs == 2_000_000.0
    assert rc.acq_doppler_max_hz == 10000.0


def test_reference_conf_parses():
    import pathlib
    ref = pathlib.Path("/root/reference/conf/gnss-sdr_GPS_L1_ishort.conf")
    if not ref.exists():
        pytest.skip("reference conf not present")
    c = ini.FileConfiguration(ref)
    rc = ini.receiver_config_from_ini(c)
    assert rc.fs == 2_000_000.0
    assert rc.n_channels == 8
    assert rc.pll_bw_hz == 40.0 and rc.dll_bw_hz == 4.0


def test_every_reference_conf_parses_or_cleanly_rejects():
    """Config-system parity sweep: EVERY conf file the reference ships
    (reference conf/*.conf, the user-facing configuration surface) must
    either build a valid ReceiverConfig or be rejected with a clear
    UnknownBlockError naming the missing hardware driver / unsupported
    block (reference gnss_block_factory.cc:1234 GetBlock vocabulary).
    Anything else (KeyError, ValueError, silent misparse) is a config
    system gap."""
    import pathlib

    from gnss_sdr_tpu.config.registry import UnknownBlockError

    confs = sorted(pathlib.Path("/root/reference/conf").glob("*.conf"))
    if not confs:
        pytest.skip("reference conf dir not present")
    parsed, rejected, bad = [], [], []
    for p in confs:
        try:
            rc = ini.receiver_config_from_ini(ini.FileConfiguration(p))
            assert rc.fs > 0 and rc.n_channels > 0
            parsed.append(p.name)
        except UnknownBlockError as e:
            msg = str(e)
            if "driver" in msg or "unknown block" in msg:
                rejected.append(p.name)
            else:
                bad.append((p.name, msg))
        except Exception as e:  # noqa: BLE001 — the point is to catch all
            bad.append((p.name, f"{type(e).__name__}: {e}"))
    assert not bad, f"unclear conf failures: {bad}"
    # the reference ships 68 confs; 42 describe software-only receivers
    # this build supports end to end, the rest need RF/FPGA/GPU hardware
    assert len(parsed) >= 42, (len(parsed), rejected)


@pytest.mark.parametrize("item_type,dtype,comps", [
    ("ishort", np.int16, 2), ("ibyte", np.int8, 2), ("gr_complex", np.complex64, 1),
])
def test_file_source_roundtrip(tmp_path, item_type, dtype, comps):
    rng = np.random.default_rng(0)
    n = 1000
    if item_type == "gr_complex":
        data = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
        raw = data
        expect = data
    else:
        raw = rng.integers(-100, 100, n * comps).astype(dtype)
        f = raw.astype(np.float32)
        expect = (f[0::2] + 1j * f[1::2]).astype(np.complex64)
    p = tmp_path / f"capture.{item_type}"
    raw.tofile(p)
    src = sources.FileSignalSource(p, item_type=item_type, sampling_frequency=4e6)
    out = np.concatenate([src.read(300), src.read(400), src.read(10000)])
    assert np.array_equal(out, expect)


def test_file_source_valve_and_repeat(tmp_path):
    data = np.arange(100, dtype=np.complex64)
    p = tmp_path / "x.dat"
    data.tofile(p)
    src = sources.FileSignalSource(p, sampling_frequency=1e6, samples=50, repeat=True)
    out = src.read(120)
    assert len(out) == 120
    assert np.array_equal(out[:50], data[:50])
    assert np.array_equal(out[50:100], data[:50])


def test_streaming_fir_matches_batch():
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)).astype(np.complex64)
    taps = fir.design_lowpass(33, 0.4)
    f = fir.StreamingFir(taps)
    y_stream = np.concatenate([iq.combine(f(x[:1000])), iq.combine(f(x[1000:2500])),
                               iq.combine(f(x[2500:]))])
    full = np.convolve(np.concatenate([np.zeros(32, np.complex64), x]),
                       taps.astype(np.complex64), mode="valid")
    assert np.allclose(y_stream, full, atol=1e-4)


def test_fir_decimation_preserves_signal():
    """A 4->2 MHz decimating conditioner must preserve a 100 kHz tone."""
    fs = 4e6
    n = 40000
    t = np.arange(n) / fs
    x = np.exp(2j * np.pi * 1e5 * t).astype(np.complex64)
    taps = fir.design_lowpass(33, 0.4)
    f = fir.StreamingFir(taps, decim=2)
    y = iq.combine(f(x))
    t2 = np.arange(len(y)) * 2 / fs
    expect = np.exp(2j * np.pi * 1e5 * (t2 - 16 / fs))  # group delay 16 samples
    corr = np.vdot(expect[100:], y[100:]) / np.linalg.norm(expect[100:]) / np.linalg.norm(y[100:])
    assert abs(corr) > 0.999


def test_udp_monitor_sink():
    from gnss_sdr_tpu.io import monitor
    from gnss_sdr_tpu.receiver.observables import ChannelObservable
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(2.0)
    port = rx.getsockname()[1]
    mon = monitor.GnssSynchroMonitor([("127.0.0.1", port)], decimation=1)
    obs = [ChannelObservable(prn=7, signal="1C", t_tx_sv=1.0,
                             pseudorange_m=2.2e7, carrier_phase_cycles=12.5,
                             doppler_hz=100.0, cn0_dbhz=45.0)]
    mon.push(12345, obs)
    msg = json.loads(rx.recv(65536).decode())
    assert msg["type"] == "gnss_synchro"
    assert msg["channels"][0]["prn"] == 7
    rx.close()


def test_udp_signal_source_roundtrip():
    import socket
    from gnss_sdr_tpu.io.sources import UdpSignalSource
    src = UdpSignalSource(host="127.0.0.1", port=0, item_type="ishort",
                          sampling_frequency=2e6, timeout_s=1.0)
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    data = np.arange(64, dtype=np.int16)          # 32 complex samples
    tx.sendto(data.tobytes(), ("127.0.0.1", src.port))
    got = src.read(32)
    assert len(got) == 32
    assert got[0] == 0 + 1j and got[1] == 2 + 3j
    src.close()
    tx.close()


def test_rtltcp_signal_source_client():
    import socket
    import struct
    import threading
    from gnss_sdr_tpu.io.sources import RtlTcpSignalSource

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    seen = {}

    def server():
        conn, _ = srv.accept()
        conn.sendall(b"RTL0" + bytes(8))            # dongle header
        cmds = b""
        while len(cmds) < 15:                       # 3 x 5-byte commands
            part = conn.recv(15 - len(cmds))
            if not part:
                break
            cmds += part
        seen["cmds"] = [struct.unpack(">BI", cmds[i:i + 5])
                        for i in range(0, 15, 5)]
        # stream u8 IQ: sample k = (2k, 2k+1) offset around 127.4
        iq = np.arange(32, dtype=np.uint8) + 120
        conn.sendall(iq.tobytes())
        conn.close()

    t = threading.Thread(target=server, daemon=True)
    t.start()
    src = RtlTcpSignalSource(host="127.0.0.1", port=port,
                             frequency_hz=1_575_420_000, sampling_frequency=2e6)
    got = src.read(16)
    assert len(got) == 16
    expect0 = (120 - 127.4) / 128.0 + 1j * (121 - 127.4) / 128.0
    assert abs(got[0] - expect0) < 1e-6
    t.join(timeout=2)
    assert {c for c, _ in seen["cmds"]} == {1, 2, 8}
    src.close()
    srv.close()


def test_fractional_resampler_tone():
    """5 MHz -> 2.046 MHz (non-integer): a 100 kHz tone must come through
    with correct frequency and amplitude (reference Mmse_Resampler role)."""
    from gnss_sdr_tpu.ops.fir import StreamingFractionalResampler
    fs_in, fs_out = 5.0e6, 2.046e6
    n = 50000
    t = np.arange(n) / fs_in
    x = np.exp(2j * np.pi * 1.0e5 * t).astype(np.complex64)
    rs = StreamingFractionalResampler(fs_in, fs_out)
    ys = [iq.combine(rs(x[i: i + 12500])) for i in range(0, n, 12500)]
    y = np.concatenate(ys)
    assert abs(len(y) - n * fs_out / fs_in) < 30
    # measure the tone frequency by phase slope, skip edges
    seg = y[200:-200]
    dphi = np.angle(seg[1:] * np.conj(seg[:-1]))
    f_meas = np.mean(dphi) / (2 * np.pi) * fs_out
    assert abs(f_meas - 1.0e5) < 50.0, f_meas
    assert abs(np.mean(np.abs(seg)) - 1.0) < 0.05
    # phase continuity across streaming block boundaries
    assert np.std(dphi) < 0.01


def test_receiver_fractional_conditioning():
    """run_file_source with a non-integer rate ratio produces a working
    conditioned stream (acquisition succeeds through the resampler)."""
    from gnss_sdr_tpu import constants
    from gnss_sdr_tpu.utils import generator
    from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
    from gnss_sdr_tpu.io.sources import ArraySignalSource
    fs_in, fs_int = 5.0e6, 2.046e6
    spec = constants.GPS_L1_CA
    x = generator.generate(
        spec, [generator.SatParams(prn=9, cn0_dbhz=48.0, doppler_hz=900.0,
                                   code_delay_s=3e-4)], fs_in, 0.5, seed=61)
    cfg = ReceiverConfig(signal="1C", fs=fs_int, n_channels=1, prns=(9,),
                         chunk_ms=100, pvt_apply_tropo=False,
                         pvt_apply_iono=False)
    rx = Receiver(cfg)
    rx.run_file_source(ArraySignalSource(x, fs_in))
    assert rx.tracked_prns() == [9]
    assert abs(float(rx.trk_state.carrier_freq[0]) - 900.0) < 20.0


def test_registry_validates_reference_hybrid_conf():
    """The multisource hybrid conf's implementation names all resolve
    (reference gnss_block_factory registry parity)."""
    import pathlib
    p = pathlib.Path(
        "/root/reference/conf/gnss-sdr_GLONASS_L1_CA_GPS_L1_CA_ibyte.conf")
    if not p.exists():
        pytest.skip("reference conf not available")
    conf = ini.FileConfiguration(p)
    rcfg = ini.receiver_config_from_ini(conf)
    sigs = [s for s, _n, *_ in rcfg.signal_plan]
    assert "1C" in sigs and "1G" in sigs


def test_registry_rejects_unknown_block():
    from gnss_sdr_tpu.config.registry import UnknownBlockError
    conf = ini.InMemoryConfiguration()
    conf.set_property("Channels_1C.count", 4)
    conf.set_property("Acquisition_1C.implementation", "Quantum_Acquisition")
    with pytest.raises(UnknownBlockError):
        ini.receiver_config_from_ini(conf)


def test_registry_rejects_signal_mismatch():
    from gnss_sdr_tpu.config.registry import UnknownBlockError
    conf = ini.InMemoryConfiguration()
    conf.set_property("Channels_1C.count", 4)
    conf.set_property("Acquisition_1C.implementation",
                      "GPS_L2_M_PCPS_Acquisition")
    with pytest.raises(UnknownBlockError):
        ini.receiver_config_from_ini(conf)


def test_registry_rejects_hardware_source():
    from gnss_sdr_tpu.config.registry import UnknownBlockError
    conf = ini.InMemoryConfiguration()
    conf.set_property("Channels_1C.count", 4)
    conf.set_property("SignalSource.implementation", "UHD_Signal_Source")
    with pytest.raises(UnknownBlockError):
        ini.receiver_config_from_ini(conf)


def test_registry_name_overrides_apply():
    conf = ini.InMemoryConfiguration()
    conf.set_property("Channels_1C.count", 4)
    conf.set_property("Tracking_1C.implementation", "GPS_L1_CA_KF_Tracking")
    conf.set_property("Acquisition_1C.implementation",
                      "GPS_L1_CA_PCPS_Acquisition_Fine_Doppler")
    rcfg = ini.receiver_config_from_ini(conf)
    assert rcfg.carrier_kf and rcfg.acq_two_step


def test_per_group_parameters_from_conf():
    """Each group's own Acquisition_<sig>/Tracking_<sig> sections configure
    that group (reference per-adapter config reads) — a hybrid conf's
    Galileo loop bandwidths must land on the Galileo group, not be ignored
    in favor of the first group's."""
    from gnss_sdr_tpu.receiver.receiver import Receiver

    conf = ini.InMemoryConfiguration()
    conf.set_property("GNSS-SDR.internal_fs_sps", 4_000_000)
    conf.set_property("Channels_1C.count", 4)
    conf.set_property("Channels_1B.count", 3)
    conf.set_property("Acquisition_1C.doppler_max", 6000)
    conf.set_property("Tracking_1C.pll_bw_hz", 35.0)
    conf.set_property("Acquisition_1B.doppler_max", 4000)
    conf.set_property("Tracking_1B.pll_bw_hz", 17.5)
    conf.set_property("Tracking_1B.dll_bw_hz", 1.5)
    rcfg = ini.receiver_config_from_ini(conf)
    gp = {sig: dict(items) for sig, items in rcfg.group_params}
    assert gp["1B"]["acq_doppler_max_hz"] == 4000.0
    assert gp["1B"]["pll_bw_hz"] == 17.5

    rx = Receiver(rcfg)
    g1c = next(g for g in rx.groups if g.signal == "1C")
    g1b = next(g for g in rx.groups if g.signal == "1B")
    assert g1c.rx_cfg.acq_doppler_max_hz == 6000.0
    assert g1b.rx_cfg.acq_doppler_max_hz == 4000.0
    assert g1b.rx_cfg.pll_bw_hz == 17.5
    assert g1b.rx_cfg.dll_bw_hz == 1.5
    # the trk loop config actually built from those values
    assert g1b.trk_cfg.pll_bw_hz == 17.5


def test_nsr_and_two_bit_sources_from_conf(tmp_path):
    """Nsr / Two_Bit_* packed file formats map to the native 2-bit decoders
    (reference nsr_file_signal_source / two_bit_packed adapters)."""
    from gnss_sdr_tpu.io import native
    if not native.available():
        pytest.skip("no native lib")
    import numpy as np
    raw = np.arange(64, dtype=np.uint8)
    p = tmp_path / "packed.bin"
    raw.tofile(p)
    for impl, kind in (("Nsr_File_Signal_Source", "2bit_real"),
                       ("Two_Bit_Cpx_File_Signal_Source", "2bit_cpx")):
        conf = ini.InMemoryConfiguration()
        conf.set_property("SignalSource.implementation", impl)
        conf.set_property("SignalSource.filename", str(p))
        conf.set_property("SignalSource.sampling_frequency", 4_000_000)
        src = ini.source_from_ini(conf)
        x = src.read(16)
        assert x.dtype == np.complex64 and len(x) == 16
        src.close()
    conf = ini.InMemoryConfiguration()
    conf.set_property("SignalSource.implementation",
                      "Two_Bit_Packed_File_Signal_Source")
    conf.set_property("SignalSource.filename", str(p))
    conf.set_property("SignalSource.sample_type", "iq")
    src = ini.source_from_ini(conf)
    assert src.item_type == "2bit_cpx"
    src.close()
