"""CLI entry point: ``python -m gnss_sdr_tpu -c receiver.conf``.

Reference analog: ``src/main/main.cc`` (gflags/glog init + ControlThread run).
Accepts the reference's own INI configs plus CLI overrides for the most-used
flags (``gnss_sdr_flags.cc``: --doppler_max, --dll_bw_hz, --pll_bw_hz ...).
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="gnss-sdr-tpu",
        description="TPU-native GNSS software-defined receiver")
    p.add_argument("-c", "--config_file", required=True,
                   help="INI configuration (reference-compatible dialect)")
    p.add_argument("-s", "--signal_source", default=None,
                   help="override SignalSource.filename")
    p.add_argument("--doppler_max", type=float, default=None)
    p.add_argument("--doppler_step", type=float, default=None)
    p.add_argument("--dll_bw_hz", type=float, default=None)
    p.add_argument("--pll_bw_hz", type=float, default=None)
    p.add_argument("--max_chunks", type=int, default=None,
                   help="stop after N processing chunks")
    p.add_argument("--upload_bits", type=int, default=None,
                   choices=(4, 8, 32),
                   help="sample-upload word size (4 = packed nibble, "
                        "the fast streaming configuration)")
    p.add_argument("--dispatch_chunks", type=int, default=None,
                   help="fuse K chunks per device dispatch in steady state "
                        "(amortizes per-RPC tunnel latency; 1 = off)")
    p.add_argument("--platform", default=None,
                   help="force a JAX platform (e.g. cpu, tpu)")
    p.add_argument("--devices", type=int, default=None,
                   help="shard channels/acquisition over N jax devices")
    p.add_argument("--log_level", default="INFO")
    return p


def _start_keyboard_listener(rx) -> None:
    """'q' + Enter on an interactive stdin stops the receiver (reference
    ControlThread::keyboard_listener, control_thread.h:180). Skipped when
    stdin is not a TTY (piped runs, tests, the restart harness)."""
    import threading

    try:
        if not sys.stdin.isatty():
            return
    except (ValueError, OSError):
        return
    from gnss_sdr_tpu.receiver.control import CommandEvent

    def listen():
        for line in sys.stdin:
            if line.strip().lower() == "q":
                rx.control_queue.push(CommandEvent("stop"))
                return

    threading.Thread(target=listen, daemon=True).start()


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=args.log_level,
                        format="%(asctime)s %(name)s %(levelname)s %(message)s")
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    # persistent XLA cache: CLI runs are fresh processes and the receiver's
    # programs take minutes to compile cold on a small host (0.8 s warm)
    from gnss_sdr_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    from gnss_sdr_tpu.config import ini
    from gnss_sdr_tpu.receiver.receiver import Receiver

    conf = ini.FileConfiguration(args.config_file)
    if args.signal_source:
        conf.set_property("SignalSource.filename", args.signal_source)
    if args.doppler_max is not None:
        conf.set_property("Acquisition_1C.doppler_max", args.doppler_max)
    if args.doppler_step is not None:
        conf.set_property("Acquisition_1C.doppler_step", args.doppler_step)
    if args.dll_bw_hz is not None:
        conf.set_property("Tracking_1C.dll_bw_hz", args.dll_bw_hz)
    if args.pll_bw_hz is not None:
        conf.set_property("Tracking_1C.pll_bw_hz", args.pll_bw_hz)
    if args.dispatch_chunks:
        conf.set_property("GNSS-SDR.dispatch_chunks", args.dispatch_chunks)
    if args.upload_bits:
        conf.set_property("GNSS-SDR.upload_bits", args.upload_bits)

    multi = ini.multisource_from_ini(conf)
    if multi is not None:
        # reference multi-source flowgraph (Receiver.sources_count>1):
        # one Receiver branch per SignalSourceK, merged observables + PVT
        from gnss_sdr_tpu.receiver.multisource import MultiSourceReceiver
        branches, base_cfg = multi
        if args.devices is not None:
            branches = [dataclasses.replace(
                b, receiver=dataclasses.replace(
                    b.receiver, n_mesh_devices=args.devices))
                for b in branches]
        rx = MultiSourceReceiver(branches, pvt_template=base_cfg)
        rx.run()
        n = len(rx.fixes)
        print(f"processed {len(branches)} sources, {n} PVT fixes")
        if n:
            f = rx.fixes[-1]
            print(f"last fix: lat={f.lat_rad*57.29577951308232:.6f} "
                  f"lon={f.lon_rad*57.29577951308232:.6f} "
                  f"h={f.height_m:.1f} m "
                  f"({f.n_sats} sats, pdop {f.pdop:.2f})")
        return 0

    rcfg = ini.receiver_config_from_ini(conf)
    if args.devices is not None:
        rcfg = dataclasses.replace(rcfg, n_mesh_devices=args.devices)
    source = ini.source_from_ini(conf)
    if abs(source.fs - rcfg.fs) > 1.0:
        # decimating conditioner: integer or rational decimation via FIR
        logging.getLogger("gnss_sdr_tpu").info(
            "conditioning %.0f sps -> %.0f sps", source.fs, rcfg.fs)
    input_filter = ini.input_filter_from_ini(conf)
    rx = Receiver(rcfg)
    # warm/hot-start state (ephemerides + almanac + last position/time),
    # reloaded at start and refreshed at exit (reference: ControlThread
    # assist_GNSS + the agnss_ref/XML persistence set)
    assist = str(conf.property("GNSS-SDR.assistance_file", "")).strip()
    if assist:
        rx.restore(assist)
    # SUPL A-GNSS: fetch ephemeris/almanac/iono/UTC/ref position+time from
    # an SLP before streaming (reference ControlThread::assist_GNSS,
    # control_thread.cc:625-800; GNSS-SDR.SUPL_* keys)
    from gnss_sdr_tpu.io.supl import fetch_supl_assistance
    supl_assist = fetch_supl_assistance(conf)
    if supl_assist is not None:
        rx.apply_assistance(supl_assist)
    from gnss_sdr_tpu.receiver.outputs import attach_outputs
    outputs = attach_outputs(rx, conf)
    # TCP telecommand interface (reference ControlThread::telecommand_listener,
    # control_thread.cc:227-233: GNSS-SDR.telecommand_enabled / _tcp_port)
    telecmd = None
    if str(conf.property("GNSS-SDR.telecommand_enabled", "false")
           ).strip().lower() in ("true", "1"):
        from gnss_sdr_tpu.receiver.control import TelecommandServer
        port = int(conf.property("GNSS-SDR.telecommand_tcp_port", 3333))
        telecmd = TelecommandServer(rx.control_queue, rx.status_text,
                                    port=port)
        logging.getLogger("gnss_sdr_tpu").info(
            "telecommand server on tcp port %d", telecmd.port)
    _start_keyboard_listener(rx)
    try:
        rx.run_file_source(source, max_chunks=args.max_chunks,
                           input_filter=input_filter)
    finally:
        if assist:
            rx.checkpoint(assist)
        if telecmd is not None:
            telecmd.close()
        outputs.close()
        rx.close_dumps()

    n = len(rx.fixes)
    print(f"processed: {rx._sample_base} samples, {n} PVT fixes")
    if n:
        f = rx.fixes[-1]
        print(f"last fix: lat={f.lat_rad*57.29577951308232:.6f} "
              f"lon={f.lon_rad*57.29577951308232:.6f} h={f.height_m:.1f} m "
              f"({f.n_sats} sats, pdop {f.pdop:.2f})")
    # the reset telecommand requests a full receiver restart; the harness
    # script relaunches on this exit code (reference main.cc / the
    # gnss-sdr-harness.sh contract: exit 42 = restart, control_thread.cc:381)
    return 42 if rx.restart_requested else 0


if __name__ == "__main__":
    sys.exit(main())
