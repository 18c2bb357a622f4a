"""Configuration system: reference-compatible INI dialect.

API parity with the reference's ``ConfigurationInterface::property(name,
default)`` (``src/core/interfaces/configuration_interface.h``) and its two
implementations ``FileConfiguration`` (``file_configuration.cc:65``) and
``InMemoryConfiguration`` — so the reference's ``conf/*.conf`` files drive
this receiver directly for A/B runs.

Dialect: ``Role.key=value`` lines; ``;`` and ``#`` comments; an optional
``[GNSS-SDR]`` section header (ignored, as INIReader treats the whole file as
one section).
"""

from __future__ import annotations

import pathlib


def _parse(text: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith((";", "#", "[")):
            continue
        if "=" not in line:
            continue
        key, _, value = line.partition("=")
        # strip trailing comments
        for c in (";", "#"):
            if c in value:
                value = value.split(c, 1)[0]
        out[key.strip()] = value.strip()
    return out


class Configuration:
    """Typed property lookup over a flat key/value store."""

    def __init__(self, values: dict[str, str] | None = None):
        self._values = dict(values or {})

    def property(self, name: str, default):
        """Typed getter: the default's type decides the conversion
        (reference semantics: property<T>(name, T default))."""
        if name not in self._values:
            return default
        raw = self._values[name]
        if not isinstance(raw, str):
            return raw          # set_property with a typed value
        if isinstance(default, bool):
            return raw.strip().lower() in ("true", "1", "yes", "on")
        if isinstance(default, int):
            try:
                return int(float(raw))
            except ValueError:
                return default
        if isinstance(default, float):
            try:
                return float(raw)
            except ValueError:
                return default
        return raw

    def set_property(self, name: str, value) -> None:
        self._values[name] = str(value)

    def is_present(self, name: str) -> bool:
        return name in self._values

    def keys_with_prefix(self, prefix: str) -> list[str]:
        return [k for k in self._values if k.startswith(prefix)]


class FileConfiguration(Configuration):
    def __init__(self, path: str | pathlib.Path):
        super().__init__(_parse(pathlib.Path(path).read_text()))
        self.path = pathlib.Path(path)


class InMemoryConfiguration(Configuration):
    pass


# signal code <-> reference channel-group suffix ("Channels_1C.count" etc.)
SIGNAL_SUFFIXES = ("1C", "2S", "L5", "1B", "5X", "1G", "2G", "B1", "B3")


def receiver_config_from_ini(conf: Configuration):
    """Map a reference-style configuration onto ReceiverConfig.

    Every ``Channels_<sig>.count > 0`` becomes a signal group (the reference's
    hybrid configs, e.g. conf/gnss-sdr_multisource_Hybrid_ishort.conf run
    GPS L1 + Galileo E1 + GLONASS channels concurrently); loop parameters are
    read from the FIRST group's Acquisition_/Tracking_ sections.
    """
    from gnss_sdr_tpu.receiver.receiver import ReceiverConfig

    from gnss_sdr_tpu.config import registry

    plan = []
    for suf in SIGNAL_SUFFIXES:
        cnt = conf.property(f"Channels_{suf}.count", 0)
        if cnt > 0:
            plan.append((suf, cnt))
    if not plan:
        plan = [("1C", 8)]
    signal, n_channels = plan[0]
    # factory-style validation of every implementation= name + first-group
    # overrides (KF tracking, fine-Doppler two-step, ...)
    name_overrides = registry.validate_conf(conf, plan)

    fs = float(conf.property("GNSS-SDR.internal_fs_sps",
                             conf.property("GNSS-SDR.internal_fs_hz", 2_000_000)))
    acq = f"Acquisition_{signal}"
    trk = f"Tracking_{signal}"

    # per-group parameter overrides: every group's own Acquisition_<sig>/
    # Tracking_<sig> section configures that group (the reference's
    # per-adapter config reads), not just the first group's
    group_params = []
    for entry in plan:
        sig = entry[0]
        a, t = f"Acquisition_{sig}", f"Tracking_{sig}"
        items: dict = {}
        for field, key, conv in (
                ("acq_doppler_max_hz", f"{a}.doppler_max", float),
                ("acq_doppler_step_hz", f"{a}.doppler_step", float),
                ("pll_bw_hz", f"{t}.pll_bw_hz", float),
                ("dll_bw_hz", f"{t}.dll_bw_hz", float),
                ("pll_bw_narrow_hz", f"{t}.pll_bw_narrow_hz", float),
                ("dll_bw_narrow_hz", f"{t}.dll_bw_narrow_hz", float),
                ("extend_symbols", f"{t}.extend_correlation_symbols", int),
                ("track_pilot", f"{t}.track_pilot", None)):
            if conf.is_present(key):
                if conv is None:
                    items[field] = bool(conf.property(key, False))
                else:
                    # typed default drives the conversion in property()
                    items[field] = conv(conf.property(
                        key, 0.0 if conv is float else 0))
        impl_a = str(conf.property(f"{a}.implementation", ""))
        if impl_a == "Galileo_E1_PCPS_8ms_Ambiguous_Acquisition":
            items["acq_variant"] = "e1_8ms"
        elif impl_a == "Galileo_E5a_Noncoherent_IQ_Acquisition_CAF":
            items["acq_variant"] = "e5a_caf"
            if conf.is_present(f"{a}.CAF_window_hz"):
                items["acq_caf_window_hz"] = float(
                    conf.property(f"{a}.CAF_window_hz", 0.0))
            if conf.is_present(f"{a}.both_signal_components"):
                items["acq_both_components"] = bool(
                    conf.property(f"{a}.both_signal_components", False))
        impl_t = str(conf.property(f"{t}.implementation", ""))
        if "KF" in impl_t:
            items["carrier_kf"] = True
        if "TCP_CONNECTOR" in impl_t:
            items["tcp_connector"] = True
            items["tcp_port_ch0"] = int(conf.property(f"{t}.port_ch0", 2060))
        if items:
            group_params.append((sig, tuple(items.items())))

    import dataclasses as _dc
    cfg = ReceiverConfig(
        signal=signal,
        fs=fs,
        n_channels=n_channels,
        signal_plan=tuple(plan),
        acq_doppler_max_hz=float(conf.property(f"{acq}.doppler_max", 5000)),
        acq_doppler_step_hz=float(conf.property(f"{acq}.doppler_step", 250)),
        pll_bw_hz=conf.property(f"{trk}.pll_bw_hz", 40.0),
        dll_bw_hz=conf.property(f"{trk}.dll_bw_hz", 4.0),
        pll_bw_narrow_hz=conf.property(f"{trk}.pll_bw_narrow_hz", 15.0),
        dll_bw_narrow_hz=conf.property(f"{trk}.dll_bw_narrow_hz", 2.0),
        extend_symbols=int(conf.property(
            f"{trk}.extend_correlation_symbols", 1)),
        track_pilot=bool(conf.property(f"{trk}.track_pilot", False)),
        # reference: Tracking_1C.implementation=GPS_L1_CA_KF_Tracking
        carrier_kf="KF" in str(conf.property(f"{trk}.implementation", "")),
        pvt_output_rate_ms=float(conf.property("PVT.output_rate_ms", 100)),
        carrier_smoothing_factor=(
            int(conf.property("Observables.smoothing_factor", 200))
            if conf.property("Observables.enable_carrier_smoothing", False)
            else 0),
        # multi-device channel sharding (TPU mesh); 0/absent = single-device
        n_mesh_devices=(conf.property("GNSS-SDR.num_devices", 0) or None),
        # periodic channel/fix status log (reference: the channel status
        # collector feeding the monitor, channel_status_msg_receiver.cc)
        status_period_s=float(conf.property("GNSS-SDR.status_period_s",
                                            0.0)),
        group_params=tuple(group_params),
        # tracing dumps (reference per-block dump=true; one directory here)
        dump_dir=(conf.property("GNSS-SDR.dump_dir", "") or None),
        dump_mat=bool(conf.property("GNSS-SDR.dump_mat",
                                    conf.property(f"{trk}.dump_mat", False))),
    )
    chunk_ms = conf.property("GNSS-SDR.chunk_ms", 0)
    if chunk_ms > 0:
        # larger chunks amortize the per-dispatch host<->device round trips
        # (remote-TPU tunnels charge fixed per-RPC latency) at the cost of
        # coarser channel-management cadence
        cfg = _dc.replace(cfg, chunk_ms=int(chunk_ms))
    disp = int(conf.property("GNSS-SDR.dispatch_chunks", 0))
    if disp > 1:
        # fuse K chunks per device dispatch in steady state (see
        # ReceiverConfig.dispatch_chunks); acquisition still runs at
        # chunk_ms cadence whenever candidates are pending
        cfg = _dc.replace(cfg, dispatch_chunks=disp)
    bits = int(conf.property("GNSS-SDR.upload_bits", 0))
    if bits in (4, 8, 32):
        # sample-upload word size: 4 = packed-nibble uint8 (1 B/sample,
        # the fast streaming configuration), 8 = int8 split-IQ, 32 = float
        cfg = _dc.replace(cfg, upload_bits=bits)
    depth = int(conf.property("GNSS-SDR.pipeline_depth", 0))
    if depth > 1:
        # in-flight quanta in the fused steady state (see
        # ReceiverConfig.pipeline_depth; >4 floods the tunnel)
        cfg = _dc.replace(cfg, pipeline_depth=depth)
    return _dc.replace(cfg, **name_overrides) if name_overrides else cfg


def input_filter_from_ini(conf: Configuration, role: str = "InputFilter"):
    """Build the InputFilter stage of the signal conditioner from config.

    Reference analog: the config-selectable input-filter adapters
    (``src/algorithms/input_filter/adapters/``): Pulse_Blanking_Filter,
    Notch_Filter / Notch_Filter_Lite, Freq_Xlating_Fir_Filter and
    Beamformer_Filter. Returns a callable ``f(block) -> block`` applied at
    the SOURCE rate before resampling (the reference chain is
    DataTypeAdapter -> InputFilter -> Resampler), or None for Pass_Through.
    For Beamformer_Filter the callable maps an [N_elements, T] array block
    to a single [T] stream.
    """
    import numpy as np

    impl = conf.property(f"{role}.implementation", "Pass_Through")
    if impl in ("Pass_Through", "", "Fir_Filter"):
        # plain Fir_Filter band-limiting is already performed by the
        # decimating conditioner in Receiver.run_file_source
        return None
    if impl == "Pulse_Blanking_Filter":
        from gnss_sdr_tpu.ops import iq
        from gnss_sdr_tpu.ops.interference import pulse_blanking
        thr = float(conf.property(f"{role}.threshold", 10.0))
        window = int(conf.property(f"{role}.segments_est",
                                   conf.property(f"{role}.length", 64)))

        def _blank(x):
            return np.asarray(iq.combine(np.asarray(
                pulse_blanking(iq.split(np.ascontiguousarray(x)),
                               threshold=thr, window=window))))
        return _blank
    if impl in ("Notch_Filter", "Notch_Filter_Lite"):
        from gnss_sdr_tpu.ops import iq
        from gnss_sdr_tpu.ops.interference import notch_excision
        thr_db = float(conf.property(f"{role}.threshold_db", 12.0))

        def _notch(x):
            return np.asarray(iq.combine(np.asarray(
                notch_excision(iq.split(np.ascontiguousarray(x)),
                               threshold_db=thr_db))))
        return _notch
    if impl == "Freq_Xlating_Fir_Filter":
        from gnss_sdr_tpu.ops import iq
        from gnss_sdr_tpu.ops.fir import freq_translate
        f_if = float(conf.property(f"{role}.IF", 0.0))
        fs = float(conf.property(f"{role}.sampling_frequency",
                                 conf.property("SignalSource.sampling_frequency",
                                               4_000_000)))
        if f_if == 0.0:
            return None
        pos = {"n0": 0}           # absolute sample index: phase continuity
                                  # across successive blocks

        def _xlate(x):
            out = np.asarray(iq.combine(np.asarray(freq_translate(
                iq.split(np.ascontiguousarray(x)), f_if, fs,
                n0=pos["n0"]))))
            pos["n0"] += len(out)
            return out
        return _xlate
    if impl == "Beamformer_Filter":
        from gnss_sdr_tpu.ops import iq
        from gnss_sdr_tpu.ops.beamformer import beamform, ula_steering_weights
        n_el = int(conf.property(f"{role}.n_elements",
                                 conf.property("SignalSource.RF_channels", 4)))
        theta = np.deg2rad(float(conf.property(f"{role}.theta_deg", 0.0)))
        spacing = float(conf.property(f"{role}.spacing_wavelengths", 0.5))
        w2 = iq.split(ula_steering_weights(n_el, theta, spacing))

        def _beam(x_nt):
            x_nt = np.ascontiguousarray(x_nt)
            x2 = np.stack([x_nt.real, x_nt.imag], axis=-1).astype(np.float32)
            return np.asarray(iq.combine(np.asarray(beamform(x2, w2))))
        return _beam
    raise NotImplementedError(f"input filter {impl} not supported")


def source_from_ini(conf: Configuration, role: str = "SignalSource"):
    """Build the signal source + conversion/resampling plan from config."""
    from gnss_sdr_tpu.io import sources

    impl = conf.property(f"{role}.implementation", "File_Signal_Source")
    fs = float(conf.property(f"{role}.sampling_frequency", 4_000_000))
    if impl == "Raw_Array_Signal_Source":
        # N-element antenna-array file capture (reference raw_array via
        # Array_Signal_Conditioner + Beamformer_Filter)
        return sources.ArrayFileSignalSource(
            conf.property(f"{role}.filename", ""),
            n_elements=int(conf.property(f"{role}.RF_channels", 4)),
            item_type=conf.property(f"{role}.item_type", "gr_complex"),
            sampling_frequency=fs,
            samples=conf.property(f"{role}.samples", 0))
    if impl in ("Nsr_File_Signal_Source", "Two_Bit_Packed_File_Signal_Source",
                "Two_Bit_Cpx_File_Signal_Source"):
        # 2-bit packed capture formats (reference unpack_byte_2bit_samples /
        # unpack_2bit_samples): the native C++ decoders expose them as
        # "2bit_real" (NSR: real samples at IF) / "2bit_cpx" item kinds
        from gnss_sdr_tpu.io import native
        kind = ("2bit_real" if impl != "Two_Bit_Cpx_File_Signal_Source"
                else "2bit_cpx")
        if impl == "Two_Bit_Packed_File_Signal_Source":
            st = conf.property(f"{role}.sample_type", "real")
            kind = "2bit_real" if st == "real" else "2bit_cpx"
        return native.NativeFileSource(
            conf.property(f"{role}.filename", ""),
            item_type=kind, sampling_frequency=fs)
    if impl == "Spir_File_Signal_Source":
        return sources.SpirSignalSource(
            conf.property(f"{role}.filename", ""), fmt="int1",
            sampling_frequency=fs,
            channel=int(conf.property(f"{role}.sel_ch", 1)),
            samples=conf.property(f"{role}.samples", 0))
    if impl == "Spir_GSS6450_File_Signal_Source":
        return sources.SpirSignalSource(
            conf.property(f"{role}.filename", ""), fmt="gss6450",
            sampling_frequency=fs,
            adc_bits=int(conf.property(f"{role}.adc_bits", 4)),
            samples=conf.property(f"{role}.samples", 0))
    if impl == "Labsat_Signal_Source":
        return sources.LabsatSignalSource(
            conf.property(f"{role}.filename", ""),
            channel=int(conf.property(f"{role}.selected_channel", 1)),
            sampling_frequency=fs)
    if impl == "File_Signal_Source":
        return sources.FileSignalSource(
            conf.property(f"{role}.filename", ""),
            item_type=conf.property(f"{role}.item_type", "gr_complex"),
            sampling_frequency=fs,
            samples=conf.property(f"{role}.samples", 0),
            repeat=conf.property(f"{role}.repeat", False),
        )
    if impl == "Custom_UDP_Signal_Source":
        return sources.UdpSignalSource(
            host=conf.property(f"{role}.origin_address", "0.0.0.0"),
            port=int(conf.property(f"{role}.port", 1234)),
            item_type=conf.property(f"{role}.item_type", "ishort"),
            sampling_frequency=fs)
    if impl == "RtlTcp_Signal_Source":
        return sources.RtlTcpSignalSource(
            host=conf.property(f"{role}.address", "127.0.0.1"),
            port=int(conf.property(f"{role}.port", 1234)),
            frequency_hz=float(conf.property(f"{role}.freq",
                                             1_575_420_000)),
            sampling_frequency=fs,
            agc=conf.property(f"{role}.AGC_enabled", True))
    from gnss_sdr_tpu.config import registry
    if impl in registry.HARDWARE_SOURCES:
        # live RF front-ends stream through the driver abstraction
        # (io/rf_driver.py; reference uhd_signal_source.cc:60-200 and
        # siblings). Every adapter's conf keys map onto one RfConfig.
        from gnss_sdr_tpu.io import rf_driver
        cfg = rf_driver.RfConfig(
            sampling_frequency=fs,
            center_freq_hz=float(conf.property(f"{role}.freq",
                                               1_575_420_000)),
            gain_db=float(conf.property(f"{role}.gain", 40.0)),
            rf_gain_db=float(conf.property(f"{role}.rf_gain", 40.0)),
            if_gain_db=float(conf.property(f"{role}.if_gain", 40.0)),
            agc=bool(conf.property(f"{role}.AGC_enabled", False)),
            antenna=conf.property(f"{role}.antenna", ""),
            subdevice=conf.property(f"{role}.subdevice", ""),
            bandwidth_hz=float(conf.property(f"{role}.bandwidth", 0.0)),
            device_args=conf.property(
                f"{role}.device_address",
                conf.property(f"{role}.osmosdr_args", "")))
        drv_kind = conf.property(f"{role}.driver",
                                 registry.HARDWARE_DRIVER_DEFAULT[impl])
        playback = conf.property(f"{role}.mock_capture", "") or None
        driver = (rf_driver.make_driver("mock", playback=playback)
                  if drv_kind == "mock" else rf_driver.make_driver(drv_kind))
        return rf_driver.RfSignalSource(driver, cfg)
    raise NotImplementedError(f"signal source {impl} not supported yet")


def multisource_from_ini(conf: Configuration):
    """Build a MultiSourceReceiver setup from a reference-style
    multi-source configuration, or return None for single-source configs.

    Reference format (``conf/gnss-sdr_multisource_Hybrid_ishort.conf``;
    ``gnss_flowgraph.cc:126-737``): ``Receiver.sources_count=N``, one
    ``SignalSourceK.*`` (+ optional ``InputFilterK.*`` / ``ResamplerK.*``)
    section per source, and ``ChannelN.RF_channel_ID=K`` binding each
    channel to a source. Channels are numbered across the signal groups in
    plan order, and every channel of one signal group must bind to the same
    source (a signal family lives in one band of one capture).

    Per-source internal rate: ``ResamplerK.sample_freq_out``, falling back
    to ``GNSS-SDR.internal_fs_spsK`` then the global internal_fs_sps —
    this is what makes real multi-RATE processing (L1 at 2 MSps + L5 at
    12 MSps) expressible.

    Returns ``(branches, base_cfg)`` with ``branches`` a list of
    ``SourceBranchConfig``.
    """
    import dataclasses as _dc

    from gnss_sdr_tpu.receiver.multisource import SourceBranchConfig

    n_src = int(conf.property("Receiver.sources_count", 1))
    # Multichannel_File_Signal_Source: ONE SignalSource section with
    # total_channels files (filename0..filenameN-1), one per RF chain at a
    # common rate (reference multichannel_file_signal_source.cc:54-60) —
    # expressed here as N file-source branches
    multichannel = (str(conf.property("SignalSource.implementation", ""))
                    == "Multichannel_File_Signal_Source")
    if multichannel and n_src <= 1:
        n_src = int(conf.property("SignalSource.total_channels", 1))
    if n_src <= 1:
        return None
    base_cfg = receiver_config_from_ini(conf)
    plan = [(e[0], e[1]) for e in base_cfg.signal_plan]

    # bind each signal group to its source via the group's first channel
    src_of_sig: dict[str, int] = {}
    gidx = 0
    for sig, cnt in plan:
        rf = int(conf.property(f"Channel{gidx}.RF_channel_ID", 0))
        rf = int(conf.property(f"Channels_{sig}.RF_channel_ID", rf))
        # consistency: all channels of the group on one source
        for c in range(gidx, gidx + cnt):
            rc = int(conf.property(f"Channel{c}.RF_channel_ID", rf))
            if rc != rf:
                raise ValueError(
                    f"Channel{c}.RF_channel_ID={rc} splits signal group "
                    f"{sig} across sources (group is bound to {rf})")
        src_of_sig[sig] = rf
        gidx += cnt

    fs_global = base_cfg.fs
    branches = []
    for k in range(n_src):
        sigs = [(s, c) for s, c in plan if src_of_sig[s] == k]
        if not sigs:
            continue
        fs_k = float(conf.property(
            f"Resampler{k}.sample_freq_out",
            conf.property(f"GNSS-SDR.internal_fs_sps{k}", fs_global)))
        rcfg = _dc.replace(
            base_cfg, signal=sigs[0][0], n_channels=sigs[0][1],
            signal_plan=tuple(sigs), fs=fs_k)
        if multichannel:
            from gnss_sdr_tpu.io import sources as _sources
            source = _sources.FileSignalSource(
                conf.property(f"SignalSource.filename{k}", ""),
                item_type=conf.property("SignalSource.item_type",
                                        "gr_complex"),
                sampling_frequency=float(conf.property(
                    "SignalSource.sampling_frequency", fs_global)),
                samples=int(conf.property("SignalSource.samples", 0)))
        else:
            source = source_from_ini(conf, role=f"SignalSource{k}")
        filt = input_filter_from_ini(conf, role=f"InputFilter{k}")
        branches.append(SourceBranchConfig(
            receiver=rcfg, source=source, input_filter=filt))
    if not branches:
        raise ValueError("sources_count>1 but no signal group bound "
                         "to any source")
    return branches, base_cfg
