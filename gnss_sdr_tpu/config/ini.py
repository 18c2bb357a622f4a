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

    plan = []
    for suf in SIGNAL_SUFFIXES:
        cnt = conf.property(f"Channels_{suf}.count", 0)
        if cnt > 0:
            plan.append((suf, cnt))
    if not plan:
        plan = [("1C", 8)]
    signal, n_channels = plan[0]

    fs = float(conf.property("GNSS-SDR.internal_fs_sps",
                             conf.property("GNSS-SDR.internal_fs_hz", 2_000_000)))
    acq = f"Acquisition_{signal}"
    trk = f"Tracking_{signal}"
    return ReceiverConfig(
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
        # multi-device channel sharding (TPU mesh); 0/absent = single-device
        n_mesh_devices=(conf.property("GNSS-SDR.num_devices", 0) or None),
    )


def source_from_ini(conf: Configuration):
    """Build the signal source + conversion/resampling plan from config."""
    from gnss_sdr_tpu.io import sources

    impl = conf.property("SignalSource.implementation", "File_Signal_Source")
    fs = float(conf.property("SignalSource.sampling_frequency", 4_000_000))
    if impl == "File_Signal_Source":
        return sources.FileSignalSource(
            conf.property("SignalSource.filename", ""),
            item_type=conf.property("SignalSource.item_type", "gr_complex"),
            sampling_frequency=fs,
            samples=conf.property("SignalSource.samples", 0),
            repeat=conf.property("SignalSource.repeat", False),
        )
    if impl == "Custom_UDP_Signal_Source":
        return sources.UdpSignalSource(
            host=conf.property("SignalSource.origin_address", "0.0.0.0"),
            port=int(conf.property("SignalSource.port", 1234)),
            item_type=conf.property("SignalSource.item_type", "ishort"),
            sampling_frequency=fs)
    if impl == "RtlTcp_Signal_Source":
        return sources.RtlTcpSignalSource(
            host=conf.property("SignalSource.address", "127.0.0.1"),
            port=int(conf.property("SignalSource.port", 1234)),
            frequency_hz=float(conf.property("SignalSource.freq",
                                             1_575_420_000)),
            sampling_frequency=fs,
            agc=conf.property("SignalSource.AGC_enabled", True))
    raise NotImplementedError(f"signal source {impl} not supported yet")
