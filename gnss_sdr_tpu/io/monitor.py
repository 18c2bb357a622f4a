"""Real-time UDP monitoring sinks.

Reference analogs: ``gnss_synchro_monitor`` + ``Gnss_Synchro_Udp_Sink``
(``src/core/monitor/``) and ``Monitor_Pvt_Udp_Sink``
(``src/algorithms/PVT/libs/monitor_pvt_udp_sink.cc``). Serialization is JSON
lines rather than protobuf/boost-binary — zero extra dependencies, trivially
consumable; the wire schema mirrors docs/protobuf/gnss_synchro.proto and
monitor_pvt.proto field-for-field.
"""

from __future__ import annotations

import dataclasses
import json
import socket


class UdpSink:
    def __init__(self, addresses: list[tuple[str, int]]):
        self.addresses = addresses
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

    def send(self, payload: dict) -> None:
        data = (json.dumps(payload) + "\n").encode()
        for addr in self.addresses:
            try:
                self._sock.sendto(data, addr)
            except OSError:
                pass

    def close(self) -> None:
        self._sock.close()


class GnssSynchroMonitor:
    """Streams per-channel observables every Nth epoch (decimation)."""

    def __init__(self, addresses: list[tuple[str, int]], decimation: int = 1):
        self.sink = UdpSink(addresses)
        self.decimation = max(1, decimation)
        self._count = 0

    def push(self, tick_sample: int, observables: list) -> None:
        self._count += 1
        if self._count % self.decimation:
            return
        self.sink.send({
            "type": "gnss_synchro",
            "sample_counter": tick_sample,
            "channels": [dataclasses.asdict(o) for o in observables],
        })


class PvtMonitor:
    def __init__(self, addresses: list[tuple[str, int]]):
        self.sink = UdpSink(addresses)

    def push(self, sol) -> None:
        if not sol.valid:
            return
        self.sink.send({
            "type": "monitor_pvt",
            "tow_s": sol.tow_s,
            "week": sol.week,
            "pos_ecef": list(map(float, sol.pos_ecef)),
            "vel_ecef": list(map(float, sol.vel_ecef)),
            "lat_deg": float(sol.lat_rad) * 57.29577951308232,
            "lon_deg": float(sol.lon_rad) * 57.29577951308232,
            "height_m": float(sol.height_m),
            "clock_bias_s": sol.clock_bias_s,
            "clock_drift_s_s": sol.clock_drift_s_s,
            "n_sats": sol.n_sats,
            "gdop": sol.gdop, "pdop": sol.pdop,
            "hdop": sol.hdop, "vdop": sol.vdop,
        })
