"""RTCM 3.x message encoder/decoder + TCP broadcast server.

Reference analog: ``src/algorithms/PVT/libs/rtcm.cc`` (5.8 k LoC) and
``rtcm_printer.cc`` — the PVT block emits station reference (1005), broadcast
ephemerides (1019 GPS / 1045 Galileo) and MSM7 observables (1077 GPS /
1097 Galileo) over a TCP server. This implementation covers that emitted set
with both encode and decode (decode doubles as the QA oracle), on a plain
bit-cursor over numpy uint8 bits.

Framing: 0xD3 preamble, 6 reserved bits, 10-bit length, payload, CRC-24Q
(same polynomial as the nav CRC in models/nav/fec.py).
"""

from __future__ import annotations

import dataclasses
import socket
import threading

import numpy as np

from gnss_sdr_tpu.models.ephemeris import KeplerEphemeris
from gnss_sdr_tpu.models.nav import fec

PI = 3.1415926535898
SPEED_OF_LIGHT = 299_792_458.0
RANGE_MS = SPEED_OF_LIGHT * 1e-3          # one millisecond of range


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, value: int, n: int) -> None:
        v = int(value) & ((1 << n) - 1)
        self.bits.extend((v >> (n - 1 - i)) & 1 for i in range(n))

    def s(self, value: int, n: int) -> None:
        self.u(int(value) & ((1 << n) - 1), n)

    def sq(self, value: float, scale: float, n: int) -> None:
        """Signed quantized field."""
        self.s(int(round(value / scale)), n)

    def uq(self, value: float, scale: float, n: int) -> None:
        self.u(int(round(value / scale)), n)

    def array(self) -> np.ndarray:
        return np.asarray(self.bits, np.uint8)


class BitReader:
    def __init__(self, bits: np.ndarray):
        self.bits = np.asarray(bits, np.uint8)
        self.pos = 0

    def u(self, n: int) -> int:
        v = 0
        for b in self.bits[self.pos: self.pos + n]:
            v = (v << 1) | int(b)
        self.pos += n
        return v

    def s(self, n: int) -> int:
        v = self.u(n)
        if v >= (1 << (n - 1)):
            v -= 1 << n
        return v

    def sq(self, scale: float, n: int) -> float:
        return self.s(n) * scale

    def uq(self, scale: float, n: int) -> float:
        return self.u(n) * scale


def _bits_to_bytes(bits: np.ndarray) -> bytes:
    pad = (-len(bits)) % 8
    b = np.concatenate([bits, np.zeros(pad, np.uint8)])
    return bytes(np.packbits(b))


def _bytes_to_bits(data: bytes) -> np.ndarray:
    return np.unpackbits(np.frombuffer(data, np.uint8))


def frame(payload_bits: np.ndarray) -> bytes:
    """Wrap payload bits in an RTCM 3 frame (preamble, length, CRC-24Q)."""
    pad = (-len(payload_bits)) % 8
    payload_bits = np.concatenate(
        [payload_bits, np.zeros(pad, np.uint8)])
    n_bytes = len(payload_bits) // 8
    w = BitWriter()
    w.u(0xD3, 8)
    w.u(0, 6)
    w.u(n_bytes, 10)
    head_payload = np.concatenate([w.array(), payload_bits])
    crc = fec.crc24q_bits(head_payload)
    w2 = BitWriter()
    w2.u(crc, 24)
    return _bits_to_bytes(np.concatenate([head_payload, w2.array()]))


def deframe(data: bytes) -> list[np.ndarray]:
    """Extract CRC-valid payloads from a byte stream; returns payload bits."""
    out = []
    i = 0
    while i + 6 <= len(data):
        if data[i] != 0xD3:
            i += 1
            continue
        n = ((data[i + 1] & 0x03) << 8) | data[i + 2]
        end = i + 3 + n + 3
        if end > len(data):
            break
        bits = _bytes_to_bits(data[i: i + 3 + n])
        crc_rx = int.from_bytes(data[i + 3 + n: end], "big")
        if fec.crc24q_bits(bits) == crc_rx:
            out.append(bits[24:])
            i = end
        else:
            i += 1
    return out


def deframe_stream(data: bytes) -> tuple[list[np.ndarray], bytes]:
    """Incremental deframer: returns (payload bits, unconsumed tail).

    The tail holds a possibly-incomplete trailing frame so a TCP stream can
    be fed in arbitrary pieces without duplicating messages.
    """
    out = []
    i = 0
    while True:
        j = data.find(b"\xd3", i)
        if j < 0:
            return out, b""
        if j + 3 > len(data):
            return out, data[j:]
        n = ((data[j + 1] & 0x03) << 8) | data[j + 2]
        end = j + 3 + n + 3
        if end > len(data):
            return out, data[j:]
        bits = _bytes_to_bits(data[j: j + 3 + n])
        crc_rx = int.from_bytes(data[j + 3 + n: end], "big")
        if fec.crc24q_bits(bits) == crc_rx:
            out.append(bits[24:])
            i = end
        else:
            i = j + 1


def message_number(payload_bits: np.ndarray) -> int:
    return BitReader(payload_bits).u(12)


# ---------------------------------------------------------------------------
# 1005 — station antenna reference point
# ---------------------------------------------------------------------------


def encode_1005(station_id: int, ecef: np.ndarray, *,
                gps: bool = True, glo: bool = False, gal: bool = True
                ) -> np.ndarray:
    w = BitWriter()
    w.u(1005, 12)
    w.u(station_id, 12)
    w.u(0, 6)                      # ITRF realization year
    w.u(1 if gps else 0, 1)
    w.u(1 if glo else 0, 1)
    w.u(1 if gal else 0, 1)
    w.u(0, 1)                      # reference-station indicator
    w.sq(ecef[0], 1e-4, 38)
    w.u(0, 1)                      # single receiver oscillator
    w.u(0, 1)                      # reserved
    w.sq(ecef[1], 1e-4, 38)
    w.u(0, 2)                      # quarter cycle indicator
    w.sq(ecef[2], 1e-4, 38)
    return w.array()


def decode_1005(bits: np.ndarray) -> dict:
    r = BitReader(bits)
    assert r.u(12) == 1005
    station = r.u(12)
    r.u(6)
    gps, glo, gal = r.u(1), r.u(1), r.u(1)
    r.u(1)
    x = r.sq(1e-4, 38)
    r.u(2)
    y = r.sq(1e-4, 38)
    r.u(2)
    z = r.sq(1e-4, 38)
    return dict(station_id=station, ecef=np.array([x, y, z]),
                gps=bool(gps), glo=bool(glo), gal=bool(gal))


# ---------------------------------------------------------------------------
# 1019 (GPS) / 1045 (Galileo F/NAV) broadcast ephemeris
# ---------------------------------------------------------------------------

_SC = PI  # semicircle


def encode_1019(eph: KeplerEphemeris) -> np.ndarray:
    w = BitWriter()
    w.u(1019, 12)
    w.u(eph.prn, 6)
    w.u(eph.week % 1024, 10)
    w.u(eph.ura & 0xF, 4)
    w.u(0, 2)                                  # L2 code
    w.sq(eph.idot / _SC, 2.0 ** -43, 14)
    w.u(eph.iode & 0xFF, 8)
    w.uq(eph.toc, 16.0, 16)
    w.sq(eph.af2, 2.0 ** -55, 8)
    w.sq(eph.af1, 2.0 ** -43, 16)
    w.sq(eph.af0, 2.0 ** -31, 22)
    w.u(eph.iodc & 0x3FF, 10)
    w.sq(eph.crs, 2.0 ** -5, 16)
    w.sq(eph.delta_n / _SC, 2.0 ** -43, 16)
    w.sq(eph.m0 / _SC, 2.0 ** -31, 32)
    w.sq(eph.cuc, 2.0 ** -29, 16)
    w.uq(eph.e, 2.0 ** -33, 32)
    w.sq(eph.cus, 2.0 ** -29, 16)
    w.uq(eph.sqrt_a, 2.0 ** -19, 32)
    w.uq(eph.toe, 16.0, 16)
    w.sq(eph.cic, 2.0 ** -29, 16)
    w.sq(eph.omega0 / _SC, 2.0 ** -31, 32)
    w.sq(eph.cis, 2.0 ** -29, 16)
    w.sq(eph.i0 / _SC, 2.0 ** -31, 32)
    w.sq(eph.crc, 2.0 ** -5, 16)
    w.sq(eph.omega / _SC, 2.0 ** -31, 32)
    w.sq(eph.omega_dot / _SC, 2.0 ** -43, 24)
    w.sq(eph.tgd, 2.0 ** -31, 8)
    w.u(eph.health & 0x3F, 6)
    w.u(0, 1)                                  # L2 P data flag
    w.u(0, 1)                                  # fit interval
    return w.array()


def decode_1019(bits: np.ndarray) -> KeplerEphemeris:
    r = BitReader(bits)
    assert r.u(12) == 1019
    e = KeplerEphemeris()
    e.prn = r.u(6)
    e.week = r.u(10)
    e.ura = r.u(4)
    r.u(2)
    e.idot = r.sq(2.0 ** -43, 14) * _SC
    e.iode = r.u(8)
    e.toc = r.uq(16.0, 16)
    e.af2 = r.sq(2.0 ** -55, 8)
    e.af1 = r.sq(2.0 ** -43, 16)
    e.af0 = r.sq(2.0 ** -31, 22)
    e.iodc = r.u(10)
    e.crs = r.sq(2.0 ** -5, 16)
    e.delta_n = r.sq(2.0 ** -43, 16) * _SC
    e.m0 = r.sq(2.0 ** -31, 32) * _SC
    e.cuc = r.sq(2.0 ** -29, 16)
    e.e = r.uq(2.0 ** -33, 32)
    e.cus = r.sq(2.0 ** -29, 16)
    e.sqrt_a = r.uq(2.0 ** -19, 32)
    e.toe = r.uq(16.0, 16)
    e.cic = r.sq(2.0 ** -29, 16)
    e.omega0 = r.sq(2.0 ** -31, 32) * _SC
    e.cis = r.sq(2.0 ** -29, 16)
    e.i0 = r.sq(2.0 ** -31, 32) * _SC
    e.crc = r.sq(2.0 ** -5, 16)
    e.omega = r.sq(2.0 ** -31, 32) * _SC
    e.omega_dot = r.sq(2.0 ** -43, 24) * _SC
    e.tgd = r.sq(2.0 ** -31, 8)
    e.health = r.u(6)
    return e


def encode_1045(eph: KeplerEphemeris) -> np.ndarray:
    """Galileo F/NAV ephemeris (same Kepler set, Galileo scalings)."""
    w = BitWriter()
    w.u(1045, 12)
    w.u(eph.prn, 6)
    w.u(eph.week % 4096, 12)
    w.u(eph.iode & 0x3FF, 10)
    w.u(eph.ura & 0xFF, 8)                     # SISA
    w.sq(eph.idot / _SC, 2.0 ** -43, 14)
    w.uq(eph.toc, 60.0, 14)
    w.sq(eph.af2, 2.0 ** -59, 6)
    w.sq(eph.af1, 2.0 ** -46, 21)
    w.sq(eph.af0, 2.0 ** -34, 31)
    w.sq(eph.crs, 2.0 ** -5, 16)
    w.sq(eph.delta_n / _SC, 2.0 ** -43, 16)
    w.sq(eph.m0 / _SC, 2.0 ** -31, 32)
    w.sq(eph.cuc, 2.0 ** -29, 16)
    w.uq(eph.e, 2.0 ** -33, 32)
    w.sq(eph.cus, 2.0 ** -29, 16)
    w.uq(eph.sqrt_a, 2.0 ** -19, 32)
    w.uq(eph.toe, 60.0, 14)
    w.sq(eph.cic, 2.0 ** -29, 16)
    w.sq(eph.omega0 / _SC, 2.0 ** -31, 32)
    w.sq(eph.cis, 2.0 ** -29, 16)
    w.sq(eph.i0 / _SC, 2.0 ** -31, 32)
    w.sq(eph.crc, 2.0 ** -5, 16)
    w.sq(eph.omega / _SC, 2.0 ** -31, 32)
    w.sq(eph.omega_dot / _SC, 2.0 ** -43, 24)
    w.sq(eph.tgd, 2.0 ** -32, 10)              # BGD E1/E5a
    w.u(eph.health & 0x3, 2)                   # E5a HS
    w.u(0, 1)                                  # E5a DVS
    w.u(0, 7)                                  # reserved
    return w.array()


def decode_1045(bits: np.ndarray) -> KeplerEphemeris:
    from gnss_sdr_tpu import constants
    r = BitReader(bits)
    assert r.u(12) == 1045
    e = KeplerEphemeris()
    e.prn = r.u(6)
    e.week = r.u(12)
    e.iode = r.u(10)
    e.ura = r.u(8)
    e.idot = r.sq(2.0 ** -43, 14) * _SC
    e.toc = r.uq(60.0, 14)
    e.af2 = r.sq(2.0 ** -59, 6)
    e.af1 = r.sq(2.0 ** -46, 21)
    e.af0 = r.sq(2.0 ** -34, 31)
    e.crs = r.sq(2.0 ** -5, 16)
    e.delta_n = r.sq(2.0 ** -43, 16) * _SC
    e.m0 = r.sq(2.0 ** -31, 32) * _SC
    e.cuc = r.sq(2.0 ** -29, 16)
    e.e = r.uq(2.0 ** -33, 32)
    e.cus = r.sq(2.0 ** -29, 16)
    e.sqrt_a = r.uq(2.0 ** -19, 32)
    e.toe = r.uq(60.0, 14)
    e.cic = r.sq(2.0 ** -29, 16)
    e.omega0 = r.sq(2.0 ** -31, 32) * _SC
    e.cis = r.sq(2.0 ** -29, 16)
    e.i0 = r.sq(2.0 ** -31, 32) * _SC
    e.crc = r.sq(2.0 ** -5, 16)
    e.omega = r.sq(2.0 ** -31, 32) * _SC
    e.omega_dot = r.sq(2.0 ** -43, 24) * _SC
    e.tgd = r.sq(2.0 ** -32, 10)
    e.health = r.u(2)
    e.gm = constants.GM_EARTH_GAL
    return e


# ---------------------------------------------------------------------------
# MSM7 (1077 GPS / 1097 Galileo)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class MsmObservation:
    prn: int
    signal_id: int              # MSM signal slot (e.g. 2 = L1 C/A, per table)
    pseudorange_m: float
    phase_range_m: float = 0.0
    phase_rate_m_s: float = 0.0
    cn0_dbhz: float = 45.0
    lock_time_s: float = 0.0


MSM7_GPS = 1077
MSM7_GAL = 1097


def encode_msm7(msg_num: int, station_id: int, epoch_ms: int,
                obs: list[MsmObservation]) -> np.ndarray:
    """Encode one MSM7 message (reference Rtcm::print_MSM_7 analog)."""
    sats = sorted({o.prn for o in obs})
    sigs = sorted({o.signal_id for o in obs})
    cell = {(o.prn, o.signal_id): o for o in obs}

    w = BitWriter()
    w.u(msg_num, 12)
    w.u(station_id, 12)
    w.u(epoch_ms % (7 * 24 * 3600 * 1000) if msg_num == MSM7_GPS
        else epoch_ms, 30)
    w.u(0, 1)                  # multiple message bit
    w.u(0, 3)                  # IODS
    w.u(0, 7)                  # reserved
    w.u(0, 2)                  # clock steering
    w.u(0, 2)                  # external clock
    w.u(0, 1)                  # smoothing
    w.u(0, 3)                  # smoothing interval
    for s in range(1, 65):
        w.u(1 if s in sats else 0, 1)
    for s in range(1, 33):
        w.u(1 if s in sigs else 0, 1)
    cells = [(p, s) for p in sats for s in sigs]
    for c in cells:
        w.u(1 if c in cell else 0, 1)

    # satellite data: rough range (ms int + 1/1024 ms), rough phase rate
    rough = {}
    for p in sats:
        any_o = next(o for o in obs if o.prn == p)
        rr_ms = any_o.pseudorange_m / RANGE_MS
        n_ms = int(rr_ms)
        rough[p] = n_ms
        w.u(n_ms, 8)
    for p in sats:
        w.u(0, 4)              # extended satellite info
    for p in sats:
        any_o = next(o for o in obs if o.prn == p)
        frac = any_o.pseudorange_m / RANGE_MS - rough[p]
        w.u(int(frac * 1024.0), 10)
    for p in sats:
        any_o = next(o for o in obs if o.prn == p)
        w.s(int(round(any_o.phase_rate_m_s)), 14)

    # signal data
    present = [c for c in cells if c in cell]
    for c in present:                       # fine pseudorange, 2^-29 ms
        o = cell[c]
        rr = (rough[o.prn] + int((o.pseudorange_m / RANGE_MS - rough[o.prn])
                                 * 1024.0) / 1024.0) * RANGE_MS
        w.sq((o.pseudorange_m - rr) / RANGE_MS, 2.0 ** -29, 20)
    for c in present:                       # fine phase range, 2^-31 ms
        o = cell[c]
        rr = (rough[o.prn] + int((o.pseudorange_m / RANGE_MS - rough[o.prn])
                                 * 1024.0) / 1024.0) * RANGE_MS
        w.sq((o.phase_range_m - rr) / RANGE_MS, 2.0 ** -31, 24)
    for c in present:                       # lock time indicator
        o = cell[c]
        w.u(min(int(o.lock_time_s), 1023), 10)
    for c in present:                       # half-cycle ambiguity
        w.u(0, 1)
    for c in present:                       # CNR, 2^-4 dB-Hz
        w.uq(min(cell[c].cn0_dbhz, 63.9), 2.0 ** -4, 10)
    for c in present:                       # fine phase rate, 0.0001 m/s
        o = cell[c]
        w.sq(o.phase_rate_m_s - round(o.phase_rate_m_s), 1e-4, 15)
    return w.array()


def decode_msm7(bits: np.ndarray) -> tuple[dict, list[MsmObservation]]:
    r = BitReader(bits)
    msg = r.u(12)
    station = r.u(12)
    epoch_ms = r.u(30)
    r.u(1 + 3 + 7 + 2 + 2 + 1 + 3)
    sats = [s for s in range(1, 65) if r.u(1)]
    sigs = [s for s in range(1, 33) if r.u(1)]
    cells = [(p, s) for p in sats for s in sigs]
    present = [c for c in cells if r.u(1)]

    n_ms = {p: r.u(8) for p in sats}
    for p in sats:
        r.u(4)
    frac = {p: r.u(10) / 1024.0 for p in sats}
    rate = {p: r.s(14) for p in sats}
    rough = {p: (n_ms[p] + frac[p]) * RANGE_MS for p in sats}

    fine_pr = [r.sq(2.0 ** -29, 20) * RANGE_MS for _ in present]
    fine_ph = [r.sq(2.0 ** -31, 24) * RANGE_MS for _ in present]
    lock = [r.u(10) for _ in present]
    half = [r.u(1) for _ in present]
    cnr = [r.uq(2.0 ** -4, 10) for _ in present]
    fine_rate = [r.sq(1e-4, 15) for _ in present]

    out = []
    for k, (p, s) in enumerate(present):
        out.append(MsmObservation(
            prn=p, signal_id=s,
            pseudorange_m=rough[p] + fine_pr[k],
            phase_range_m=rough[p] + fine_ph[k],
            phase_rate_m_s=rate[p] + fine_rate[k],
            cn0_dbhz=cnr[k], lock_time_s=float(lock[k])))
    return dict(msg=msg, station_id=station, epoch_ms=epoch_ms), out


# ---------------------------------------------------------------------------
# TCP broadcast server (reference: Rtcm_Printer's TCP server / NTRIP-less)
# ---------------------------------------------------------------------------


class RtcmServer:
    """Accepts TCP clients and broadcasts framed RTCM messages to all."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen(4)
        self.port = self._sock.getsockname()[1]
        self._clients: list[socket.socket] = []
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()

    def _accept_loop(self) -> None:
        self._sock.settimeout(0.2)
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            with self._lock:
                self._clients.append(conn)

    def send(self, payload_bits: np.ndarray) -> None:
        data = frame(payload_bits)
        with self._lock:
            alive = []
            for c in self._clients:
                try:
                    c.sendall(data)
                    alive.append(c)
                except OSError:
                    c.close()
            self._clients = alive

    def close(self) -> None:
        self._stop.set()
        try:
            self._sock.close()
        except OSError:
            pass
        with self._lock:
            for c in self._clients:
                c.close()
            self._clients.clear()
        self._thread.join(timeout=2.0)
