"""RINEX 3.02 observation + navigation file writers.

Reference analog: ``Rinex_Printer`` (``src/algorithms/PVT/libs/rinex_printer.cc``,
the reference's single biggest output module). This is a fresh, compact
implementation of the subset the receiver produces: GPS L1 C/A and Galileo
E1-B observables (C/L/D/S) and LNAV / I/NAV ephemerides.
"""

from __future__ import annotations

import datetime
import pathlib

from gnss_sdr_tpu.receiver.pvt.gpstime import gps_to_gpsdatetime

_SYS_PREFIX = {"G": "G", "E": "E", "R": "R", "C": "C"}
_OBS_CODE = {"1C": "1C", "1B": "1B", "2S": "2S", "L5": "5I",
             "5X": "5I", "1G": "1C", "2G": "2C", "B1": "2I", "B3": "6I"}
_SYS_OF_SIGNAL = {"1C": "G", "2S": "G", "L5": "G", "1B": "E", "5X": "E",
                  "1G": "R", "2G": "R", "B1": "C", "B3": "C"}


def _hline(content: str, label: str) -> str:
    return f"{content:<60.60s}{label:<20.20s}\n"


def _f1912(x: float) -> str:
    """RINEX nav float: 19 chars, D exponent."""
    s = f"{x: 19.12E}"
    return s.replace("E", "D")


class RinexObsWriter:
    """Streaming RINEX observation writer (3.02 default, 2.11 option —
    the reference emits both, PVT.rinex_version)."""

    def __init__(self, path, signals: list[str], approx_pos=(0.0, 0.0, 0.0),
                 marker: str = "GNSS_SDR_TPU", version: str = "3.02"):
        self.path = pathlib.Path(path)
        self.signals = signals
        self.version = str(version)
        self._systems = sorted({_SYS_OF_SIGNAL[s] for s in signals})
        self._f = open(self.path, "w")
        self._wrote_header = False
        self._approx = approx_pos
        self._marker = marker

    def _header(self, week: int, tow: float) -> None:
        if self.version.startswith("2"):
            self._header_v2(week, tow)
            return
        f = self._f
        f.write(_hline("     3.02           OBSERVATION DATA    M: Mixed",
                       "RINEX VERSION / TYPE"))
        now = datetime.datetime.now(datetime.timezone.utc)
        f.write(_hline(f"gnss_sdr_tpu        CTTC-TPU            {now:%Y%m%d %H%M%S} UTC",
                       "PGM / RUN BY / DATE"))
        f.write(_hline(self._marker, "MARKER NAME"))
        f.write(_hline("unknown             unknown", "OBSERVER / AGENCY"))
        f.write(_hline("1                   GNSS-SDR-TPU        0.1",
                       "REC # / TYPE / VERS"))
        f.write(_hline("1                   NONE", "ANT # / TYPE"))
        x, y, z = self._approx
        f.write(_hline(f"{x:14.4f}{y:14.4f}{z:14.4f}", "APPROX POSITION XYZ"))
        f.write(_hline(f"{0.0:14.4f}{0.0:14.4f}{0.0:14.4f}",
                       "ANTENNA: DELTA H/E/N"))
        for sys in self._systems:
            codes = [_OBS_CODE[s] for s in self.signals
                     if _SYS_OF_SIGNAL[s] == sys]
            obs = "".join(f" C{c} L{c} D{c} S{c}" for c in codes)
            f.write(_hline(f"{sys}  {4 * len(codes):3d}{obs}",
                           "SYS / # / OBS TYPES"))
        t = gps_to_gpsdatetime(week, tow)
        f.write(_hline(
            f"  {t.year:4d}    {t.month:2d}    {t.day:2d}    {t.hour:2d}"
            f"    {t.minute:2d}   {t.second + t.microsecond / 1e6:10.7f}"
            f"     GPS", "TIME OF FIRST OBS"))
        f.write(_hline("", "END OF HEADER"))
        self._wrote_header = True

    def _header_v2(self, week: int, tow: float) -> None:
        f = self._f
        f.write(_hline("     2.11           OBSERVATION DATA    M (MIXED)",
                       "RINEX VERSION / TYPE"))
        now = datetime.datetime.now(datetime.timezone.utc)
        f.write(_hline(f"gnss_sdr_tpu        CTTC-TPU            {now:%Y%m%d %H%M%S} UTC",
                       "PGM / RUN BY / DATE"))
        f.write(_hline(self._marker, "MARKER NAME"))
        x, y, z = self._approx
        f.write(_hline(f"{x:14.4f}{y:14.4f}{z:14.4f}", "APPROX POSITION XYZ"))
        f.write(_hline(f"{4:6d}    C1    L1    D1    S1",
                       "# / TYPES OF OBSERV"))
        t = gps_to_gpsdatetime(week, tow)
        f.write(_hline(
            f"  {t.year:4d}    {t.month:2d}    {t.day:2d}    {t.hour:2d}"
            f"    {t.minute:2d}   {t.second + t.microsecond / 1e6:10.7f}"
            f"     GPS", "TIME OF FIRST OBS"))
        f.write(_hline("", "END OF HEADER"))
        self._wrote_header = True

    def write_epoch(self, week: int, tow: float, observables: list) -> None:
        """observables: list of ChannelObservable."""
        if not observables:
            return
        if not self._wrote_header:
            self._header(week, tow)
        t = gps_to_gpsdatetime(week, tow)
        sec = t.second + t.microsecond / 1e6
        if self.version.startswith("2"):
            ids = [f"{_SYS_OF_SIGNAL[o.signal]}{o.prn:02d}"
                   for o in observables]
            self._f.write(
                f" {t.year % 100:02d} {t.month:2d} {t.day:2d} {t.hour:2d} "
                f"{t.minute:2d}{sec:11.7f}  0{len(observables):3d}"
                f"{''.join(ids[:12])}\n")
            for k in range(12, len(ids), 12):   # v2 continuation lines
                self._f.write(" " * 32 + "".join(ids[k: k + 12]) + "\n")
            for o in observables:
                self._f.write(
                    f"{o.pseudorange_m:14.3f}  "
                    f"{o.carrier_phase_cycles:14.3f}  "
                    f"{o.doppler_hz:14.3f}  "
                    f"{o.cn0_dbhz:14.3f}\n")
            self._f.flush()
            return
        self._f.write(f"> {t.year:4d} {t.month:02d} {t.day:02d} {t.hour:02d} "
                      f"{t.minute:02d}{sec:11.7f}  0{len(observables):3d}\n")
        for o in observables:
            sys = _SYS_OF_SIGNAL[o.signal]
            self._f.write(
                f"{sys}{o.prn:02d}"
                f"{o.pseudorange_m:14.3f}  "
                f"{o.carrier_phase_cycles:14.3f}  "
                f"{o.doppler_hz:14.3f}  "
                f"{o.cn0_dbhz:14.3f}\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()


class RinexObsReader:
    """RINEX 3.x observation reader for the subset this framework writes
    (C/L/D/S per signal). Reference analog: the obs-input side of RTKLIB
    (rtklib_rinex); enough to replay logged epochs into the RTK engine.

    Returns epochs as (week_tow_tuple, [dict(system, prn, pseudorange_m,
    carrier_phase_cycles, doppler_hz, cn0_dbhz)]).
    """

    def __init__(self, path):
        self.path = pathlib.Path(path)

    def read_epochs(self) -> list:
        from gnss_sdr_tpu.receiver.pvt.gpstime import gpsdatetime_to_gps
        out = []
        lines = self.path.read_text().splitlines()
        i = 0
        while i < len(lines) and "END OF HEADER" not in lines[i]:
            i += 1
        i += 1
        while i < len(lines):
            ln = lines[i]
            if not ln.startswith(">"):
                i += 1
                continue
            parts = ln[1:].split()
            y, mo, d, h, mi = map(int, parts[:5])
            sec = float(parts[5])
            n = int(parts[7])
            week, tow = gpsdatetime_to_gps(
                datetime.datetime(y, mo, d, h, mi, int(sec),
                                  int((sec % 1) * 1e6)))
            epoch = []
            for k in range(n):
                i += 1
                row = lines[i]
                epoch.append(dict(
                    system=row[0], prn=int(row[1:3]),
                    pseudorange_m=float(row[3:17]),
                    carrier_phase_cycles=float(row[19:33]),
                    doppler_hz=float(row[35:49]),
                    cn0_dbhz=float(row[51:65])))
            out.append(((week, tow), epoch))
            i += 1
        return out


class RinexNavWriter:
    """RINEX 3.02 mixed navigation writer (GPS LNAV + Galileo I/NAV)."""

    def __init__(self, path):
        self.path = pathlib.Path(path)
        self._f = open(self.path, "w")
        self._wrote_header = False
        self._written: set[tuple] = set()

    def _header(self) -> None:
        f = self._f
        f.write(_hline("     3.02           N: GNSS NAV DATA    M: Mixed",
                       "RINEX VERSION / TYPE"))
        now = datetime.datetime.now(datetime.timezone.utc)
        f.write(_hline(f"gnss_sdr_tpu        CTTC-TPU            {now:%Y%m%d %H%M%S} UTC",
                       "PGM / RUN BY / DATE"))
        f.write(_hline("", "END OF HEADER"))
        self._wrote_header = True

    def write_ephemeris(self, eph, system: str = "G") -> None:
        key = (system, eph.prn, eph.iode, eph.toe)
        if key in self._written:
            return
        self._written.add(key)
        if not self._wrote_header:
            self._header()
        t = gps_to_gpsdatetime(eph.week, eph.toc)
        f = self._f
        f.write(f"{system}{eph.prn:02d} {t.year:4d} {t.month:02d} {t.day:02d} "
                f"{t.hour:02d} {t.minute:02d} {t.second:02d}"
                f"{_f1912(eph.af0)}{_f1912(eph.af1)}{_f1912(eph.af2)}\n")

        def line(*vals):
            f.write("    " + "".join(_f1912(v) for v in vals) + "\n")

        line(float(eph.iode), eph.crs, eph.delta_n, eph.m0)
        line(eph.cuc, eph.e, eph.cus, eph.sqrt_a)
        line(eph.toe, eph.cic, eph.omega0, eph.cis)
        line(eph.i0, eph.crc, eph.omega, eph.omega_dot)
        line(eph.idot, 1.0, float(eph.week), 0.0)
        line(float(eph.ura), float(eph.health), eph.tgd, float(eph.iodc))
        line(eph.toe, 4.0)
        self._f.flush()

    def close(self) -> None:
        self._f.close()
