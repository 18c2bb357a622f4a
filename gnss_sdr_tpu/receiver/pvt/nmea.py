"""NMEA-0183 sentence output (GGA, RMC, GSA).

Reference analog: ``Nmea_Printer``
(``src/algorithms/PVT/libs/nmea_printer.cc``)."""

from __future__ import annotations

import math
import pathlib

from gnss_sdr_tpu.receiver.pvt.gpstime import gps_to_datetime


def _checksum(body: str) -> str:
    c = 0
    for ch in body:
        c ^= ord(ch)
    return f"{c:02X}"


def _sentence(body: str) -> str:
    return f"${body}*{_checksum(body)}\r\n"


def _lat_str(lat_rad: float) -> tuple[str, str]:
    lat = math.degrees(lat_rad)
    hemi = "N" if lat >= 0 else "S"
    lat = abs(lat)
    deg = int(lat)
    minutes = (lat - deg) * 60.0
    return f"{deg:02d}{minutes:010.7f}", hemi


def _lon_str(lon_rad: float) -> tuple[str, str]:
    lon = math.degrees(lon_rad)
    hemi = "E" if lon >= 0 else "W"
    lon = abs(lon)
    deg = int(lon)
    minutes = (lon - deg) * 60.0
    return f"{deg:03d}{minutes:010.7f}", hemi


def gga(sol) -> str:
    t = gps_to_datetime(sol.week, sol.tow_s)
    lat, ns = _lat_str(sol.lat_rad)
    lon, ew = _lon_str(sol.lon_rad)
    body = (f"GPGGA,{t:%H%M%S}.{int(t.microsecond/1e4):02d},{lat},{ns},"
            f"{lon},{ew},1,{sol.n_sats:02d},{sol.hdop:.1f},"
            f"{sol.height_m:.1f},M,0.0,M,,")
    return _sentence(body)


def rmc(sol) -> str:
    t = gps_to_datetime(sol.week, sol.tow_s)
    lat, ns = _lat_str(sol.lat_rad)
    lon, ew = _lon_str(sol.lon_rad)
    import numpy as np
    ve, vn = sol.vel_ecef[0], sol.vel_ecef[1]  # approx; proper ENU below
    from gnss_sdr_tpu.receiver.pvt.geodesy import ecef_to_enu
    enu = ecef_to_enu(np.asarray(sol.vel_ecef), sol.lat_rad, sol.lon_rad)
    speed_kt = float(np.hypot(enu[0], enu[1])) * 1.9438445
    course = math.degrees(math.atan2(enu[0], enu[1])) % 360.0
    body = (f"GPRMC,{t:%H%M%S}.{int(t.microsecond/1e4):02d},A,{lat},{ns},"
            f"{lon},{ew},{speed_kt:.2f},{course:.2f},{t:%d%m%y},,,A")
    return _sentence(body)


def gsa(sol, prns=()) -> str:
    ids = ",".join(f"{p:02d}" for p in list(prns)[:12])
    ids = ids + "," * (11 - min(len(list(prns)), 12) + (0 if prns else 0))
    fields = list(prns)[:12] + [""] * (12 - min(len(list(prns)), 12))
    ids = ",".join(f"{p:02d}" if p != "" else "" for p in fields)
    body = f"GPGSA,A,3,{ids},{sol.pdop:.1f},{sol.hdop:.1f},{sol.vdop:.1f}"
    return _sentence(body)


class NmeaPrinter:
    def __init__(self, path: str | pathlib.Path):
        self.path = pathlib.Path(path)
        self._f = open(self.path, "w")

    def push(self, sol, prns=()) -> None:
        if not sol.valid:
            return
        self._f.write(gga(sol))
        self._f.write(rmc(sol))
        if prns:
            self._f.write(gsa(sol, prns))
        self._f.flush()

    def close(self) -> None:
        self._f.close()
