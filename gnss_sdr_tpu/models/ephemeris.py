"""Broadcast ephemeris models and satellite position/clock computation.

Fills the role of the reference's per-system ephemeris classes
(``src/core/system_parameters/gps_ephemeris.cc`` etc.) and of the RTKLIB
``eph2pos``/``eph2clk`` routines (``src/algorithms/libs/rtklib/rtklib_ephemeris.cc``)
with one Kepler dataclass + vectorized numpy float64 evaluation (PVT runs on
host — f64 there is free, and the TPU hot path never touches it).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from gnss_sdr_tpu import constants as C


@dataclasses.dataclass
class KeplerEphemeris:
    """Keplerian broadcast ephemeris (GPS LNAV conventions; also used for
    Galileo I/NAV and BeiDou D1 with their GM / Omega_e constants)."""

    prn: int = 0
    week: int = 0
    # clock
    toc: float = 0.0       # [s of week]
    af0: float = 0.0
    af1: float = 0.0
    af2: float = 0.0
    tgd: float = 0.0
    # orbit
    toe: float = 0.0       # [s of week]
    sqrt_a: float = 0.0    # [m^0.5]
    e: float = 0.0
    m0: float = 0.0        # [rad]
    delta_n: float = 0.0   # [rad/s]
    omega0: float = 0.0    # [rad]
    omega_dot: float = 0.0  # [rad/s]
    omega: float = 0.0     # argument of perigee [rad]
    i0: float = 0.0        # [rad]
    idot: float = 0.0      # [rad/s]
    cuc: float = 0.0
    cus: float = 0.0
    crc: float = 0.0
    crs: float = 0.0
    cic: float = 0.0
    cis: float = 0.0
    iode: int = 0
    iodc: int = 0
    health: int = 0
    ura: int = 0
    # system constants (override for Galileo/BeiDou)
    gm: float = C.GM_EARTH
    omega_e: float = C.OMEGA_EARTH_DOT

    def clock_offset(self, t_sv: float) -> float:
        """SV clock offset (s) at transmit time t_sv (s of week), incl.
        relativistic correction, excl. TGD (applied per-signal in PVT)."""
        dt = time_diff_wrap(t_sv, self.toc)
        dts = self.af0 + self.af1 * dt + self.af2 * dt * dt
        # relativistic correction needs eccentric anomaly
        ek = self._eccentric_anomaly(t_sv - dts)
        dts += C.F_REL * self.e * self.sqrt_a * np.sin(ek)
        return dts

    def _eccentric_anomaly(self, t: float) -> float:
        a = self.sqrt_a ** 2
        n = np.sqrt(self.gm / a ** 3) + self.delta_n
        mk = self.m0 + n * time_diff_wrap(t, self.toe)
        ek = mk
        for _ in range(12):
            ek = mk + self.e * np.sin(ek)
        return ek

    def position_velocity(self, t_sv: float):
        """ECEF position (m) and velocity (m/s) at transmit time t_sv (s of week).

        Standard IS-GPS-200 Table 20-IV algorithm, with velocity by analytic
        differentiation.
        """
        a = self.sqrt_a ** 2
        n = np.sqrt(self.gm / a ** 3) + self.delta_n
        tk = time_diff_wrap(t_sv, self.toe)
        mk = self.m0 + n * tk
        ek = self._eccentric_anomaly(t_sv)
        ek_dot = n / (1.0 - self.e * np.cos(ek))

        sin_ek, cos_ek = np.sin(ek), np.cos(ek)
        vk = np.arctan2(np.sqrt(1.0 - self.e ** 2) * sin_ek, cos_ek - self.e)
        vk_dot = ek_dot * np.sqrt(1.0 - self.e ** 2) / (1.0 - self.e * cos_ek)

        phik = vk + self.omega
        s2p, c2p = np.sin(2 * phik), np.cos(2 * phik)
        duk = self.cus * s2p + self.cuc * c2p
        drk = self.crs * s2p + self.crc * c2p
        dik = self.cis * s2p + self.cic * c2p

        uk = phik + duk
        rk = a * (1.0 - self.e * cos_ek) + drk
        ik = self.i0 + self.idot * tk + dik

        uk_dot = vk_dot * (1.0 + 2.0 * (self.cus * c2p - self.cuc * s2p))
        rk_dot = a * self.e * sin_ek * ek_dot + 2.0 * vk_dot * (self.crs * c2p - self.crc * s2p)
        ik_dot = self.idot + 2.0 * vk_dot * (self.cis * c2p - self.cic * s2p)

        xk_p = rk * np.cos(uk)
        yk_p = rk * np.sin(uk)
        xk_p_dot = rk_dot * np.cos(uk) - rk * np.sin(uk) * uk_dot
        yk_p_dot = rk_dot * np.sin(uk) + rk * np.cos(uk) * uk_dot

        omk = (self.omega0 + (self.omega_dot - self.omega_e) * tk
               - self.omega_e * self.toe)
        omk_dot = self.omega_dot - self.omega_e
        so, co = np.sin(omk), np.cos(omk)
        si, ci = np.sin(ik), np.cos(ik)

        x = xk_p * co - yk_p * ci * so
        y = xk_p * so + yk_p * ci * co
        z = yk_p * si

        vx = (xk_p_dot * co - yk_p_dot * ci * so + yk_p * si * so * ik_dot
              - y * omk_dot)
        vy = (xk_p_dot * so + yk_p_dot * ci * co - yk_p * si * co * ik_dot
              + x * omk_dot)
        vz = yk_p_dot * si + yk_p * ci * ik_dot

        return np.array([x, y, z]), np.array([vx, vy, vz])


def time_diff_wrap(t1: float, t2: float) -> float:
    """t1 - t2 accounting for GPS week rollover (result in [-302400, 302400])."""
    dt = t1 - t2
    if dt > C.HALF_WEEK:
        dt -= C.SECONDS_PER_WEEK
    elif dt < -C.HALF_WEEK:
        dt += C.SECONDS_PER_WEEK
    return dt


@dataclasses.dataclass
class IonoParams:
    """Klobuchar broadcast ionosphere parameters (LNAV subframe 4 page 18)."""

    alpha: tuple = (0.0, 0.0, 0.0, 0.0)
    beta: tuple = (0.0, 0.0, 0.0, 0.0)
    valid: bool = False


@dataclasses.dataclass
class UtcParams:
    a0: float = 0.0
    a1: float = 0.0
    tot: float = 0.0
    wnt: int = 0
    delta_t_ls: int = 18
    valid: bool = False
    # drift-rate + leap-second event fields (CNAV MT33 carries all of
    # them, IS-GPS-200 30.3.3.6.2; LNAV SF4 p18 carries the event set)
    a2: float = 0.0
    wn_lsf: int = 0
    dn: int = 0
    delta_t_lsf: int = 18
