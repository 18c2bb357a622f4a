"""Broadcast atmosphere delay models: Klobuchar ionosphere, Saastamoinen
troposphere.

Reference analogs: RTKLIB ``ionmodel``/``tropmodel`` in ``rtklib_pntpos.cc``
(both are the standard published algorithms — IS-GPS-200 20.3.3.5.2.5 for
Klobuchar, Saastamoinen 1972 with the standard atmosphere for troposphere).
"""

from __future__ import annotations

import numpy as np

from gnss_sdr_tpu import constants as C


def klobuchar_delay(alpha, beta, lat_rad: float, lon_rad: float,
                    az_rad: float, el_rad: float, tow_s: float) -> float:
    """L1 ionospheric group delay in seconds (IS-GPS-200 Klobuchar model)."""
    if el_rad <= 0:
        el_rad = 1e-3
    el_sc = el_rad / np.pi     # semicircles
    lat_sc = lat_rad / np.pi
    lon_sc = lon_rad / np.pi

    psi = 0.0137 / (el_sc + 0.11) - 0.022
    phi_i = lat_sc + psi * np.cos(az_rad)
    phi_i = np.clip(phi_i, -0.416, 0.416)
    lam_i = lon_sc + psi * np.sin(az_rad) / np.cos(phi_i * np.pi)
    phi_m = phi_i + 0.064 * np.cos((lam_i - 1.617) * np.pi)

    t = 4.32e4 * lam_i + tow_s
    t = t % 86400.0

    amp = alpha[0] + phi_m * (alpha[1] + phi_m * (alpha[2] + phi_m * alpha[3]))
    per = beta[0] + phi_m * (beta[1] + phi_m * (beta[2] + phi_m * beta[3]))
    amp = max(amp, 0.0)
    per = max(per, 72000.0)

    x = 2.0 * np.pi * (t - 50400.0) / per
    f = 1.0 + 16.0 * (0.53 - el_sc) ** 3
    if abs(x) < 1.57:
        delay = f * (5e-9 + amp * (1.0 - x * x / 2.0 + x ** 4 / 24.0))
    else:
        delay = f * 5e-9
    return float(delay)


def saastamoinen_delay(el_rad: float, h_m: float, lat_rad: float = 0.0,
                       rel_humidity: float = 0.7) -> float:
    """Tropospheric delay in meters (Saastamoinen, standard atmosphere)."""
    if el_rad <= 0:
        el_rad = 1e-3
    h = max(min(h_m, 11000.0), 0.0)
    pres = 1013.25 * (1.0 - 2.2557e-5 * h) ** 5.2568
    temp = 15.0 - 6.5e-3 * h + 273.16
    e = 6.108 * rel_humidity * np.exp((17.15 * temp - 4684.0) / (temp - 38.45))
    z = np.pi / 2.0 - el_rad
    trop_h = 0.0022768 * pres / (1.0 - 0.00266 * np.cos(2.0 * lat_rad)
                                 - 0.00028 * h / 1e3) / np.cos(z)
    trop_w = 0.002277 * (1255.0 / temp + 0.05) * e / np.cos(z)
    return float(trop_h + trop_w)


def iono_delay_scaled(delay_l1_s: float, carrier_freq_hz: float) -> float:
    """Scale an L1 Klobuchar delay (s) to another carrier; returns meters."""
    f_l1 = 1_575_420_000.0
    return delay_l1_s * C.SPEED_OF_LIGHT_M_S * (f_l1 / carrier_freq_hz) ** 2
