"""Single-point PVT solver: Bancroft initialization + iterated weighted LS.

The TPU receiver's equivalent of the reference PVT core
(``Rtklib_Solver::get_PVT`` -> ``rtkpos`` -> ``pntpos``,
``src/algorithms/libs/rtklib/rtklib_pntpos.cc:161``): single-point position,
velocity and receiver clock from pseudoranges/Doppler, with SV clock,
relativistic, TGD, Klobuchar iono, Saastamoinen tropo and Earth-rotation
corrections. Host numpy float64 — PVT runs at ~Hz, precision matters more
than throughput here.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from gnss_sdr_tpu import constants as C
from gnss_sdr_tpu.models.ephemeris import IonoParams, KeplerEphemeris
from gnss_sdr_tpu.receiver.pvt import atmosphere, geodesy


@dataclasses.dataclass
class ObsInput:
    """One channel's measurement at a common receiver epoch."""

    prn: int
    pseudorange_m: float
    doppler_hz: float          # carrier Doppler (positive = approaching)
    carrier_freq_hz: float     # nominal carrier of the tracked signal
    t_tx_sv: float             # transmit time in SV clock (s of week)
    cn0_dbhz: float = 45.0


@dataclasses.dataclass
class PvtSolution:
    valid: bool
    pos_ecef: np.ndarray = None
    vel_ecef: np.ndarray = None
    clock_bias_s: float = 0.0
    clock_drift_s_s: float = 0.0
    tow_s: float = 0.0
    week: int = 0
    n_sats: int = 0
    gdop: float = 0.0
    pdop: float = 0.0
    hdop: float = 0.0
    vdop: float = 0.0
    residuals_m: np.ndarray = None
    lat_rad: float = 0.0
    lon_rad: float = 0.0
    height_m: float = 0.0


def bancroft(sat_pos: np.ndarray, pr: np.ndarray) -> np.ndarray:
    """Closed-form initial position+clock (Bancroft 1985).

    sat_pos: [N,3] ECEF at transmit (rotated), pr: [N] corrected pseudoranges.
    Returns [x, y, z, c*dt].
    """
    n = len(pr)
    b = np.hstack([sat_pos, pr[:, None]])
    alpha = 0.5 * (np.sum(sat_pos ** 2, axis=1) - pr ** 2)
    m = np.diag([1.0, 1.0, 1.0, -1.0])

    def lorentz(a, bb):
        return a @ m @ bb

    binv = np.linalg.pinv(b)
    e = binv @ np.ones(n)
    f = binv @ alpha
    a2 = lorentz(e, e)
    a1 = 2.0 * (lorentz(e, f) - 1.0)
    a0 = lorentz(f, f)
    disc = a1 * a1 - 4.0 * a2 * a0
    if disc < 0:
        disc = 0.0
    best, best_res = None, np.inf
    for sgn in (+1.0, -1.0):
        if abs(a2) < 1e-12:
            lam = -a0 / a1 if a1 != 0 else 0.0
        else:
            lam = (-a1 + sgn * np.sqrt(disc)) / (2.0 * a2)
        u = lam * e + f
        u[3] = -u[3]
        res = np.linalg.norm(np.linalg.norm(sat_pos - u[:3], axis=1)
                             + u[3] - pr)
        if res < best_res:
            best, best_res = u, res
    return best


def _rotate_sat(pos: np.ndarray, tau: float) -> np.ndarray:
    """Rotate a satellite ECEF position by Earth rotation during flight tau."""
    theta = C.OMEGA_EARTH_DOT * tau
    c, s = np.cos(theta), np.sin(theta)
    return np.array([c * pos[0] + s * pos[1], -s * pos[0] + c * pos[1], pos[2]])


def solve_pvt(obs: list[ObsInput], ephemerides: dict[int, KeplerEphemeris],
              iono: IonoParams | None = None,
              apply_tropo: bool = True, n_iter: int = 8,
              el_mask_rad: float = np.deg2rad(5.0)) -> PvtSolution:
    """Iterated WLS single-point solution at one receiver epoch."""
    usable = [o for o in obs if o.prn in ephemerides]
    if len(usable) < 4:
        return PvtSolution(valid=False, n_sats=len(usable))

    n = len(usable)
    sat_pos = np.zeros((n, 3))
    sat_vel = np.zeros((n, 3))
    dts = np.zeros(n)
    ddts = np.zeros(n)
    tgd = np.zeros(n)
    for i, o in enumerate(usable):
        eph = ephemerides[o.prn]
        dt_sv = eph.clock_offset(o.t_tx_sv)
        t_gps = o.t_tx_sv - dt_sv
        p, v = eph.position_velocity(t_gps)
        sat_pos[i] = p
        sat_vel[i] = v
        dts[i] = dt_sv
        ddts[i] = eph.af1 + 2.0 * eph.af2 * (o.t_tx_sv - eph.toc)
        tgd[i] = eph.tgd

    pr_raw = np.array([o.pseudorange_m for o in usable])
    # SV clock correction (incl. relativistic); TGD applies on L1
    pr = pr_raw + C.SPEED_OF_LIGHT_M_S * (dts - tgd)

    # initial guess: Bancroft on clock-corrected ranges (rough rotation)
    tau0 = pr / C.SPEED_OF_LIGHT_M_S
    sp0 = np.stack([_rotate_sat(sat_pos[i], tau0[i]) for i in range(n)])
    try:
        u0 = bancroft(sp0, pr)
        x = np.array([u0[0], u0[1], u0[2], u0[3]])
    except np.linalg.LinAlgError:
        x = np.zeros(4)

    week = 0
    used = np.ones(n, bool)
    h = np.zeros((n, 4))
    resid = np.zeros(n)
    w = np.ones(n)
    for it in range(n_iter):
        lat, lon, hgt = geodesy.ecef_to_geodetic(x[:3])
        for i in range(n):
            tau = np.linalg.norm(sat_pos[i] - x[:3]) / C.SPEED_OF_LIGHT_M_S
            sp = _rotate_sat(sat_pos[i], tau)
            rho = np.linalg.norm(sp - x[:3])
            los = (sp - x[:3]) / rho
            corr = 0.0
            if it >= 2 and np.isfinite(hgt) and -1e3 < hgt < 2e4:
                az, el = geodesy.az_el(x[:3], sp)
                used[i] = el > el_mask_rad
                w[i] = np.sin(el) ** 2 if el > 0 else 1e-4
                if iono is not None and iono.valid:
                    d_l1 = atmosphere.klobuchar_delay(
                        iono.alpha, iono.beta, lat, lon, az, el,
                        usable[i].t_tx_sv)
                    corr += atmosphere.iono_delay_scaled(
                        d_l1, usable[i].carrier_freq_hz)
                if apply_tropo:
                    corr += atmosphere.saastamoinen_delay(el, hgt, lat)
            h[i] = [-los[0], -los[1], -los[2], 1.0]
            resid[i] = pr[i] - (rho + x[3] + corr)
        hw = h[used] * w[used, None]
        try:
            dx = np.linalg.lstsq(hw.T @ h[used], hw.T @ resid[used], rcond=None)[0]
        except np.linalg.LinAlgError:
            return PvtSolution(valid=False, n_sats=n)
        x += dx
        if np.linalg.norm(dx[:3]) < 1e-4:
            break

    if used.sum() < 4 or not np.all(np.isfinite(x)):
        return PvtSolution(valid=False, n_sats=int(used.sum()))

    # velocity from Doppler: rr = -lambda * fd ; rr_pred = los.(v_sat - v_rcv)
    # + c*(ddt_rx - ddt_sv) (+ Earth-rotation term folded into rotation)
    g = np.zeros((n, 4))
    rr = np.zeros(n)
    for i, o in enumerate(usable):
        tau = np.linalg.norm(sat_pos[i] - x[:3]) / C.SPEED_OF_LIGHT_M_S
        sp = _rotate_sat(sat_pos[i], tau)
        rho = np.linalg.norm(sp - x[:3])
        los = (sp - x[:3]) / rho
        lam = C.SPEED_OF_LIGHT_M_S / o.carrier_freq_hz
        # broadcast-model satellite velocity is already ECEF (rotating frame);
        # only rotate it into the reception-epoch frame — do NOT add omega x r
        sv = _rotate_sat(sat_vel[i], tau)
        rr[i] = -lam * o.doppler_hz + C.SPEED_OF_LIGHT_M_S * ddts[i] - los @ sv
        g[i] = [-los[0], -los[1], -los[2], 1.0]
    gw = g[used] * w[used, None]
    try:
        vsol = np.linalg.lstsq(gw.T @ g[used], gw.T @ rr[used], rcond=None)[0]
    except np.linalg.LinAlgError:
        vsol = np.zeros(4)

    lat, lon, hgt = geodesy.ecef_to_geodetic(x[:3])
    los_all = np.stack([
        (_rotate_sat(sat_pos[i], np.linalg.norm(sat_pos[i] - x[:3])
                     / C.SPEED_OF_LIGHT_M_S) - x[:3]) for i in range(n)])
    los_all /= np.linalg.norm(los_all, axis=1, keepdims=True)
    d = geodesy.dops(los_all[used], x[:3])

    t_rx = usable[0].t_tx_sv + pr_raw[0] / C.SPEED_OF_LIGHT_M_S
    return PvtSolution(
        valid=True, pos_ecef=x[:3].copy(), vel_ecef=vsol[:3].copy(),
        clock_bias_s=x[3] / C.SPEED_OF_LIGHT_M_S,
        clock_drift_s_s=vsol[3] / C.SPEED_OF_LIGHT_M_S,
        tow_s=t_rx - x[3] / C.SPEED_OF_LIGHT_M_S, week=week,
        n_sats=int(used.sum()), residuals_m=resid.copy(),
        lat_rad=lat, lon_rad=lon, height_m=hgt, **d_subset(d))


def d_subset(d: dict) -> dict:
    return {k: d[k] for k in ("gdop", "pdop", "hdop", "vdop")}
