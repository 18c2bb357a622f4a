"""Synthetic GPS constellation + consistent observation simulation.

Test/system-simulation support (analog of the external gnss-sim the reference's
system tests spawn, ``position_test.cc:106``): build an almanac-like 31-SV
constellation, compute visibility, and generate *self-consistent* pseudorange /
Doppler observations for a given receiver truth — the oracle for PVT tests and
for full signal-level simulation.
"""

from __future__ import annotations

import numpy as np

from gnss_sdr_tpu import constants as C
from gnss_sdr_tpu.models.ephemeris import KeplerEphemeris
from gnss_sdr_tpu.receiver.pvt import geodesy
from gnss_sdr_tpu.receiver.pvt.solver import ObsInput


def almanac_constellation(week: int = 245, toe: float = 352800.0,
                          n_sats: int = 31) -> dict[int, KeplerEphemeris]:
    """Nominal GPS constellation: 6 planes at 55 deg inclination."""
    out = {}
    rng = np.random.default_rng(42)
    for prn in range(1, n_sats + 1):
        plane = (prn - 1) % 6
        slot = (prn - 1) // 6
        out[prn] = KeplerEphemeris(
            prn=prn, week=week, toe=toe, toc=toe,
            sqrt_a=5153.7 + rng.normal(0, 0.5),
            e=0.005 + 0.01 * rng.random(),
            m0=(slot * 2 * np.pi / 5.2 + plane * 2 * np.pi / 12.0
                + rng.normal(0, 0.1)) % (2 * np.pi) - np.pi,
            delta_n=rng.normal(0, 4e-9),
            omega0=(plane * np.pi / 3 + rng.normal(0, 0.02)) % (2 * np.pi) - np.pi,
            omega_dot=-8.0e-9 + rng.normal(0, 2e-10),
            omega=rng.uniform(-np.pi, np.pi),
            i0=np.deg2rad(55.0) + rng.normal(0, 0.01),
            idot=rng.normal(0, 2e-10),
            af0=rng.normal(0, 2e-4), af1=rng.normal(0, 1e-11), af2=0.0,
            tgd=rng.normal(0, 5e-9),
            cuc=rng.normal(0, 2e-6), cus=rng.normal(0, 7e-6),
            crc=rng.normal(200, 50), crs=rng.normal(0, 50),
            cic=rng.normal(0, 1e-7), cis=rng.normal(0, 1e-7),
            iode=int(prn), iodc=int(prn),
        )
    return out


def visible_sats(ephemerides: dict[int, KeplerEphemeris], rcv_ecef: np.ndarray,
                 t_gps: float, el_mask_deg: float = 10.0) -> list[tuple[int, float, float]]:
    """[(prn, az_rad, el_rad)] of satellites above the elevation mask."""
    out = []
    for prn, eph in ephemerides.items():
        pos, _ = eph.position_velocity(t_gps)
        az, el = geodesy.az_el(rcv_ecef, pos)
        if np.rad2deg(el) >= el_mask_deg:
            out.append((prn, az, el))
    out.sort(key=lambda x: -x[2])
    return out


def simulate_observation(eph: KeplerEphemeris, rcv_ecef: np.ndarray,
                         t_reception_gps: float, *,
                         rcv_clock_bias_s: float = 0.0,
                         rcv_vel_ecef: np.ndarray | None = None,
                         carrier_freq_hz: float = 1_575_420_000.0,
                         cn0_dbhz: float = 45.0) -> ObsInput:
    """Simulate one self-consistent pseudorange/Doppler observation.

    Solves the light-time equation iteratively; the returned ObsInput carries
    the SV-clock transmit time and the receiver-clock pseudorange, exactly as
    the receiver chain would measure them.
    """
    if rcv_vel_ecef is None:
        rcv_vel_ecef = np.zeros(3)

    # light-time iteration for transmit time in GPS time
    tau = 0.070
    t_tx = t_reception_gps - tau
    for _ in range(6):
        pos, vel = eph.position_velocity(t_tx)
        theta = C.OMEGA_EARTH_DOT * tau
        c, s = np.cos(theta), np.sin(theta)
        pos_r = np.array([c * pos[0] + s * pos[1],
                          -s * pos[0] + c * pos[1], pos[2]])
        rho = np.linalg.norm(pos_r - rcv_ecef)
        tau = rho / C.SPEED_OF_LIGHT_M_S
        t_tx = t_reception_gps - tau

    dts = eph.clock_offset(t_tx + eph.clock_offset(t_tx))  # sv-time arg, ~exact
    t_tx_sv = t_tx + dts
    t_offset = tau - dts        # t_tx_sv = t_reception - t_offset, exactly
    # receiver-clock timestamps
    pr = C.SPEED_OF_LIGHT_M_S * ((t_reception_gps + rcv_clock_bias_s) - t_tx_sv)
    # TGD applies to L1 single-frequency pseudoranges (IS-GPS-200
    # 20.3.3.3.3.2); GLONASS state-vector ephemerides carry none
    pr += C.SPEED_OF_LIGHT_M_S * getattr(eph, "tgd", 0.0)

    # Doppler: range-rate in the reception-epoch ECEF frame (broadcast-model
    # velocity is already expressed in the rotating ECEF frame)
    vel_r = np.array([np.cos(C.OMEGA_EARTH_DOT * tau) * vel[0] + np.sin(C.OMEGA_EARTH_DOT * tau) * vel[1],
                      -np.sin(C.OMEGA_EARTH_DOT * tau) * vel[0] + np.cos(C.OMEGA_EARTH_DOT * tau) * vel[1],
                      vel[2]])
    los = (pos_r - rcv_ecef) / np.linalg.norm(pos_r - rcv_ecef)
    rr = los @ (vel_r - rcv_vel_ecef)
    ddts = (eph.af1 + 2.0 * eph.af2 * (t_tx_sv - eph.toc)
            if hasattr(eph, "af1") else getattr(eph, "gamma_n", 0.0))
    lam = C.SPEED_OF_LIGHT_M_S / carrier_freq_hz
    doppler = -(rr - C.SPEED_OF_LIGHT_M_S * ddts) / lam

    return ObsInput(prn=getattr(eph, "prn", getattr(eph, "slot", 0)),
                    pseudorange_m=float(pr), doppler_hz=float(doppler),
                    carrier_freq_hz=carrier_freq_hz, t_tx_sv=float(t_tx_sv),
                    cn0_dbhz=cn0_dbhz, t_offset_s=float(t_offset))
