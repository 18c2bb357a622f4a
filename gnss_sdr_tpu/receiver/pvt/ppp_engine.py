"""PPP engine: receiver observables -> iono-free combinations -> PPP filter.

Reference analog: the PPP positioning modes of the PVT block
(``rtklib_pvt_gs`` with PVT.positioning_mode=PPP_Static / PPP_Kinematic
driving ``pppos`` in rtklib_ppp.cc). Consumes the receiver's per-epoch
``ChannelObservable`` lists via ``rx.obs_sinks``: satellites observed on two
frequencies form dual-frequency iono-free code/phase (enabling PPP-AR via
the Melbourne-Wübbena wide lane); single-frequency satellites are skipped
(classic PPP is a dual-frequency technique).
"""

from __future__ import annotations

import numpy as np

from gnss_sdr_tpu import constants
from gnss_sdr_tpu.receiver.pvt import ppp_ar

C_M_S = constants.SPEED_OF_LIGHT_M_S


class PppEngine:
    """Attach with ``rx.obs_sinks.append(engine.push_epoch)``."""

    def __init__(self, ephemerides: dict, x0_ecef, mode: str = "static",
                 ambiguity_resolution: bool = True,
                 sigma_pr_m: float = 1.0, sigma_phase_m: float = 0.012,
                 q_pos_m2_s: float = 1.0):
        self.filter = ppp_ar.PppArFilter(
            ephemerides, x0_ecef=np.asarray(x0_ecef, float),
            mode=mode, q_pos_m2_s=q_pos_m2_s,
            sigma_pr_m=sigma_pr_m, sigma_phase_m=sigma_phase_m,
            # disable the integer search by an impossible ratio threshold
            ratio_threshold=(3.0 if ambiguity_resolution else np.inf))
        self.solutions: list = []
        self._last_tow: float | None = None
        self._prev: dict[tuple, tuple] = {}  # (sys,prn,f) -> (tow, phase, dop)

    # --------------------------------------------------------------- slips
    def _detect_slips(self, obs_by_sat: dict, tow: float) -> set:
        slips = set()
        for (system, prn), pairs in obs_by_sat.items():
            for o in pairs:
                key = (system, prn, o.signal)
                prev = self._prev.get(key)
                if prev is not None:
                    t0, cp0, d0 = prev
                    dt = tow - t0
                    if 0.0 < dt <= 10.0:
                        pred = -0.5 * (o.doppler_hz + d0) * dt
                        if abs(o.carrier_phase_cycles - cp0 - pred) > 2.0:
                            slips.add((system, prn))
                self._prev[key] = (tow, o.carrier_phase_cycles, o.doppler_hz)
        return slips

    def seed_position(self, pos_ecef) -> None:
        """One-time position seed from the receiver's single-point fix
        (the PPP linearization needs a rough absolute position)."""
        if np.linalg.norm(self.filter.x[:3]) < 1e6:
            self.filter.x[:3] = np.asarray(pos_ecef, float)

    # --------------------------------------------------------------- epoch
    def push_epoch(self, tick_sample: int, observables: list) -> None:
        if np.linalg.norm(self.filter.x[:3]) < 1e6:
            return                       # not seeded yet
        by_sat: dict[tuple, list] = {}
        for o in observables:
            spec = constants.SIGNALS[o.signal]
            by_sat.setdefault((spec.system, o.prn), []).append(o)
        if not by_sat:
            return
        o0 = observables[0]
        tow = o0.t_tx_sv + o0.pseudorange_m / C_M_S
        slips = self._detect_slips(by_sat, tow)

        obs = []
        for (system, prn), chans in by_sat.items():
            if len(chans) < 2:
                continue
            chans = sorted(chans, key=lambda o:
                           -constants.SIGNALS[o.signal].carrier_freq_hz)
            o1, o2 = chans[0], chans[1]
            f1 = constants.SIGNALS[o1.signal].carrier_freq_hz
            f2 = constants.SIGNALS[o2.signal].carrier_freq_hz
            if f1 == f2:
                continue
            lam1, lam2 = C_M_S / f1, C_M_S / f2
            a1 = f1 * f1 / (f1 * f1 - f2 * f2)
            a2 = f2 * f2 / (f1 * f1 - f2 * f2)
            obs.append(ppp_ar.PppArObs(
                prn=prn, system=system, t_tx_sv=o1.t_tx_sv,
                pr_if_m=a1 * o1.pseudorange_m - a2 * o2.pseudorange_m,
                phase_if_m=(a1 * o1.carrier_phase_cycles * lam1
                            - a2 * o2.carrier_phase_cycles * lam2),
                p1_m=o1.pseudorange_m, p2_m=o2.pseudorange_m,
                l1_cycles=o1.carrier_phase_cycles,
                l2_cycles=o2.carrier_phase_cycles,
                f1_hz=f1, f2_hz=f2))
        if len(obs) < 4:
            return
        dt = (tow - self._last_tow) if self._last_tow is not None else 1.0
        self._last_tow = tow
        sol = self.filter.update(obs, dt_s=max(dt, 1e-3), slips=slips)
        if sol.valid:
            self.solutions.append(sol)
