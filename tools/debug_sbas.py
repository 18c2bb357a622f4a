"""Debug harness for the SBAS-corrected-fix failure (VERDICT r4 weak #1c).

Runs the e2e SBAS scenario once (fixtures cached), captures the corrected
receiver's observables + decoded corrections, then recomputes PVT offline
under correction variants:
  none    — degraded (broadcast af0 errors uncorrected)
  mt25    — the decoded SBAS long-term corrections (the product path)
  oracle  — the exact injected -daf0_err
If oracle == mt25 >> none is NOT observed, the gap is in how corrections
are applied; if oracle itself stays high, the error is elsewhere
(observables/ephemeris handling), not SBAS.
"""

import pathlib
import pickle
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]
                       / "tests"))

CACHE = pathlib.Path("/tmp/sbas_debug.pkl")


def build():
    import dataclasses
    from gnss_sdr_tpu.models.nav import sbas
    from gnss_sdr_tpu.io.sources import ArraySignalSource
    from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
    from gnss_sdr_tpu.utils import fixture_cache, scenario as scen

    DUR, FS, SBAS_PRN = 30.0, 2.0e6, 123
    rng = np.random.default_rng(17)
    base = scen.build_gps_l1_scenario(duration_s=DUR, n_sats=5,
                                      cn0_dbhz=47.0, fs=FS)
    prns = base.prns
    daf0_err = {p: float(rng.uniform(4e-8, 9e-8)) * (1 if i % 2 else -1)
                for i, p in enumerate(prns)}
    bad = {p: dataclasses.replace(base.ephemerides[p],
                                  af0=base.ephemerides[p].af0 + daf0_err[p])
           for p in prns}
    mask_bits = np.zeros(212, np.uint8)
    for p in prns:
        mask_bits[p - 1] = 1
    slots = {p: k + 1 for k, p in enumerate(sorted(prns))}
    lt = [sbas.LongTermCorrection(mask_no=slots[p], iode=0,
                                  dpos=(0.0, 0.0, 0.0), daf0=-daf0_err[p])
          for p in sorted(prns)]
    halves = []
    for k in range(0, len(lt), 2):
        halves.append(sbas.encode_type25_half(
            lt[k], lt[k + 1] if k + 1 < len(lt) else None))
    halves += [np.zeros(106, np.uint8)] * (len(halves) % 2)
    msgs = [(1, mask_bits)]
    for k in range(0, len(halves), 2):
        msgs.append((25, sbas.encode_type25(halves[k], halves[k + 1])))
    sc = scen.build_gps_l1_scenario(duration_s=DUR, n_sats=5,
                                    cn0_dbhz=47.0, fs=FS,
                                    broadcast_ephemerides=bad,
                                    sbas_prn=SBAS_PRN, sbas_messages=msgs)
    x = fixture_cache.cached_iq(
        "e2e_sbas", dict(dur=DUR, fs=FS, seed=23,
                         errs=tuple(sorted(daf0_err.items()))),
        lambda: sc.generate(seed=23))

    rx = Receiver(ReceiverConfig(
        signal="1C", fs=FS, n_channels=6,
        prns=tuple(list(sc.prns) + [SBAS_PRN]), chunk_ms=100,
        pvt_apply_tropo=False, pvt_apply_iono=False,
        carrier_smoothing_factor=25, pvt_apply_sbas=True))
    rx.run_source(ArraySignalSource(x, FS))

    data = dict(
        obs_log=rx.obs_log,
        decoded_eph={k: v for k, v in rx.ephemerides.items()},
        truth_eph={p: base.ephemerides[p] for p in prns},
        daf0_err=daf0_err,
        rcv_ecef=np.asarray(sc.rcv_ecef),
        rcv_llh=tuple(sc.rcv_llh),
        prns=list(prns),
        sbas_lt=rx.sbas_corrections()[0],
        fixes_on=[np.asarray(f.pos_ecef) for f in rx.fixes],
    )
    CACHE.write_bytes(pickle.dumps(data))
    return data


def replay(data, variant: str):
    from gnss_sdr_tpu.receiver.pvt import geodesy, solver as pvt_solver
    from gnss_sdr_tpu.models.nav.sbas import LongTermCorrection
    from gnss_sdr_tpu import constants

    if variant == "none":
        lt = None
    elif variant == "mt25":
        lt = data["sbas_lt"]
    elif variant == "oracle":
        lt = {("G", p): LongTermCorrection(
            mask_no=0, iode=0, dpos=(0.0, 0.0, 0.0), daf0=-e)
            for p, e in data["daf0_err"].items()}
    elif variant == "truth_eph":
        lt = None
    lat, lon, _ = data["rcv_llh"]
    eph = (data["truth_eph"] if variant == "truth_eph"
           else data["decoded_eph"])
    if variant == "truth_eph":
        eph = {("G", p): v for p, v in eph.items()}
    fixes = []
    for tick, obs in data["obs_log"]:
        ins = [pvt_solver.ObsInput(
            prn=o.prn, pseudorange_m=o.pseudorange_m, doppler_hz=o.doppler_hz,
            carrier_freq_hz=constants.SIGNALS[o.signal].carrier_freq_hz,
            t_tx_sv=o.t_tx_sv, cn0_dbhz=o.cn0_dbhz,
            system=constants.SIGNALS[o.signal].system)
            for o in obs if o.signal == "1C"]
        if len(ins) < 4:
            continue
        sol = pvt_solver.solve_pvt(ins, eph, iono=None, apply_tropo=False,
                                   sbas_lt=lt)
        if sol.valid:
            fixes.append(np.asarray(sol.pos_ecef))
    enu = np.stack([geodesy.ecef_to_enu(f - data["rcv_ecef"], lat, lon)
                    for f in fixes[-40:]]).mean(axis=0)
    print(f"{variant:>10}: n={len(fixes):4d} mean ENU "
          f"E={enu[0]:+7.3f} N={enu[1]:+7.3f} U={enu[2]:+7.3f} "
          f"3D={np.linalg.norm(enu):.3f}")
    return enu


if __name__ == "__main__":
    if CACHE.exists() and "--rerun" not in sys.argv:
        data = pickle.loads(CACHE.read_bytes())
        print(f"cache: {len(data['obs_log'])} obs epochs")
    else:
        data = build()
    for v in ("none", "mt25", "oracle", "truth_eph"):
        replay(data, v)
