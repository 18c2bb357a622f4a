"""Debug harness for the dual-band PPP-AR e2e failure (VERDICT r4 weak #1).

Stage 1 (expensive, cached): rebuild tests/test_e2e_multisource.py's
dual_band_run receiver, run it, and pickle the merged observable epochs +
scenario truth.
Stage 2 (fast, repeatable): replay the cached epochs through PppEngine and
print the convergence / AR time series so filter changes iterate in seconds.

Usage: python tools/debug_ppp_ar.py [--replay-only]
"""

import pickle
import pathlib
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tests"))

CACHE = pathlib.Path("/tmp/ppp_ar_debug.pkl")

T0 = 352800.08
DUR = 42.0
FS_L1 = 2.0e6
FS_L5 = 12.0e6


def build_and_run():
    from gnss_sdr_tpu.io.sources import ArraySignalSource
    from gnss_sdr_tpu.receiver.multisource import (MultiSourceReceiver,
                                                   SourceBranchConfig)
    from gnss_sdr_tpu.receiver.receiver import ReceiverConfig
    from gnss_sdr_tpu.utils import fixture_cache, scenario as scen

    sc1 = scen.build_gps_l1_scenario(t0_gps=T0, duration_s=DUR, n_sats=7,
                                     cn0_dbhz=50.0, fs=FS_L1,
                                     el_mask_deg=10.0)
    sc5 = scen.build_gps_l5_scenario(t0_gps=T0, duration_s=DUR, n_sats=7,
                                     cn0_dbhz=50.0, fs=FS_L5,
                                     el_mask_deg=10.0)
    x1 = fixture_cache.cached_iq(
        "e2e_ms_l1", dict(t0=T0, dur=DUR, n=7, cn0=50, fs=FS_L1, seed=101),
        lambda: sc1.generate(seed=101))
    x5 = fixture_cache.cached_iq(
        "e2e_ms_l5", dict(t0=T0, dur=DUR, n=7, cn0=50, fs=FS_L5, seed=102),
        lambda: sc5.generate(seed=102))
    mk = lambda sig, fs, n, prns: ReceiverConfig(
        signal=sig, fs=fs, n_channels=n, prns=tuple(prns), chunk_ms=100,
        pvt_apply_tropo=False, pvt_apply_iono=False)
    ms = MultiSourceReceiver([
        SourceBranchConfig(receiver=mk("1C", FS_L1, 7, sc1.prns),
                           source=ArraySignalSource(x1, FS_L1)),
        SourceBranchConfig(receiver=mk("L5", FS_L5, 7, sc5.prns),
                           source=ArraySignalSource(x5, FS_L5)),
    ])
    epochs = []
    ms.obs_sinks.append(lambda t, obs: epochs.append((t, obs)))
    ms.run()
    data = dict(
        epochs=epochs,
        eph={p: sc1.ephemerides[p] for p in sc1.prns},
        rcv_ecef=np.asarray(sc1.rcv_ecef),
        rcv_llh=tuple(sc1.rcv_llh),
        prns=list(sc1.prns),
        fixes=[(f.tow_s, np.asarray(f.pos_ecef)) for f in ms.fixes],
    )
    CACHE.write_bytes(pickle.dumps(data))
    return data


def replay(data, **ppp_kwargs):
    from gnss_sdr_tpu.receiver.pvt import geodesy
    from gnss_sdr_tpu.receiver.pvt.ppp_engine import PppEngine

    keyed = {("G", p): data["eph"][p] for p in data["prns"]}
    kw = dict(estimate_tropo=False, sigma_pr_m=0.7, sigma_phase_m=0.004,
              obs_spacing_s=0.2, ratio_threshold=2.5)
    kw.update(ppp_kwargs)
    ppp = PppEngine(keyed, x0_ecef=(0.0, 0.0, 0.0), mode="static", **kw)
    ppp.seed_position(data["rcv_ecef"] + np.array([11.0, -7.0, 16.0]))
    lat, lon, _ = data["rcv_llh"]
    flt = ppp.filter
    rows = []
    last_print = [None]

    for t, obs in data["epochs"]:
        n_before = flt.n_fixed_epochs
        ppp.push_epoch(t, obs)
        if not ppp.solutions:
            continue
        sol = ppp.solutions[-1]
        if sol is None:
            continue
        enu = geodesy.ecef_to_enu(
            np.asarray(sol.pos_ecef) - data["rcv_ecef"], lat, lon)
        sig = float(np.sqrt(np.trace(flt.p[:3, :3])))
        fixed = flt.n_fixed_epochs > n_before
        rows.append((t, enu, sig, flt.last_ratio, fixed,
                     flt._fix_streak, flt._held, len(flt.fixed_wl)))
        key = (len(ppp.solutions) // 25)
        if key != last_print[0]:
            last_print[0] = key
            print(f"t={len(ppp.solutions):5d} "
                  f"E={enu[0]:+8.3f} N={enu[1]:+8.3f} U={enu[2]:+8.3f} "
                  f"sig={sig:6.3f} ratio={flt.last_ratio:6.2f} "
                  f"fixed={fixed} streak={flt._fix_streak} "
                  f"held={flt._held} n_wl={len(flt.fixed_wl)}")
    final = rows[-1]
    print(f"\nFINAL: E={final[1][0]:+.3f} N={final[1][1]:+.3f} "
          f"U={final[1][2]:+.3f}  horiz={np.hypot(*final[1][:2]):.3f}")
    print(f"n_fixed_epochs={flt.n_fixed_epochs} best_ratio={flt.best_ratio:.2f}")
    print("PASS" if (np.hypot(*final[1][:2]) < 0.25
                     and abs(final[1][2]) < 1.0
                     and flt.n_fixed_epochs > 0
                     and flt.best_ratio > 2.5) else "FAIL")
    return rows


if __name__ == "__main__":
    if CACHE.exists() and "--rerun" not in sys.argv:
        data = pickle.loads(CACHE.read_bytes())
        print(f"loaded cache: {len(data['epochs'])} epochs")
    else:
        data = build_and_run()
        print(f"ran receiver: {len(data['epochs'])} epochs")
    replay(data)
