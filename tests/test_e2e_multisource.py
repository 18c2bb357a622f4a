"""System tests: multi-source multi-rate receiver (two separate captures).

Reference analog: the multi-source flowgraph
(``gnss_flowgraph.cc:126-737``, ``conf/gnss-sdr_multisource_Hybrid_ishort.conf``)
— N file sources with per-source conditioner chains at different sample
rates fanned into one receiver. Two signal-level scenarios here:

1. **Dual-band GPS**: L1 C/A at 2.046 MSps and L5 at 12 MSps generated as
   two separate captures of the same constellation/instant, processed by
   one MultiSourceReceiver -> merged dual-frequency single-point PVT
   (iono-free per satellite) AND dual-frequency PPP-AR through PppEngine —
   the real two-capture version of the reference's multi-band receivers.
2. **GPS + GLONASS**: L1 C/A capture + an 8 MSps GLONASS FDMA capture,
   different time scales (GPS week vs GLONASS day), merged into a
   multi-constellation fix meeting the standard 2 m / 5 m budgets
   (reference position_test.cc budget rows).
"""

import numpy as np
import pytest

from gnss_sdr_tpu.io.sources import ArraySignalSource
from gnss_sdr_tpu.receiver.multisource import (MultiSourceReceiver,
                                               SourceBranchConfig)
from gnss_sdr_tpu.receiver.receiver import ReceiverConfig
from gnss_sdr_tpu.receiver.pvt import geodesy
from gnss_sdr_tpu.utils import fixture_cache, scenario as scen

T0 = 352800.08
# 42 s: LNAV ephemeris worst case is ~30 s (12 s preamble sync + SF1-3) for
# the last-acquired channel, and the PPP-AR position-sigma gate (0.35 m)
# needs ~1300 dual-band epochs of float convergence before the first fix
DUR = 42.0
# NOT an integer multiple of the 1.023 Mcps chip rate: 2.046e6 = exactly 2
# samples/chip puts the ZOH-replica DLL in a dead zone with static
# per-channel pseudorange biases (see the fs note in test_e2e_position.py)
FS_L1 = 2.0e6
FS_L5 = 12.0e6


@pytest.fixture(scope="module")
def dual_band_run():
    # 7 satellites on BOTH bands (the whole visible set): PPP-AR's
    # correct-integer basin widens with SD-ambiguity redundancy — with
    # only 5 dual-band satellites a correlated-noise excursion of the
    # float state at fix time can make a wrong narrow-lane set pass the
    # ratio test (position then freezes dm-level off under fix-and-hold)
    sc1 = scen.build_gps_l1_scenario(t0_gps=T0, duration_s=DUR, n_sats=7,
                                     cn0_dbhz=50.0, fs=FS_L1,
                                     el_mask_deg=10.0)
    sc5 = scen.build_gps_l5_scenario(t0_gps=T0, duration_s=DUR, n_sats=7,
                                     cn0_dbhz=50.0, fs=FS_L5,
                                     el_mask_deg=10.0)
    # same constellation, same start instant: the L5 set must be a subset
    # of the L1 set for dual-frequency satellites to exist
    assert set(sc5.prns) <= set(sc1.prns)
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

    # PPP on the truth orbits (the sim's "precise products" role), seeded
    # from a coarse prior exactly like the reference's PPP modes seed from
    # the single-point solution
    from gnss_sdr_tpu.receiver.pvt.ppp_engine import PppEngine
    keyed = {("G", p): sc1.ephemerides[p] for p in sc1.prns}
    # estimate_tropo=False = RTKLIB tropopt=OFF: the simulation has no
    # troposphere, and a free ZTD state is nearly collinear with height
    # for a 5-satellite sky (meters of height<->ZTD wander otherwise)
    # obs_spacing_s=0.5: decimate the 50 Hz receiver observables past the
    # DLL code-noise decorrelation time (~0.25 s at these loop
    # bandwidths). Measured on this very scenario: at 0.2 s the B_IF
    # covariance stays optimistic enough for LAMBDA to accept a wrong
    # narrow-lane set at ratio ~90 and fix-and-hold parks the solution
    # 0.3/1.3 m off; at 0.5 s the formal and true covariances align and
    # the late fixes land at cm level (see PppEngine docstring).
    # Noise model matched to the CN0-50 scenario (iono-free code ~0.7 m,
    # iono-free phase ~4 mm); ratio 2.5 is the fixed-failure-rate-style
    # threshold for a 6-SD-ambiguity set (3.0 targets few-ambiguity RTK).
    # code_bias_m=0.15 (the product default, outputs.py): this receiver's
    # ZOH replica carries ~+-0.3 m per-satellite code biases that never
    # average down; the bootstrapped-success-rate AR gate must therefore
    # DECLINE narrow-lane fixing rather than hold a wrong set (round-5
    # diagnosis: every "confident" NL set was off by 2-7 cycles with the
    # position parked 0.3-1.3 m out while the float sat at cm level)
    ppp = PppEngine(keyed, x0_ecef=(0.0, 0.0, 0.0), mode="static",
                    estimate_tropo=False,
                    sigma_pr_m=0.7, sigma_phase_m=0.004,
                    obs_spacing_s=0.5, ratio_threshold=2.5,
                    code_bias_m=0.15)
    ppp.seed_position(sc1.rcv_ecef + np.array([11.0, -7.0, 16.0]))
    ms.obs_sinks.append(ppp.push_epoch)
    # independent record of the merged dual-frequency epochs for the
    # truth-geometry wide-lane validation in test_dual_band_ppp_ar
    raw_epochs: list = []
    ms.obs_sinks.append(lambda t, obs: raw_epochs.append(list(obs)))

    ms.run()
    return sc1, sc5, ms, ppp, raw_epochs


def test_dual_band_both_branches_track(dual_band_run):
    sc1, sc5, ms, _, _ = dual_band_run
    tracked = ms.tracked_prns()
    assert sorted(tracked[0]) == sorted(sc1.prns)     # L1 branch
    assert sorted(tracked[1]) == sorted(sc5.prns)     # L5 branch


def test_dual_band_shared_ephemerides(dual_band_run):
    """Both branches harvest into ONE ephemeris store (LNAV + CNAV of the
    same satellites agree). Every dual-band satellite must be present; the
    L1-only extra channel may miss (its LNAV needs ~30 s in one tracking
    session — preamble sync + SF1-3 — and a late acquisition or a
    reacquisition leaves too little capture)."""
    sc1, sc5, ms, _, _ = dual_band_run
    assert len(ms.ephemerides) >= len(sc5.prns)
    for prn in sc5.prns:
        assert ("G", prn) in ms.ephemerides
        assert abs(ms.ephemerides[("G", prn)].sqrt_a
                   - sc1.ephemerides[prn].sqrt_a) < 1e-3


def test_dual_band_merged_fix(dual_band_run):
    """The merged dual-band single-point fix meets the standard static
    budgets; dual-frequency satellites enter iono-free (one input per
    satellite, not per signal)."""
    sc1, _, ms, _, _ = dual_band_run
    assert len(ms.fixes) >= 3, f"only {len(ms.fixes)} merged fixes"
    lat, lon, _ = sc1.rcv_llh
    errs_enu = np.stack([
        geodesy.ecef_to_enu(f.pos_ecef - sc1.rcv_ecef, lat, lon)
        for f in ms.fixes[-5:]])
    mean_enu = errs_enu.mean(axis=0)
    err_2d = np.hypot(mean_enu[0], mean_enu[1])
    err_3d = np.linalg.norm(mean_enu)
    assert err_2d < 2.0, f"2D error {err_2d:.2f} m"
    assert err_3d < 5.0, f"3D error {err_3d:.2f} m"
    # merged epochs carried one entry per satellite after iono-free
    assert ms.fixes[-1].n_sats >= len(sc1.prns) - 1


def test_dual_band_ppp_ar(dual_band_run):
    """Dual-frequency PPP-AR on the merged two-capture observables — the
    HONEST claims this 42 s static capture supports:

    1. the Melbourne-Wübbena wide-lane set resolves to the TRUE integers
       (validated against an independent truth-geometry derivation below);
    2. the narrow-lane stage correctly DECLINES to fix: the receiver's
       ~+-0.3 m per-satellite ZOH code biases put the float B_IF states
       multiple NL cycles off truth, and the bootstrapped-success-rate
       gate (PppArFilter.min_success_rate) keeps LAMBDA from holding a
       wrong-but-ratio-confident set (every such set measured in round 5
       parked the solution 0.3-1.3 m out while the float sat at cm level);
    3. the float solution stays inside the code-bias envelope.

    The cm-level narrow-lane AR capability itself is validated at filter
    level in test_ppp_ar.py, where the synthetic observables carry no
    systematic code bias and the gate passes."""
    sc1, _, ms, ppp, raw_epochs = dual_band_run
    assert ppp.solutions, "no PPP solutions from merged dual-band epochs"
    # the AR machinery ran and correctly refused narrow-lane fixing
    assert ppp.filter.n_fixed_epochs == 0, \
        "NL fixed despite the code-bias success-rate gate"
    assert ppp.filter.last_success_rate < 0.9
    lat, lon, _ = sc1.rcv_llh
    final = ppp.solutions[-1]
    enu = geodesy.ecef_to_enu(final.pos_ecef - sc1.rcv_ecef, lat, lon)
    # float budget = the receiver's code-bias envelope for this geometry
    # (measured 0.40 m horizontal / 0.28 m vertical at round-5 HEAD)
    assert np.hypot(enu[0], enu[1]) < 0.6, f"PPP float horizontal {enu} m"
    assert abs(enu[2]) < 1.0, f"PPP float vertical {enu[2]:.3f} m"

    # --- wide-lane truth validation -----------------------------------
    # Per-signal phase-ambiguity constants from TRUTH geometry: resid =
    # phase_m - (rho_truth - c*dts) is (receiver clock) + lam_i * N_i;
    # the clock cancels in between-satellite single differences, so
    # SD(A_L1)/lam1 - SD(A_L5)/lam5 must equal the held wide-lane integers.
    import gnss_sdr_tpu.constants as C

    om, c = 7.2921151467e-5, C.SPEED_OF_LIGHT_M_S
    consts: dict = {}
    for epoch in raw_epochs[::25]:
        for o in epoch:
            if o.signal not in ("1C", "L5"):
                continue
            eph = sc1.ephemerides[o.prn]
            dts = eph.clock_offset(o.t_tx_sv)
            p, _v = eph.position_velocity(o.t_tx_sv - dts)
            tau = np.linalg.norm(p - sc1.rcv_ecef) / c
            th = om * tau
            rot = np.array([[np.cos(th), np.sin(th), 0.0],
                            [-np.sin(th), np.cos(th), 0.0], [0, 0, 1.0]])
            rho = np.linalg.norm(rot @ p - sc1.rcv_ecef)
            from gnss_sdr_tpu import constants as _k
            lam = c / (o.carrier_freq_hz
                       or _k.SIGNALS[o.signal].carrier_freq_hz)
            consts.setdefault((o.signal, o.prn), []).append(
                o.carrier_phase_cycles * lam - (rho - c * dts))
    lam1 = c / 1_575_420_000.0
    lam5 = c / 1_176_450_000.0
    held = ppp.filter.fixed_wl
    assert len(held) >= 4, f"wide-lane set too small: {held}"
    ref = ppp.filter._last_fix[0][1] if ppp.filter._last_fix else None
    if ref is None:     # reconstruct the reference satellite (max samples)
        ref = max((k for k in ppp.filter._mw), key=lambda k:
                  ppp.filter._mw[k][0])[1]
    n_checked = 0
    for (sys_id, prn), wl_held in held.items():
        a1 = (np.mean(consts[("1C", prn)]) - np.mean(consts[("1C", ref)]))
        a5 = (np.mean(consts[("L5", prn)]) - np.mean(consts[("L5", ref)]))
        wl_true = a1 / lam1 - a5 / lam5
        assert abs(wl_true - round(wl_true)) < 0.35, \
            f"truth WL for G{prn} not integer-like: {wl_true}"
        assert wl_held == round(wl_true), \
            f"G{prn}: held WL {wl_held} != true {round(wl_true)}"
        n_checked += 1
    assert n_checked >= 4


@pytest.fixture(scope="module")
def gps_glonass_run():
    # GLONASS duration is derived from its frame origin (~40 s); give the
    # GPS capture the same span so both branches deliver to the end
    sc_r = scen.build_glonass_l1_scenario(t0_day=7200.08, fs=8.0e6,
                                          n_sats=4, cn0_dbhz=48.0)
    dur = float(np.ceil(sc_r.duration_s))
    sc_g = scen.build_gps_l1_scenario(t0_gps=T0, duration_s=dur, n_sats=6,
                                      cn0_dbhz=47.0, fs=FS_L1)
    x_g = fixture_cache.cached_iq(
        "e2e_ms_gps", dict(t0=T0, dur=dur, n=6, fs=FS_L1, seed=103),
        lambda: sc_g.generate(seed=103))
    x_r = fixture_cache.cached_iq(
        "e2e_ms_glo", dict(t0=7200.08, dur=sc_r.duration_s, n=4, seed=104),
        lambda: sc_r.generate(seed=104))

    ms = MultiSourceReceiver([
        SourceBranchConfig(
            receiver=ReceiverConfig(signal="1C", fs=FS_L1, n_channels=6,
                                    prns=tuple(sc_g.prns), chunk_ms=100,
                                    pvt_apply_tropo=False,
                                    pvt_apply_iono=False),
            source=ArraySignalSource(x_g, FS_L1)),
        SourceBranchConfig(
            receiver=ReceiverConfig(signal="1G", fs=8.0e6, n_channels=4,
                                    prns=tuple(sc_r.prns), chunk_ms=100,
                                    pvt_apply_tropo=False,
                                    pvt_apply_iono=False),
            source=ArraySignalSource(x_r, 8.0e6)),
    ])
    ms.run()
    return sc_g, sc_r, ms


def test_gps_glonass_tracks_both(gps_glonass_run):
    sc_g, sc_r, ms = gps_glonass_run
    tracked = ms.tracked_prns()
    assert sorted(tracked[0]) == sorted(sc_g.prns)
    assert sorted(tracked[1]) == sorted(sc_r.prns)


def test_gps_glonass_multiconstellation_fix(gps_glonass_run):
    """GPS + GLONASS observables from two sources (different time scales)
    merge into one fix with per-system clocks, meeting the reference's
    standard static budgets (2 m 2D / 5 m 3D) — GLONASS participating in a
    multi-constellation solution at full budget (not the relaxed
    GLONASS-only budget)."""
    sc_g, sc_r, ms = gps_glonass_run
    assert len(ms.fixes) >= 3
    # at least one merged fix used both constellations
    merged = [f for f in ms.fixes if "R" in f.system_clock_s
              and "G" in f.system_clock_s]
    assert merged, "no fix combined GPS and GLONASS"
    lat, lon, _ = sc_g.rcv_llh
    errs_enu = np.stack([
        geodesy.ecef_to_enu(f.pos_ecef - sc_g.rcv_ecef, lat, lon)
        for f in merged[-5:]])
    mean_enu = errs_enu.mean(axis=0)
    err_2d = np.hypot(mean_enu[0], mean_enu[1])
    err_3d = np.linalg.norm(mean_enu)
    assert err_2d < 2.0, f"2D error {err_2d:.2f} m"
    assert err_3d < 5.0, f"3D error {err_3d:.2f} m"
    assert merged[-1].n_sats >= 8
