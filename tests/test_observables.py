"""Unit tests for the observables engine's Hatch carrier smoothing.

Reference analog: the carrier-smoothing branch of ``hybrid_observables_gs``
(Observables.enable_carrier_smoothing / smoothing_factor). Regression
coverage for two field bugs: the carrier-range SIGN (NCO Doppler is
-range_rate/lambda; the projected pseudorange must move WITH geometry, not
against it) and the IF ramp (per-slot GLONASS IFs advanced the raw NCO
phase by ~2 km per tick, permanently tripping the cycle-slip guard so
smoothing silently never engaged).
"""

import numpy as np

from gnss_sdr_tpu import constants as C
from gnss_sdr_tpu.receiver.observables import EpochRecord, ObservablesEngine

L1 = 1_575_420_000.0
LAM = C.SPEED_OF_LIGHT_M_S / L1


def test_hatch_tracks_moving_satellite_and_cuts_noise():
    """Smoothed pseudorange follows a -600 m/s range-rate without bias and
    with far less scatter than the raw code noise."""
    rng = np.random.default_rng(5)
    eng = ObservablesEngine(fs=2.0e6, carrier_smoothing_factor=50)
    dt = 0.02
    rdot = -600.0
    r0 = 2.2e7
    raw_err, smooth_err = [], []
    for k in range(400):
        r = r0 + rdot * k * dt
        noise = 3.0 * rng.standard_normal()
        pr = r + noise
        carr = r + 0.3 * rng.standard_normal() + 12345.6  # ambiguity offset
        pr_s = eng._hatch(("1C", 7), pr, carr)
        if k >= 100:                       # after convergence
            raw_err.append(noise)
            smooth_err.append(pr_s - r)
    raw_std = np.std(raw_err)
    smooth = np.asarray(smooth_err)
    assert abs(smooth.mean()) < 1.0, smooth.mean()       # no divergence/bias
    assert np.std(smooth) < raw_std / 3.0, (np.std(smooth), raw_std)
    # the filter actually engaged (window saturated, no guard resets)
    assert eng._smooth[("1C", 7)][2] == 50


def test_hatch_resets_on_cycle_slip():
    eng = ObservablesEngine(fs=2.0e6, carrier_smoothing_factor=50)
    for k in range(10):
        eng._hatch(("1C", 3), 100.0 * k, 100.0 * k)
    assert eng._smooth[("1C", 3)][2] == 10
    # a multi-km carrier jump (half-cycle slip bookkeeping error, record
    # gap...) must reset the window instead of dragging the pseudorange
    out = eng._hatch(("1C", 3), 1000.0, 9.0e5)
    assert out == 1000.0
    assert eng._smooth[("1C", 3)][2] == 1


class _Tlm:
    have_tow = True

    def transmit_time(self, epoch_index, chips, code_len, code_rate):
        # 1 ms epochs, chips converted inside one code period
        return 345600.0 + epoch_index * 1e-3 + chips / code_rate


def test_compute_smoothing_engages_with_nonzero_if():
    """End-to-end through compute(): with a GLONASS-like IF the raw NCO
    phase ramps by ~10^5 cycles/tick; smoothing must strip the IF ramp,
    keep its window growing, and keep the smoothed pseudorange on the raw
    one (static geometry here)."""
    fs = 2.0e6
    if_freq = 562_500.0                    # GLONASS k=1 slot at 8 Msps etc.
    eng = ObservablesEngine(fs=fs, interval_ms=20.0,
                            carrier_smoothing_factor=20)
    rng = np.random.default_rng(9)
    prs = []
    for tick in range(1, 40):
        tick_sample = tick * eng.interval_samples
        # one fresh 1 ms record per tick, static satellite: code phase
        # stays put, the NCO runs at exactly the IF
        rec = EpochRecord(
            abs_start_sample=tick_sample - 100,
            epoch_index=tick * 20, rem_code_phase=0.0,
            code_freq=511_000.0, carrier_freq=if_freq,
            carr_phase_cycles=int(if_freq * (tick_sample - 100) / fs),
            carr_phase_frac=float(if_freq * (tick_sample - 100) / fs % 1.0),
            cn0_dbhz=45.0)
        obs = eng.compute(tick_sample, [dict(
            prn=5, signal="1G", code_len=511, code_rate=511_000.0,
            if_freq=if_freq, carrier_freq=1_602_562_500.0,
            record=rec, telemetry=_Tlm())])
        assert len(obs) == 1
        prs.append(obs[0].pseudorange_m)
    # window saturated: the guard never fired despite the IF ramp
    assert eng._smooth[("1G", 5)][2] == 20
    # static scene: smoothed == raw to numerical noise
    assert np.std(prs[25:]) < 1e-6 * max(1.0, np.std(prs[:5]) + 1.0)
    assert abs(prs[-1] - prs[1]) < 1e-3
