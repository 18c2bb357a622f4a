"""Closed-loop tracking tests with synthesized ground truth.

The reference's model test (gps_l1_ca_dll_pll_tracking_test.cc) feeds a
generated signal and asserts convergence; here the ground truth is the
generator params of gnss_sdr_tpu.utils.generator.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from gnss_sdr_tpu import constants
from gnss_sdr_tpu.models import codes
from gnss_sdr_tpu.ops import acquisition as acq
from gnss_sdr_tpu.ops import discriminators, iq
from gnss_sdr_tpu.utils import generator
from gnss_sdr_tpu.receiver import tracking as trk

SPEC = constants.GPS_L1_CA
FS = 2.5e6


def _acquire(x, prn, noncoherent=2):
    spc = int(FS * 1e-3)
    rep = codes.sample_code(codes.gps_l1ca_code(prn), FS, 1.023e6, spc)
    cf = jnp.asarray(np.conj(np.fft.fft(rep))[None, :], jnp.complex64)
    res = acq.pcps_search(jnp.asarray(x[: noncoherent * spc]), cf,
                          jnp.asarray(acq.make_doppler_grid(5000, 250)),
                          fs=FS, samples_per_code=spc, samples_per_chip=2,
                          noncoherent=noncoherent)
    return int(res.code_phase[0]), float(res.doppler_hz[0])


def _run_tracking(x, cfg, st, code_tables, n_chunks):
    outs = []
    base = 0
    for _ in range(n_chunks):
        chunk = jnp.asarray(x[base: base + cfg.chunk_len + cfg.n_max])
        st, out = trk.track_chunk(cfg, chunk, st, code_tables)
        outs.append(out)
        base += cfg.chunk_len
    return st, outs


def test_discriminator_signs():
    # PLL: positive residual phase -> positive error
    p = jnp.asarray([np.exp(1j * 0.3)], jnp.complex64)
    assert float(discriminators.pll_costas(p)[0]) > 0
    # Costas: bit flip must not change the sign
    assert float(discriminators.pll_costas(-p)[0]) == pytest.approx(
        float(discriminators.pll_costas(p)[0]), abs=1e-6)
    # FLL: prompt rotating positively -> positive frequency error
    p0 = jnp.asarray([1.0 + 0j], jnp.complex64)
    p1 = jnp.asarray([np.exp(1j * 0.4)], jnp.complex64)
    dt = jnp.float32(1e-3)
    assert float(discriminators.fll_atan2(p0, p1, dt)[0]) > 0
    # ... and be insensitive to a bit flip
    assert float(discriminators.fll_atan2(p0, -p1, dt)[0]) == pytest.approx(
        float(discriminators.fll_atan2(p0, p1, dt)[0]), rel=1e-5)
    # DLL: replica lagging truth -> early stronger -> positive error
    e = jnp.asarray([1.2 + 0j], jnp.complex64)
    l = jnp.asarray([0.7 + 0j], jnp.complex64)
    assert float(discriminators.dll_nc_emlp(e, l)[0]) > 0


def test_single_channel_convergence():
    fd_true, delay, cn0 = 1234.0, 0.0003, 48.0
    rng = np.random.default_rng(1)
    bits = generator.lnav_bits_to_symbols(rng.integers(0, 2, 100))
    x = generator.generate(
        SPEC, [generator.SatParams(prn=7, cn0_dbhz=cn0, doppler_hz=fd_true,
                                   code_delay_s=delay, data_bits=bits)],
        FS, 1.2, seed=3)
    d, fd = _acquire(x, 7)
    assert abs(d - delay * FS) <= 1.0
    assert abs(fd - fd_true) <= 130.0

    cfg = trk.default_config(SPEC, FS, chunk_ms=50)
    st = trk.init_state(2)
    ct = np.zeros((2, 1023), np.float32)
    ct[0] = codes.gps_l1ca_code(7)
    st = trk.start_channel(st, 0,
                           code_freq=1.023e6 * (1 + fd / SPEC.carrier_freq_hz),
                           doppler_hz=fd, sample_offset=d)
    st, outs = _run_tracking(x, cfg, st, jnp.asarray(ct),
                             int((len(x) - cfg.n_max) // cfg.chunk_len))

    assert not bool(st.loss_of_lock[0])
    assert int(st.state[0]) == trk.NARROW_TRACK
    assert abs(float(st.carrier_freq[0]) - fd_true) < 5.0
    # code freq must match carrier-aided truth within DLL noise
    true_codef = 1.023e6 * (1 + fd_true / SPEC.carrier_freq_hz)
    assert abs(float(st.code_freq[0]) - true_codef) < 0.5
    last = outs[-1]
    v = np.asarray(last.valid[:, 0])
    assert abs(float(np.asarray(last.cn0_dbhz[:, 0])[v][-1]) - cn0) < 3.0
    assert float(np.asarray(last.carrier_lock[:, 0])[v][-1]) > 0.9
    # inactive channel must remain untouched
    assert not bool(st.active[1]) and int(st.epoch_count[1]) == 0


def test_data_bit_recovery():
    """Prompt I signs must reproduce the injected 50 bps data stream."""
    rng = np.random.default_rng(4)
    bits01 = rng.integers(0, 2, 60)
    bits = generator.lnav_bits_to_symbols(bits01)
    x = generator.generate(
        SPEC, [generator.SatParams(prn=3, cn0_dbhz=47, doppler_hz=-800.0,
                                   code_delay_s=0.0002, data_bits=bits)],
        FS, 1.2, seed=5)
    d, fd = _acquire(x, 3)
    cfg = trk.default_config(SPEC, FS, chunk_ms=50)
    st = trk.init_state(1)
    ct = jnp.asarray(codes.gps_l1ca_code(3)[None, :])
    st = trk.start_channel(st, 0,
                           code_freq=1.023e6 * (1 + fd / SPEC.carrier_freq_hz),
                           doppler_hz=fd, sample_offset=d)
    prompts, epoch_idx = [], []
    base = 0
    for _ in range(int((len(x) - cfg.n_max) // cfg.chunk_len)):
        chunk = jnp.asarray(x[base: base + cfg.chunk_len + cfg.n_max])
        st, out = trk.track_chunk(cfg, chunk, st, ct)
        v = np.asarray(out.valid[:, 0])
        prompts.append(iq.combine(np.asarray(out.prompt[:, 0])[v]))
        epoch_idx.append(np.asarray(out.epoch_index[:, 0])[v])
        base += cfg.chunk_len
    P = np.concatenate(prompts)
    eidx = np.concatenate(epoch_idx)
    # use the settled tail: epochs 400+
    sel = eidx >= 400
    P, eidx = P[sel], eidx[sel]
    # generator aligns bit boundaries to code epoch 0 of transmit time; the
    # first tracked epoch started at the acquisition delay => epoch_index is
    # aligned with transmitted code periods (mod 20 = bit phase 0 if the first
    # tracked epoch began at a bit boundary). Find the bit phase by majority.
    phases = [np.mean([np.sign(P.real[i]) != np.sign(P.real[i - 1])
                       for i in range(1, len(P)) if eidx[i] % 20 != ph])
              for ph in range(20)]
    # simpler: all sign flips must occur at a single epoch phase mod 20
    flips = [int(eidx[i]) % 20 for i in range(1, len(P))
             if np.sign(P.real[i]) != np.sign(P.real[i - 1])]
    assert len(flips) > 5
    assert len(set(flips)) == 1
    # recover bits and compare against the injected pattern
    ph = flips[0]
    rel = (eidx - ph) // 20
    recovered = {}
    for r, s in zip(rel, np.sign(P.real)):
        recovered.setdefault(int(r), []).append(s)
    rec_bits = {r: np.sign(np.mean(v)) for r, v in recovered.items() if len(v) == 20}
    # the transmitted bit for absolute code-period index e is bits[e//20 % len]
    # (up to an overall polarity ambiguity); check consistency both ways
    keys = sorted(rec_bits)
    seq = np.array([rec_bits[k] for k in keys])
    matches = 0
    for pol in (+1, -1):
        for off in range(len(bits)):
            ref = np.array([pol * bits[(k + off) % len(bits)] for k in keys])
            if np.array_equal(ref, seq):
                matches += 1
    assert matches >= 1


def test_multichannel_batch_tracking():
    """4 satellites tracked simultaneously as one batch."""
    sats = [
        generator.SatParams(prn=2, cn0_dbhz=46, doppler_hz=500.0, code_delay_s=1e-4),
        generator.SatParams(prn=5, cn0_dbhz=44, doppler_hz=-2000.0, code_delay_s=3e-4),
        generator.SatParams(prn=9, cn0_dbhz=48, doppler_hz=3100.0, code_delay_s=7e-4),
        generator.SatParams(prn=23, cn0_dbhz=42, doppler_hz=-3700.0, code_delay_s=5e-4),
    ]
    x = generator.generate(SPEC, sats, FS, 1.0, seed=11)
    cfg = trk.default_config(SPEC, FS, chunk_ms=50)
    st = trk.init_state(4)
    ct = np.stack([codes.gps_l1ca_code(s.prn) for s in sats]).astype(np.float32)
    for i, s in enumerate(sats):
        d, fd = _acquire(x, s.prn)
        st = trk.start_channel(st, i,
                               code_freq=1.023e6 * (1 + fd / SPEC.carrier_freq_hz),
                               doppler_hz=fd, sample_offset=d)
    st, _ = _run_tracking(x, cfg, st, jnp.asarray(ct),
                          int((len(x) - cfg.n_max) // cfg.chunk_len))
    for i, s in enumerate(sats):
        assert not bool(st.loss_of_lock[i]), f"channel {i}"
        assert abs(float(st.carrier_freq[i]) - s.doppler_hz) < 8.0, f"channel {i}"


def test_lock_loss_detected_when_signal_dies():
    """Signal present for 0.4 s then pure noise -> loss_of_lock must latch."""
    x1 = generator.generate(
        SPEC, [generator.SatParams(prn=7, cn0_dbhz=47, doppler_hz=1000.0)],
        FS, 0.4, seed=6)
    rng = np.random.default_rng(8)
    n2 = int(FS * 0.8)
    x2 = ((rng.standard_normal(n2) + 1j * rng.standard_normal(n2)) / np.sqrt(2)).astype(np.complex64)
    x = np.concatenate([x1, x2])
    d, fd = _acquire(x, 7)
    cfg = trk.default_config(SPEC, FS, chunk_ms=50)
    st = trk.init_state(1)
    ct = jnp.asarray(codes.gps_l1ca_code(7)[None, :])
    st = trk.start_channel(st, 0,
                           code_freq=1.023e6 * (1 + fd / SPEC.carrier_freq_hz),
                           doppler_hz=fd, sample_offset=d)
    st, _ = _run_tracking(x, cfg, st, ct,
                          int((len(x) - cfg.n_max) // cfg.chunk_len))
    assert bool(st.loss_of_lock[0])


def test_extended_coherent_integration_low_cn0():
    """Reference extend_correlation_symbols scenario: acquire/pull in at
    healthy C/N0, then the signal drops to 28 dBHz — 20-epoch coherent
    integration must hold a tight carrier lock through the drop (1 ms prompts
    are below 0 dB SNR there)."""
    fd_true, delay_s, cn0_lo = 820.0, 0.00021, 28.0
    sat_hi = generator.SatParams(prn=9, cn0_dbhz=45.0, doppler_hz=fd_true,
                                 code_delay_s=delay_s)
    sat_lo = generator.SatParams(prn=9, cn0_dbhz=cn0_lo, doppler_hz=fd_true,
                                 code_delay_s=delay_s)
    # the generator's phase is an absolute function of sample time, so two
    # runs differing only in amplitude splice phase-continuously
    x_hi = generator.generate(SPEC, [sat_hi], FS, 2.0, seed=17, noise=False)
    x_lo = generator.generate(SPEC, [sat_lo], FS, 2.0, seed=17, noise=False)
    n_sw = int(0.6 * FS)
    rng = np.random.default_rng(18)
    x = np.concatenate([x_hi[:n_sw], x_lo[n_sw:]])
    x = (x + (rng.standard_normal(len(x)) + 1j * rng.standard_normal(len(x)))
         / np.sqrt(2.0)).astype(np.complex64)

    # extended updates run at 20 ms: keep B*T small (2 Hz -> 0.04) so the
    # discrete 3rd-order loop stays well damped
    cfg = trk.default_config(SPEC, FS, chunk_ms=50,
                             pll_bw_narrow_hz=2.0, dll_bw_narrow_hz=0.25)
    st = trk.init_state(1, cfg.n_taps)
    ct = jnp.asarray(codes.gps_l1ca_code(9)[None, :])
    st = trk.start_channel(
        st, 0, code_freq=1.023e6 * (1 + fd_true / SPEC.carrier_freq_hz),
        doppler_hz=fd_true + 40.0, sample_offset=int(round(delay_s * FS)))
    n_chunks = int((len(x) - cfg.n_max) // cfg.chunk_len)
    base = 0
    for k in range(n_chunks):
        if k == 8:   # settled in wide tracking; before the power drop
            # all-ones data stream -> any bit anchor is sign-safe
            st = trk.set_extension(st, 0, 20, anchor_epoch=0)
        chunk = jnp.asarray(x[base: base + cfg.chunk_len + cfg.n_max])
        st, out = trk.track_chunk(cfg, chunk, st, ct)
        base += cfg.chunk_len
    assert not bool(st.loss_of_lock[0])
    assert int(st.ext_n[0]) == 20
    assert abs(float(st.carrier_freq[0]) - fd_true) < 3.0
    v = np.asarray(out.valid[:, 0])
    # phase lock on 20 ms prompts must be solid at 28 dBHz
    assert float(np.asarray(out.carrier_lock[:, 0])[v][-1]) > 0.8
    # C/N0 estimate: the EMA is still recovering from the 45->28 dB step
    # (stale high-power moments decay at alpha=0.05 per 20 ms update), so
    # only bound it loosely from both sides
    cn0_est = float(np.asarray(out.cn0_dbhz[:, 0])[v][-1])
    assert 19.0 < cn0_est < 33.0, cn0_est


def test_secondary_code_wipe_tracking():
    """NH-style overlay on the data component: without wipeoff the 20-epoch
    accumulation cancels; with set_secondary the channel tracks cleanly."""
    spec = constants.SIGNALS["B1"]     # BeiDou B1I with NH20
    fs = 4.092e6
    fd_true, delay_s = -420.0, 0.00013
    x = generator.generate(
        spec, [generator.SatParams(prn=6, cn0_dbhz=43.0, doppler_hz=fd_true,
                                   code_delay_s=delay_s)], fs, 1.2, seed=19)
    cfg = trk.default_config(spec, fs, chunk_ms=50)
    st = trk.init_state(1, cfg.n_taps)
    ct = jnp.asarray(codes.code_chips("B1", 6)[None, :])
    sec = np.ones((1, cfg.sec_table_len), np.float32)
    st = trk.start_channel(
        st, 0, code_freq=spec.code_rate_cps * (1 + fd_true / spec.carrier_freq_hz),
        doppler_hz=fd_true + 30.0, sample_offset=int(round(delay_s * fs)))
    n_chunks = int((len(x) - cfg.n_max) // cfg.chunk_len)
    base = 0
    for k in range(n_chunks):
        if k == 8:
            # generator aligns the NH sequence with period_idx 0 at
            # code_delay; tracking epoch 0 started at that boundary
            chips = np.array([int(b) for b in spec.secondary_code])
            st = trk.set_secondary(st, sec, 0, chips, anchor_epoch=0)
            st = trk.set_extension(st, 0, 20, anchor_epoch=0)
        chunk = jnp.asarray(x[base: base + cfg.chunk_len + cfg.n_max])
        st, out = trk.track_chunk(cfg, chunk, st, ct, sec)
        base += cfg.chunk_len
    assert not bool(st.loss_of_lock[0])
    assert abs(float(st.carrier_freq[0]) - fd_true) < 3.0


def test_pilot_tracking_e1c():
    """track_pilot: E/P/L on the E1-C pilot (CS25 overlay, Costas-immune),
    data prompt tap on E1-B for telemetry."""
    spec = constants.SIGNALS["1B"]
    fs = 4.092e6
    fd_true, delay_s = 650.0, 0.00017
    rng = np.random.default_rng(23)
    bits = generator.lnav_bits_to_symbols(rng.integers(0, 2, 300))
    x = generator.generate(
        spec, [generator.SatParams(prn=11, cn0_dbhz=45.0, doppler_hz=fd_true,
                                   code_delay_s=delay_s, data_bits=bits)],
        fs, 1.6, seed=29, with_pilot=True)
    cfg = trk.default_config(spec, fs, chunk_ms=48, track_pilot=True,
                             pll_bw_hz=20.0, dll_bw_hz=2.0)
    assert cfg.n_taps == len(cfg.tap_offsets) + 1
    lc = spec.code_length_chips
    sub = np.tile([1.0, -1.0], lc).astype(np.float32)
    ct = np.zeros((1, 2, 2 * lc), np.float32)
    ct[0, 0] = np.repeat(codes.pilot_code_chips("1B", 11), 2) * sub
    ct[0, 1] = np.repeat(codes.code_chips("1B", 11), 2) * sub
    st = trk.init_state(1, cfg.n_taps)
    st = trk.start_channel(
        st, 0, code_freq=spec.code_rate_cps * (1 + fd_true / spec.carrier_freq_hz),
        doppler_hz=fd_true + 40.0, sample_offset=int(round(delay_s * fs)))
    n_chunks = int((len(x) - cfg.n_max) // cfg.chunk_len)
    base = 0
    prompts, eidxs = [], []
    for _ in range(n_chunks):
        chunk = jnp.asarray(x[base: base + cfg.chunk_len + cfg.n_max])
        st, out = trk.track_chunk(cfg, chunk, st, jnp.asarray(ct))
        v = np.asarray(out.valid[:, 0])
        prompts.append(np.asarray(out.prompt[:, 0, 0])[v])   # data tap I
        eidxs.append(np.asarray(out.epoch_index[:, 0])[v])
        base += cfg.chunk_len
    assert not bool(st.loss_of_lock[0])
    assert abs(float(st.carrier_freq[0]) - fd_true) < 5.0
    # the data prompt must carry the E1-B symbol stream: its sign at settled
    # epochs must match the injected 250 sps symbols (up to global polarity)
    P = np.concatenate(prompts)
    E = np.concatenate(eidxs)
    sel = E >= 200
    P, E = P[sel], E[sel]
    # generator aligns symbol k with transmit code period k (4 ms each)
    want = bits[(E + int(round(delay_s * fs / (fs * 4e-3)))) % len(bits)]
    agree = np.mean(np.sign(P) == np.sign(want))
    assert agree > 0.98 or agree < 0.02, agree


def test_kalman_carrier_tracking_doppler_ramp():
    """KF carrier tracking (reference gps_l1_ca_kf_tracking_cc analog):
    track a 60 Hz/s Doppler ramp and estimate the rate state."""
    fd0, rate, delay_s = -300.0, 60.0, 0.00025
    dur = 1.5
    x = generator.generate(
        SPEC, [generator.SatParams(prn=5, cn0_dbhz=44.0, doppler_hz=fd0,
                                   doppler_rate_hz_s=rate,
                                   code_delay_s=delay_s)], FS, dur, seed=41)
    cfg = trk.default_config(SPEC, FS, chunk_ms=50, carrier_kf=True)
    st = trk.init_state(1, cfg.n_taps)
    ct = jnp.asarray(codes.gps_l1ca_code(5)[None, :])
    st = trk.start_channel(
        st, 0, code_freq=1.023e6 * (1 + fd0 / SPEC.carrier_freq_hz),
        doppler_hz=fd0 + 30.0, sample_offset=int(round(delay_s * FS)))
    st, outs = _run_tracking(x, cfg, st, ct,
                             int((len(x) - cfg.n_max) // cfg.chunk_len))
    assert not bool(st.loss_of_lock[0])
    n_epochs = int(st.epoch_count[0])
    fd_final = fd0 + rate * (n_epochs * 1e-3)
    assert abs(float(st.carrier_freq[0]) - fd_final) < 5.0
    # the rate state must have learned the ramp
    assert abs(float(st.kf_acc[0]) - rate) < 20.0
    v = np.asarray(outs[-1].valid[:, 0])
    assert float(np.asarray(outs[-1].carrier_lock[:, 0])[v][-1]) > 0.85


def test_glonass_fdma_slot_receiver():
    """GLONASS FDMA: the receiver must acquire and track a satellite at its
    slot frequency k*562.5 kHz away from band center (reference: per-channel
    Freq_Xlating conditioning for 1G channels)."""
    from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
    from gnss_sdr_tpu.io.sources import ArraySignalSource

    spec = constants.SIGNALS["1G"]
    fs = 8.0e6
    prn = 3                                    # slot 3 -> k=5 (default map)
    k = 5
    f_if = k * spec.fdma_step_hz               # 2.8125 MHz
    fd_true = -650.0
    x = generator.generate(
        spec, [generator.SatParams(prn=prn, cn0_dbhz=47.0,
                                   doppler_hz=fd_true, code_delay_s=2e-4)],
        fs, 0.9, seed=51, if_freq_hz=f_if)
    cfg = ReceiverConfig(signal="1G", fs=fs, n_channels=1, prns=(prn,),
                         chunk_ms=100, acq_doppler_step_hz=250.0,
                         pvt_apply_tropo=False, pvt_apply_iono=False)
    rx = Receiver(cfg)
    assert rx.groups[0].if_freq_for(prn) == f_if
    rx.run_source(ArraySignalSource(x, fs))
    assert rx.tracked_prns() == [prn]
    cf = float(rx.trk_state.carrier_freq[0])
    assert abs(cf - (f_if + fd_true)) < 10.0


def test_galileo_e5a_signal_level_chain():
    """E5a-I at full 10.23 Mcps through the receiver: acquisition, tracking
    (CS20 overlay present in the generated signal), and the F/NAV telemetry
    channel reaching secondary-code symbol sync."""
    from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
    from gnss_sdr_tpu.io.sources import ArraySignalSource
    from gnss_sdr_tpu.models.nav import galileo_fnav
    from test_lnav import sample_ephemeris

    spec = constants.SIGNALS["5X"]
    fs = 12.0e6
    prn, fd_true, delay_s = 2, 420.0, 3.1e-4
    eph = sample_ephemeris()
    sym01 = galileo_fnav.encode_stream(eph, 352800.0, n_pages=1)
    bits = generator.lnav_bits_to_symbols(sym01)
    x = generator.generate(
        spec, [generator.SatParams(prn=prn, cn0_dbhz=50.0,
                                   doppler_hz=fd_true,
                                   code_delay_s=delay_s, data_bits=bits)],
        fs, 2.2, seed=71)
    cfg = ReceiverConfig(signal="5X", fs=fs, n_channels=1, prns=(prn,),
                         chunk_ms=100, acq_doppler_step_hz=125.0,
                         pll_bw_hz=25.0, dll_bw_hz=2.0,
                         pvt_apply_tropo=False, pvt_apply_iono=False)
    rx = Receiver(cfg)
    rx.run_source(ArraySignalSource(x, fs))
    assert rx.tracked_prns() == [prn]
    assert abs(float(rx.trk_state.carrier_freq[0]) - fd_true) < 10.0
    tlm = rx.groups[0].channels[0].telemetry
    assert tlm.__class__.__name__ == "GalileoE5aTelemetry"
    assert tlm.bit_phase is not None           # CS20 symbol sync achieved


def test_pull_in_capture_range():
    """Acquisition->tracking pull-in capture range (reference
    tracking_pull-in_test.cc): the FLL pull-in must recover Doppler errors
    up to ~half the acquisition bin (125 Hz at 250 Hz steps) and the scan
    must lock from each start; a far-out error must NOT converge (honest
    capture boundary, not a tautology)."""
    from gnss_sdr_tpu.receiver import tracking as trk

    spec = constants.GPS_L1_CA
    fs = 2.046e6
    prn, fd_true = 7, 830.0
    x = generator.generate(
        spec, [generator.SatParams(prn=prn, cn0_dbhz=47.0,
                                   doppler_hz=fd_true)],
        fs, 1.0, seed=51)
    cfg = trk.default_config(spec, fs, chunk_ms=100)
    table = codes.gps_l1ca_code(prn).astype(np.float32)[None]

    def run(err_hz: float) -> float:
        state = trk.init_state(1, cfg.n_taps)
        state = trk.start_channel(state, 0, code_freq=1.023e6,
                                  doppler_hz=fd_true + err_hz,
                                  sample_offset=0)
        n = cfg.chunk_len
        for k in range(9):
            chunk = iq.split(x[k * n: (k + 1) * n + cfg.n_max])
            state, _ = trk.track_chunk(cfg, chunk, state, table)
            import jax as _jax
            state = _jax.tree.map(np.asarray, state)
        return float(state.carrier_freq[0]) - fd_true

    # inside the capture range: converge to within a few Hz
    for err in (0.0, 60.0, 125.0, -125.0, 200.0):
        resid = run(err)
        assert abs(resid) < 8.0, f"start error {err:+.0f} Hz -> {resid:.1f} Hz"
    # far outside: must NOT have pulled in (several kHz off)
    resid = run(1500.0)
    assert abs(resid) > 100.0, f"impossible pull-in from +1500 Hz ({resid})"


def test_track_multi_packed_matches_per_group():
    """Fused multi-group dispatch (one device program + one flat packed
    download for every signal group, receiver.py _dispatch_tracking_all)
    is numerically equivalent to per-group track_chunk_packed calls —
    value-identical up to denormal flushing, NaN masks identical."""
    import jax
    from gnss_sdr_tpu.models import codes
    from gnss_sdr_tpu.ops import iq
    from gnss_sdr_tpu.utils import generator

    fs = 2.0e6
    groups = []
    for signal, prns in (("1C", [1, 7]), ("1B", [11, 12])):
        spec = constants.SIGNALS[signal]
        cfg = trk.default_config(spec, fs, chunk_ms=40)
        sats = [generator.SatParams(prn=p, cn0_dbhz=46.0,
                                    doppler_hz=200.0 * i,
                                    code_delay_s=1e-4 * i)
                for i, p in enumerate(prns)]
        n_chunk = cfg.chunk_len + cfg.n_max
        x = generator.generate(spec, sats, fs, (n_chunk + 4000) / fs,
                               seed=3)
        st = trk.init_state(2, cfg.n_taps)
        table_len = spec.code_length_chips * cfg.table_rate
        tables = np.zeros((2, table_len), np.float32)
        for i, p in enumerate(prns):
            chips = codes.code_chips(signal, p).astype(np.float32)
            if cfg.table_rate == 2:
                chips = np.repeat(chips, 2) * np.tile(
                    [1.0, -1.0], spec.code_length_chips).astype(np.float32)
            tables[i] = chips
            st = trk.start_channel(st, i, code_freq=spec.code_rate_cps,
                                   doppler_hz=200.0 * i,
                                   sample_offset=int(1e-4 * i * fs))
        groups.append(dict(
            cfg=cfg, x=x, st=st,
            tabs=jnp.asarray(trk.prepare_code_tables(cfg, tables)),
            sec=jnp.ones((2, cfg.sec_table_len), np.float32)))

    n_max = max(g["cfg"].n_max for g in groups)
    chunk = jnp.asarray(iq.split(
        groups[0]["x"][: groups[0]["cfg"].chunk_len + n_max]))

    def slab(g):
        s = g["cfg"].chunk_len + g["cfg"].n_max
        return None if s == chunk.shape[0] else s

    ref = [trk.track_chunk_packed(g["cfg"], chunk, g["st"], g["tabs"],
                                  g["sec"], slab=slab(g))
           for g in groups]
    new_states, flat = trk.track_multi_packed(
        tuple(g["cfg"] for g in groups), chunk,
        tuple(g["st"] for g in groups), tuple(g["tabs"] for g in groups),
        tuple(g["sec"] for g in groups), tuple(slab(g) for g in groups))
    flat = np.asarray(flat)

    def _same(a, b):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind == "f":
            na, nb = np.isnan(a), np.isnan(b)
            assert np.array_equal(na, nb)
            # denormal flush-to-zero can differ between the two programs
            np.testing.assert_allclose(a[~na], b[~nb], atol=1e-30)
        else:
            assert np.array_equal(a, b)

    off = 0
    for (ns_ref, packed_ref), ns in zip(ref, new_states):
        packed_ref = np.asarray(packed_ref)
        n = packed_ref.size
        _same(flat[off:off + n].reshape(packed_ref.shape), packed_ref)
        for a, b in zip(jax.tree.leaves(ns_ref), jax.tree.leaves(ns)):
            _same(a, b)
        off += n
    assert off == flat.size
