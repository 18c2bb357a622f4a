"""End-to-end telemetry test: generator -> tracking -> bit/frame sync ->
ephemeris decode, plus transmit-time accuracy (the pre-observables check)."""

import numpy as np
import pytest
import jax.numpy as jnp

from gnss_sdr_tpu import constants
from gnss_sdr_tpu.models import codes
from gnss_sdr_tpu.models.nav import gps_lnav
from gnss_sdr_tpu.ops import acquisition as acq
from gnss_sdr_tpu.utils import generator
from gnss_sdr_tpu.receiver import tracking as trk
from gnss_sdr_tpu.receiver.telemetry import GpsL1CaTelemetry

from test_lnav import sample_ephemeris

SPEC = constants.GPS_L1_CA
FS = 2.046e6  # 2 samples/chip keeps the long test cheap


@pytest.fixture(scope="module")
def telemetry_run():
    eph = sample_ephemeris()
    tow0 = 352800.0
    nav_bits = generator.lnav_bits_to_symbols(
        gps_lnav.encode_frames(eph, tow0, 4))
    fd_true, delay, cn0 = -2500.0, 0.000151, 46.0
    dur = 21.0
    x = generator.generate(
        SPEC, [generator.SatParams(prn=7, cn0_dbhz=cn0, doppler_hz=fd_true,
                                   code_delay_s=delay, data_bits=nav_bits)],
        FS, dur, seed=9)

    spc = int(FS * 1e-3)
    rep = codes.sample_code(codes.gps_l1ca_code(7), FS, 1.023e6, spc)
    cf = jnp.asarray(np.conj(np.fft.fft(rep))[None, :], jnp.complex64)
    res = acq.pcps_search(jnp.asarray(x[:2 * spc]), cf,
                          jnp.asarray(acq.make_doppler_grid(5000, 250)),
                          fs=FS, samples_per_code=spc, samples_per_chip=2,
                          noncoherent=2)
    d, fd = int(res.code_phase[0]), float(res.doppler_hz[0])

    cfg = trk.default_config(SPEC, FS, chunk_ms=100)
    st = trk.init_state(1)
    ct = jnp.asarray(codes.gps_l1ca_code(7)[None, :])
    st = trk.start_channel(st, 0,
                           code_freq=1.023e6 * (1 + fd / SPEC.carrier_freq_hz),
                           doppler_hz=fd, sample_offset=d)
    tlm = GpsL1CaTelemetry(prn=7)
    base = 0
    records = []   # (abs_start_sample, epoch_idx, rem_chips, code_freq)
    n_chunks = int((len(x) - cfg.n_max) // cfg.chunk_len)
    for _ in range(n_chunks):
        chunk = jnp.asarray(x[base: base + cfg.chunk_len + cfg.n_max])
        st, out = trk.track_chunk(cfg, chunk, st, ct)
        v = np.asarray(out.valid[:, 0])
        eidx = np.asarray(out.epoch_index[:, 0])[v]
        tlm.push(eidx, np.asarray(out.prompt[:, 0, 0])[v])   # prompt I lane
        records.append((base + np.asarray(out.start_offset[:, 0])[v],
                        eidx,
                        np.asarray(out.rem_code_phase[:, 0])[v],
                        np.asarray(out.code_freq[:, 0])[v]))
        base += cfg.chunk_len
    return dict(eph=eph, tow0=tow0, fd_true=fd_true, delay=delay, x=x,
                st=st, tlm=tlm, records=records)


def test_frame_sync_and_tow(telemetry_run):
    r = telemetry_run
    tlm = r["tlm"]
    assert not bool(r["st"].loss_of_lock[0])
    assert tlm.bit_phase is not None
    assert tlm.have_tow
    assert tlm.subframe_count >= 2
    # tow_ref must be a 6 s multiple within the generated window
    assert tlm.tow_ref.tow_s % 6.0 == 0.0
    assert r["tow0"] <= tlm.tow_ref.tow_s <= r["tow0"] + 24.0


def test_ephemeris_decoded(telemetry_run):
    dec = telemetry_run["tlm"].ephemeris()
    eph = telemetry_run["eph"]
    assert dec is not None
    assert dec.iode == eph.iode
    assert abs(dec.sqrt_a - eph.sqrt_a) <= 2.0 ** -19
    assert dec.toe == eph.toe


def test_transmit_time_accuracy(telemetry_run):
    """Tracked transmit time vs generator truth: this bounds pseudorange error.

    Truth (generator model): chip c of the stream is emitted at
    tow0 + c / 1.023e6 and arrives at receiver time t with
    c = (t - delay + fd*t/fc) * 1.023e6.
    """
    r = telemetry_run
    tlm = r["tlm"]
    errs = []
    starts, eidx, rems, _ = r["records"][-1]
    for s, e, rem in zip(starts[-50:], eidx[-50:], rems[-50:]):
        t_tx = tlm.transmit_time(int(e), float(rem))
        t_rx = s / FS
        c_true = (t_rx - r["delay"]
                  + r["fd_true"] * t_rx / SPEC.carrier_freq_hz) * 1.023e6
        t_tx_true = r["tow0"] + c_true / 1.023e6
        errs.append(t_tx - t_tx_true)
    errs = np.array(errs)
    # mean transmit-time error < 15 ns (~4.5 m); jitter < 30 ns
    assert abs(errs.mean()) < 15e-9, errs.mean()
    assert errs.std() < 30e-9
