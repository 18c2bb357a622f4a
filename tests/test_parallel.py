"""Multi-device sharding correctness: sharded == unsharded, to float tolerance.

Runs on the 8-virtual-device CPU mesh provisioned by conftest.py. The claim
under test is the SURVEY §2.4 mapping — the reference's N independent channel
threads (gnss_flowgraph.cc:176-181) become channel-axis sharding of the
tracking scan, and its per-channel acquisition workers become signal-axis
sharding of the PCPS cube — with NO numerical change vs the single-device
path.
"""

import jax
import numpy as np
import pytest

from gnss_sdr_tpu import constants
from gnss_sdr_tpu.models import codes
from gnss_sdr_tpu.ops import acquisition as acq_ops
from gnss_sdr_tpu.ops import iq
from gnss_sdr_tpu.parallel import sharding as shd
from gnss_sdr_tpu.receiver import tracking as trk
from gnss_sdr_tpu.utils import generator

FS = 2.046e6
N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= N_DEV
    return shd.make_mesh(N_DEV)


@pytest.fixture(scope="module")
def signal_setup():
    """8 satellites with known truth, 400 ms of IQ + tracking start states."""
    spec = constants.GPS_L1_CA
    prns = list(range(1, 9))
    rng = np.random.default_rng(5)
    sats = [generator.SatParams(
        prn=p, cn0_dbhz=46.0, doppler_hz=float(rng.uniform(-3000, 3000)),
        code_delay_s=float(rng.uniform(0, 1e-3))) for p in prns]
    x = generator.generate(spec, sats, FS, 0.4, seed=9)
    cfg = trk.default_config(spec, FS, chunk_ms=100)
    state = trk.init_state(len(prns), cfg.n_taps)
    tables = np.zeros((len(prns), 1023), np.float32)
    spc = int(round(FS * 1e-3))
    for i, sp in enumerate(sats):
        tables[i] = codes.gps_l1ca_code(sp.prn)
        delay = int(round(sp.code_delay_s * FS)) % spc
        state = trk.start_channel(
            state, i, code_freq=1.023e6 * (1 + sp.doppler_hz / spec.carrier_freq_hz),
            doppler_hz=sp.doppler_hz, sample_offset=delay)
    return cfg, x, state, tables, spc, sats


def _run_chunks(cfg, x, state, tables, mesh=None):
    outs = []
    n = cfg.chunk_len
    for k in range(3):
        chunk = iq.split(x[k * n: (k + 1) * n + cfg.n_max])
        st, tb = state, tables
        if mesh is not None:
            st = shd.shard_tracking_state(st, mesh)
            tb = shd.shard_channel_array(tb, mesh)
            chunk = shd.replicate(chunk, mesh)
        state, out = trk.track_chunk(cfg, chunk, st, tb)
        outs.append(jax.tree.map(np.asarray, out))
        state = jax.tree.map(np.asarray, state)
    return state, outs


def test_tracking_sharded_equals_unsharded(mesh, signal_setup):
    cfg, x, state, tables, _, _ = signal_setup
    st_u, outs_u = _run_chunks(cfg, x, state, tables, mesh=None)
    st_s, outs_s = _run_chunks(cfg, x, state, tables, mesh=mesh)
    # integer / state fields must agree exactly
    for f in ("sample_offset", "epoch_count", "state", "carr_phase_cycles",
              "lock_fail", "loss_of_lock", "active"):
        np.testing.assert_array_equal(getattr(st_u, f), getattr(st_s, f), f)
    # float carries to tight tolerance (different fusion orders allowed)
    for f in ("carrier_freq", "code_freq", "rem_code_phase",
              "carr_phase_frac"):
        np.testing.assert_allclose(getattr(st_u, f), getattr(st_s, f),
                                   rtol=1e-5, atol=1e-5, err_msg=f)
    for ou, os_ in zip(outs_u, outs_s):
        np.testing.assert_array_equal(ou.valid, os_.valid)
        np.testing.assert_array_equal(ou.epoch_index, os_.epoch_index)
        np.testing.assert_allclose(ou.prompt, os_.prompt, rtol=2e-4,
                                   atol=2e-1)
        np.testing.assert_allclose(ou.cn0_dbhz, os_.cn0_dbhz, rtol=1e-3,
                                   atol=2e-2)


def test_tracking_sharded_converges_on_truth(mesh, signal_setup):
    """The sharded scan must actually track: carrier freq -> truth Doppler."""
    cfg, x, state, tables, _, sats = signal_setup
    st_s, _ = _run_chunks(cfg, x, state, tables, mesh=mesh)
    truth = np.array([sp.doppler_hz for sp in sats])
    np.testing.assert_allclose(st_s.carrier_freq, truth, atol=15.0)


def test_acquisition_sharded_equals_unsharded(mesh, signal_setup):
    cfg, x, state, tables, spc, sats = signal_setup
    cf = np.stack([
        iq.split(np.conj(np.fft.fft(codes.sample_code(
            codes.gps_l1ca_code(p), FS, 1.023e6, spc))))
        for p in range(1, 9)])
    dopplers = acq_ops.make_doppler_grid(5000.0, 250.0)
    xx = iq.split(x[: 2 * spc])
    kw = dict(fs=FS, samples_per_code=spc, samples_per_chip=2, noncoherent=2)
    res_u = jax.tree.map(np.asarray, acq_ops.pcps_search(xx, cf, dopplers, **kw))
    res_s = jax.tree.map(np.asarray,
                         shd.pcps_search_sharded(mesh, xx, cf, dopplers, **kw))
    np.testing.assert_array_equal(res_u.code_phase, res_s.code_phase)
    np.testing.assert_array_equal(res_u.doppler_hz, res_s.doppler_hz)
    np.testing.assert_allclose(res_u.test_cfar, res_s.test_cfar, rtol=1e-4)
    np.testing.assert_allclose(res_u.test_max_power, res_s.test_max_power,
                               rtol=1e-4)
    # all 8 satellites must actually be detected at the right delay
    for i, sp in enumerate(sats):
        true_delay = int(round(sp.code_delay_s * FS)) % spc
        assert res_s.test_cfar[i] > 2.0
        assert abs(int(res_s.code_phase[i]) - true_delay) <= 2


def test_receiver_mesh_equivalence(mesh, signal_setup):
    """The full Receiver (acquisition + tracking + observables) produces the
    same channel assignments and matching pseudoranges on an 8-device mesh
    as on a single device."""
    from gnss_sdr_tpu.io.sources import ArraySignalSource
    from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig

    spec = constants.GPS_L1_CA
    prns = [2, 5, 11, 19, 23, 30]
    rng = np.random.default_rng(17)
    sats = [generator.SatParams(
        prn=p, cn0_dbhz=47.0, doppler_hz=float(rng.uniform(-3000, 3000)),
        code_delay_s=float(rng.uniform(0, 1e-3))) for p in prns]
    x = generator.generate(spec, sats, FS, 2.0, seed=29)

    def run(n_mesh):
        cfg = ReceiverConfig(signal="1C", fs=FS, n_channels=6,
                             prns=tuple(prns), chunk_ms=100,
                             n_mesh_devices=n_mesh)
        rx = Receiver(cfg)
        rx.run_source(ArraySignalSource(x, FS))
        return rx

    rx_u = run(None)
    rx_s = run(N_DEV)
    assert sorted(rx_u.tracked_prns()) == sorted(rx_s.tracked_prns()) == sorted(prns)
    # per-channel carrier frequency (settled Doppler) must match closely
    cf_u = np.asarray(rx_u.groups[0].trk_state.carrier_freq)[:6]
    cf_s = np.asarray(rx_s.groups[0].trk_state.carrier_freq)[:6]
    # channels may be assigned in different order; compare PRN-keyed
    m_u = {ch.prn: cf_u[ch.ch_id] for ch in rx_u.groups[0].channels}
    m_s = {ch.prn: cf_s[ch.ch_id] for ch in rx_s.groups[0].channels}
    for p in prns:
        assert abs(m_u[p] - m_s[p]) < 1.0, (p, m_u[p], m_s[p])
