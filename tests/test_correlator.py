"""Correlator op tests: XLA batched path vs numpy oracle vs Pallas kernel.

Analog of the reference's VOLK QA ("puppet" tests comparing arch variants
against generic, volk_gnsssdr_module/.../qa_utils.cc): every implementation
must match the plain-python oracle on random data.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from gnss_sdr_tpu.ops import correlator, iq
from gnss_sdr_tpu.ops.correlator_pallas import pallas_epoch_correlate


def _oracle(chunk, off, n_samp, code, rem, cps, frac, step, taps):
    """Straightforward numpy implementation of the epoch correlation."""
    out = np.zeros(len(taps), np.complex64)
    for k, d in enumerate(taps):
        acc = 0j
        for n in range(n_samp):
            x = chunk[off + n]
            carrier = np.exp(-2j * np.pi * ((frac + step * n) % 1.0))
            idx = int(np.floor(rem + cps * n + d)) % len(code)
            acc += x * carrier * code[idx]
        out[k] = acc
    return out


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(5)
    n_ch, n_max, lc = 3, 256, 1023
    chunk = (rng.standard_normal(2048) + 1j * rng.standard_normal(2048)).astype(np.complex64)
    codes_t = rng.choice([-1.0, 1.0], (n_ch, lc)).astype(np.float32)
    offsets = np.array([10, 500, 1700], np.int32)
    n_samp = np.array([200, 240, 193], np.int32)
    rem = np.array([0.01, 0.2, 0.13], np.float32)
    cps = np.array([0.25575, 0.2558, 0.2557], np.float32)
    frac = np.array([0.9, 0.1, 0.5], np.float32)
    step = np.array([0.001, -0.002, 0.0007], np.float32)
    taps = np.array([-0.5, 0.0, 0.5], np.float32)
    return dict(chunk=chunk, codes=codes_t, offsets=offsets, n_samp=n_samp,
                rem=rem, cps=cps, frac=frac, step=step, taps=taps, n_max=n_max)


def _expected(c):
    return np.stack([
        _oracle(c["chunk"], int(c["offsets"][i]), int(c["n_samp"][i]),
                c["codes"][i], float(c["rem"][i]), float(c["cps"][i]),
                float(c["frac"][i]), float(c["step"][i]), c["taps"])
        for i in range(3)])


def test_xla_correlator_matches_oracle(case):
    out = correlator.batch_epoch_correlate(
        jnp.asarray(case["chunk"]), jnp.asarray(case["offsets"]),
        jnp.asarray(case["n_samp"]), jnp.asarray(case["codes"]),
        jnp.asarray(case["rem"]), jnp.asarray(case["cps"]),
        jnp.asarray(case["frac"]), jnp.asarray(case["step"]),
        jnp.asarray(case["taps"]), n_max=case["n_max"])
    expect = _expected(case)
    np.testing.assert_allclose(iq.combine(np.asarray(out)), expect,
                               rtol=2e-4, atol=2e-3)


def test_pallas_correlator_matches_oracle(case):
    out = pallas_epoch_correlate(
        jnp.asarray(case["chunk"]), jnp.asarray(case["offsets"]),
        jnp.asarray(case["n_samp"]), jnp.asarray(case["codes"]),
        jnp.asarray(case["rem"]), jnp.asarray(case["cps"]),
        jnp.asarray(case["frac"]), jnp.asarray(case["step"]),
        jnp.asarray(case["taps"]), n_max=case["n_max"], interpret=True)
    expect = _expected(case)
    np.testing.assert_allclose(iq.combine(np.asarray(out)), expect,
                               rtol=2e-4, atol=2e-3)


def test_boc_table_rate(case):
    """table_rate=2 (BOC) indexing: both paths agree with each other."""
    c = case
    codes2 = np.repeat(c["codes"], 2, axis=1).astype(np.float32)
    codes2[:, 1::2] *= -1.0
    args = (jnp.asarray(c["chunk"]), jnp.asarray(c["offsets"]),
            jnp.asarray(c["n_samp"]), jnp.asarray(codes2),
            jnp.asarray(c["rem"]), jnp.asarray(c["cps"]),
            jnp.asarray(c["frac"]), jnp.asarray(c["step"]),
            jnp.asarray(c["taps"]))
    a = correlator.batch_epoch_correlate(*args, n_max=c["n_max"], table_rate=2)
    b = pallas_epoch_correlate(*args, n_max=c["n_max"], table_rate=2,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-3)


def test_stride_replica_matches_gather():
    """The rational-stride replica (ops/correlator stride tables) matches
    the exact gather replica: identical at the nominal code rate, and
    within the documented sub-table-step drift at max code Doppler."""
    import functools
    import jax
    from gnss_sdr_tpu.ops import correlator as co

    fs = 2.0e6
    code_rate = 1.023e6
    n_max = 2064
    lc = 1023
    rng = np.random.default_rng(3)
    C = 4
    tables = (rng.integers(0, 2, (C, lc)) * 2 - 1).astype(np.float32)
    plan = co.stride_plan(fs, code_rate, 1, n_max, lc)
    assert plan is not None
    p, r, m, a = plan
    assert (p, r) == (1023, 2000)        # 0.5115 is exactly rational here
    vt = co.build_stride_tables(tables, plan)
    assert vt.shape == (C, p, a) and vt.dtype == np.int8

    chunk = rng.standard_normal((8192, 2)).astype(np.float32)
    taps = jnp.asarray([-0.5, 0.0, 0.5], jnp.float32)
    offs = jnp.asarray([11, 503, 1200, 77], jnp.int32)
    nsamp = jnp.full((C,), 1956, jnp.int32)
    rem = jnp.asarray([0.001, 0.25, 0.618, 0.93], jnp.float32)
    cps0 = jnp.full((C,), code_rate / fs, jnp.float32)
    cfrac = jnp.asarray([0.0, 0.3, 0.7, 0.11], jnp.float32)
    cstep = jnp.full((C,), 0.0021, jnp.float32)

    ref = co.batch_epoch_correlate(
        jnp.asarray(chunk), offs, nsamp, jnp.asarray(tables), rem, cps0,
        cfrac, cstep, taps, n_max=n_max, table_rate=1)
    got = co.batch_epoch_correlate_stride(
        jnp.asarray(chunk), offs, nsamp, jnp.asarray(vt), rem, cps0,
        cfrac, cstep, taps, n_max=n_max, table_rate=1, plan=plan)
    # nominal rate: bit-identical replicas -> identical correlations
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-3)

    # max code Doppler (~5 kHz at L1): replica drift <= half a table step;
    # correlation difference stays a tiny fraction of the signal power
    cps_dop = cps0 * (1.0 + 5000.0 / 1.57542e9)
    ref_d = co.batch_epoch_correlate(
        jnp.asarray(chunk), offs, nsamp, jnp.asarray(tables), rem, cps_dop,
        cfrac, cstep, taps, n_max=n_max, table_rate=1)
    got_d = co.batch_epoch_correlate_stride(
        jnp.asarray(chunk), offs, nsamp, jnp.asarray(vt), rem, cps_dop,
        cfrac, cstep, taps, n_max=n_max, table_rate=1, plan=plan)
    # the drift flips only a handful of boundary samples; against a
    # COHERENT correlation (scale ~ n_samples) that is <0.5%, but this
    # noise fixture's sums scale as sqrt(n), so bound the absolute change
    # by a few flipped samples (each <= 2*|x|max)
    xmax = float(np.abs(chunk).max())
    diff = float(np.abs(np.asarray(got_d) - np.asarray(ref_d)).max())
    assert diff < 8 * 2 * xmax, diff


def test_stride_plan_rationality_and_fallback():
    from gnss_sdr_tpu.ops import correlator as co
    # exact commensurate rate: 2 samples/chip
    assert co.stride_plan(2.046e6, 1.023e6, 1, 2100, 1023)[:2] == (1, 2)
    # BOC table at 2 entries/chip
    plan_boc = co.stride_plan(4.092e6, 1.023e6, 2, 4160, 4092)
    assert plan_boc is not None and plan_boc[0] >= 1
    # memory cap falls back to None
    assert co.stride_plan(11.999e6, 10.23e6, 1, 12100, 10230,
                          max_entries=1000) is None


def test_track_chunk_stride_matches_gather_closed_loop():
    """Closed-loop: the full tracking scan over a real signal converges to
    the same lock with stride tables as with the gather tables."""
    import dataclasses as dc
    from gnss_sdr_tpu import constants
    from gnss_sdr_tpu.models import codes
    from gnss_sdr_tpu.receiver import tracking as trk
    from gnss_sdr_tpu.utils import generator
    from gnss_sdr_tpu.ops import iq as iqmod

    fs = 2.0e6
    spec = constants.GPS_L1_CA
    cfg = trk.default_config(spec, fs, chunk_ms=100)
    assert cfg.stride_plan is not None
    prn, dop = 9, 1234.0
    sats = [generator.SatParams(prn=prn, cn0_dbhz=47.0, doppler_hz=dop,
                                code_delay_s=2e-4)]
    x = generator.generate(spec, sats, fs, 0.62, seed=8)
    tables = codes.code_chips("1C", prn).astype(np.float32)[None, :]

    def run(dev_tables):
        st = trk.init_state(1, cfg.n_taps)
        st = trk.start_channel(st, 0, code_freq=1.023e6 * (1 + dop / 1.57542e9),
                               doppler_hz=dop, sample_offset=400)
        outs = []
        for k in range(5):
            chunk = iqmod.split(x[k*int(0.1*fs): (k+1)*int(0.1*fs)+cfg.n_max])
            st, out = trk.track_chunk(cfg, jnp.asarray(chunk), st,
                                      jnp.asarray(dev_tables))
            st = jax.tree.map(np.array, st)
            st = st._replace(sample_offset=st.sample_offset - 0)
            outs.append(np.asarray(out.cn0_dbhz[-1, 0]))
        return st, outs

    import jax
    st_a, cn0_a = run(tables)
    st_b, cn0_b = run(trk.prepare_code_tables(cfg, tables))
    assert cn0_a[-1] > 40 and cn0_b[-1] > 40
    assert abs(float(st_a.carrier_freq[0]) - float(st_b.carrier_freq[0])) < 1.0
    assert abs(float(st_a.code_freq[0]) - float(st_b.code_freq[0])) < 1.0
