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
