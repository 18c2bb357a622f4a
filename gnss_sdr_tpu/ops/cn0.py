"""C/N0 estimation and lock detectors as exponential-smoother carry updates.

Reference analogs: ``cn0_svn_estimator`` and ``carrier_lock_detector`` in
``src/algorithms/tracking/libs/lock_detectors.cc``. Instead of the reference's
20-sample block buffers, we keep exponentially smoothed moments in the scan
carry — O(1) state per channel, equivalent steady-state behavior.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# numpy, not jnp: module-level jnp constants are eager device arrays that
# poison jitted scans on the target TPU runtime (see ops/discriminators.py)
_EPS = np.float32(1e-12)


class Cn0State(NamedTuple):
    ema_abs_i: jax.Array    # E[|I_P|]
    ema_p2: jax.Array       # E[|P|^2]
    ema_i2_minus_q2: jax.Array   # E[I^2 - Q^2]  (carrier lock metric num.)
    ema_i2_plus_q2: jax.Array    # E[I^2 + Q^2]  (carrier lock metric den.)


def cn0_init(shape) -> Cn0State:
    z = jnp.zeros(shape, jnp.float32)
    return Cn0State(z, z + _EPS, z, z + _EPS)


def cn0_update(state: Cn0State, prompt: jax.Array, valid: jax.Array,
               alpha: float = 0.05) -> Cn0State:
    """Update smoothed moments with the latest prompt correlator output."""
    a = jnp.float32(alpha)
    i = jnp.real(prompt)
    q = jnp.imag(prompt)
    p2 = i * i + q * q
    upd = lambda old, new: jnp.where(valid, old + a * (new - old), old)
    return Cn0State(
        ema_abs_i=upd(state.ema_abs_i, jnp.abs(i)),
        ema_p2=upd(state.ema_p2, p2),
        ema_i2_minus_q2=upd(state.ema_i2_minus_q2, i * i - q * q),
        ema_i2_plus_q2=upd(state.ema_i2_plus_q2, p2),
    )


def cn0_dbhz(state: Cn0State, coh_time_s: jax.Array) -> jax.Array:
    """Signal-to-Noise-Variance C/N0 estimate in dB-Hz.

    SNV: Pd = (E[|I|])^2 (signal power), Pn = E[|P|^2] - Pd (noise power);
    C/N0 = (Pd / Pn) / T_coh.
    """
    pd = state.ema_abs_i ** 2
    pn = jnp.maximum(state.ema_p2 - pd, _EPS)
    snr = pd / pn
    return jnp.float32(10.0) * jnp.log10(jnp.maximum(snr / coh_time_s, _EPS))


def carrier_lock_metric(state: Cn0State) -> jax.Array:
    """Carrier lock test in [-1, 1]: cos(2*phase_err) estimate.

    > ~0.85 means solid phase lock (reference uses 0.85 via
    carrier_lock_detector with NBD/NBP).
    """
    return state.ema_i2_minus_q2 / jnp.maximum(state.ema_i2_plus_q2, _EPS)
