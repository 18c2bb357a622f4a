"""Batched Kalman-filter carrier tracking (phase / Doppler / Doppler rate).

Reference analog: ``gps_l1_ca_kf_tracking_cc`` + the Bayesian measurement-
covariance machinery in ``src/algorithms/tracking/libs/bayesian_estimation.cc``
and the CKF/UKF in ``nonlinear_tracking.cc``. The measurement model here is
linear (Costas phase error = phase state + noise), so the exact linear KF is
the optimal filter — re-designed as a *batched error-state* filter: all
channels advance together, state covariances are [C, 3, 3] arrays in the
tracking scan carry, and the per-boundary update is a handful of [C, 3, 3]
einsums (VPU/MXU-friendly, no per-channel control flow).

Error-state convention: after every update the estimated phase error is
transferred into the NCO (phase jump) and the Doppler estimate becomes the
NCO rate, so the carried mean reduces to the Doppler-rate state ``a``; the
predicted phase error over an interval dt is a*dt^2/2.

Measurement noise R adapts to the C/N0 estimate (atan discriminator variance
1/(2*C/N0*T) rad^2), the reference's adaptive-covariance idea in closed form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_TWO_PI_SQ = np.float32(4.0 * np.pi ** 2)


def kf_init_cov(n_channels: int, sigma_phase_cyc: float = 0.1,
                sigma_freq_hz: float = 20.0,
                sigma_rate_hz_s: float = 20.0) -> np.ndarray:
    """Initial [C, 3, 3] covariance (host numpy, lives in the scan carry)."""
    p = np.zeros((n_channels, 3, 3), np.float32)
    p[:, 0, 0] = sigma_phase_cyc ** 2
    p[:, 1, 1] = sigma_freq_hz ** 2
    p[:, 2, 2] = sigma_rate_hz_s ** 2
    return p


def phase_meas_var_cyc2(cn0_dbhz: jax.Array, coh_time_s: jax.Array) -> jax.Array:
    """Costas/atan discriminator variance in cycles^2 at given C/N0, T."""
    cn0 = jnp.power(10.0, jnp.clip(cn0_dbhz, 10.0, 60.0) / 10.0)
    snr = cn0 * coh_time_s
    var_rad2 = (1.0 + 1.0 / (2.0 * snr)) / (2.0 * snr)
    return var_rad2 / _TWO_PI_SQ


def kf_update(p: jax.Array, accel: jax.Array, freq: jax.Array,
              phase_err_cyc: jax.Array, dt: jax.Array, r_cyc2: jax.Array,
              *, q_phase: float = 1e-6, q_freq: float = 1.0,
              q_rate: float = 100.0
              ) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """One predict+update step for all channels.

    Args:
      p: [C, 3, 3] covariance.
      accel: [C] Doppler rate estimate (Hz/s).
      freq: [C] current NCO frequency (Hz, IF+Doppler).
      phase_err_cyc: [C] measured phase error (cycles).
      dt: [C] update interval (s).
      r_cyc2: [C] measurement variance (cycles^2).
      q_*: process noise densities per second (cycles^2/s, Hz^2/s, (Hz/s)^2/s).

    Returns (p_new, freq_new, accel_new, phase_corr_cyc): the NCO should add
    ``phase_corr_cyc`` to its phase and run at ``freq_new``.
    """
    dt = dt.astype(jnp.float32)
    c = p.shape[0]
    one = jnp.ones((c,), jnp.float32)
    zero = jnp.zeros((c,), jnp.float32)
    # F = [[1, dt, dt^2/2], [0, 1, dt], [0, 0, 1]]  (per channel)
    f_mat = jnp.stack([
        jnp.stack([one, dt, 0.5 * dt * dt], axis=-1),
        jnp.stack([zero, one, dt], axis=-1),
        jnp.stack([zero, zero, one], axis=-1),
    ], axis=-2)                                          # [C, 3, 3]
    q = jnp.zeros((c, 3, 3), jnp.float32)
    q = q.at[:, 0, 0].set(jnp.float32(q_phase) * dt)
    q = q.at[:, 1, 1].set(jnp.float32(q_freq) * dt)
    q = q.at[:, 2, 2].set(jnp.float32(q_rate) * dt)

    p_pred = jnp.einsum("cij,cjk,clk->cil", f_mat, p, f_mat) + q

    # predicted error-state mean: phase = a*dt^2/2, freq = f + a*dt
    phi_pred = 0.5 * accel * dt * dt
    f_pred = freq + accel * dt

    s = p_pred[:, 0, 0] + r_cyc2
    k = p_pred[:, :, 0] / s[:, None]                     # [C, 3]
    y = phase_err_cyc - phi_pred
    phi_hat = phi_pred + k[:, 0] * y
    f_hat = f_pred + k[:, 1] * y
    a_hat = accel + k[:, 2] * y

    # P = (I - K H) P_pred, H = [1, 0, 0]
    ikh = jnp.eye(3, dtype=jnp.float32)[None] - k[:, :, None] * jnp.array(
        [1.0, 0.0, 0.0], jnp.float32)[None, None, :]
    p_new = jnp.einsum("cij,cjk->cik", ikh, p_pred)
    # keep symmetric against float32 roundoff
    p_new = 0.5 * (p_new + jnp.swapaxes(p_new, -1, -2))

    return p_new, f_hat, a_hat, phi_hat
