"""Sigma-point filter QA, mirroring the reference's nonlinear-tracking tests.

Reference analogs: ``cubature_filter_test.cc`` / ``unscented_filter_test.cc``
validate CubatureFilter / UnscentedFilter against the exact linear KF on
random linear models; here we add a nonlinear carrier-phase model (raw I/Q
measurement) and a vmapped channel bank (the TPU-native usage).
"""

import numpy as np
import jax
import jax.numpy as jnp

from gnss_sdr_tpu.ops import nonlinear_kf as nkf

# The UT weights at the reference's alpha=1e-3 are ~1e6 in magnitude
# (catastrophic cancellation in float32), so the linear-equivalence checks
# run under the x64 context manager; the rest of the suite stays float32.
_x64 = lambda: jax.enable_x64(True)


def _linear_kf_step(x, p, f_mat, q, h_mat, r, z):
    x_pred = f_mat @ x
    p_pred = f_mat @ p @ f_mat.T + q
    s = h_mat @ p_pred @ h_mat.T + r
    k = p_pred @ h_mat.T @ np.linalg.inv(s)
    x_post = x_pred + k @ (z - h_mat @ x_pred)
    p_post = p_pred - k @ s @ k.T
    return x_pred, p_pred, x_post, p_post


def _random_linear_case(rng, nx, ny):
    x = rng.standard_normal(nx)
    p = np.diag(5.0 * rng.uniform(0.5, 1.0, nx))
    f_mat = rng.uniform(0.1, 1.0, (nx, nx))
    q = np.diag(rng.uniform(0.1, 1.0, nx))
    h_mat = rng.uniform(0.1, 1.0, (ny, nx))
    r = np.diag(rng.uniform(0.5, 1.0, ny))
    z = h_mat @ x + rng.standard_normal(ny)
    return x, p, f_mat, q, h_mat, r, z


def _check_matches_linear_kf(predict, update, atol):
    """On a linear model the sigma-point filters equal the exact KF
    (the reference's CubatureFilterComputationTest assertion)."""
    rng = np.random.default_rng(7)
    for _ in range(8):  # the reference runs randomized trials the same way
        nx = int(rng.integers(1, 6))
        ny = int(rng.integers(1, 6))
        x, p, f_mat, q, h_mat, r, z = _random_linear_case(rng, nx, ny)
        x_pred, p_pred, x_post, p_post = _linear_kf_step(
            x, p, f_mat, q, h_mat, r, z)
        fj = lambda v: jnp.asarray(f_mat) @ v
        hj = lambda v: jnp.asarray(h_mat) @ v
        xp, pp = predict(jnp.asarray(x), jnp.asarray(p), fj, jnp.asarray(q))
        np.testing.assert_allclose(xp, x_pred, atol=atol)
        np.testing.assert_allclose(pp, p_pred, atol=atol)
        xu, pu = update(jnp.asarray(z), xp, pp, hj, jnp.asarray(r))
        np.testing.assert_allclose(xu, x_post, atol=atol)
        np.testing.assert_allclose(pu, p_post, atol=atol)


def test_cubature_matches_linear_kf():
    with _x64():
        _check_matches_linear_kf(nkf.cubature_predict, nkf.cubature_update,
                                 atol=1e-8)


def test_unscented_matches_linear_kf():
    with _x64():
        _check_matches_linear_kf(nkf.unscented_predict,
                                 nkf.unscented_update, atol=1e-5)


def test_cubature_tracks_nonlinear_phase():
    """CKF on the raw-I/Q carrier model: state [phase_cyc, freq_hz], the
    measurement is the prompt correlator pair A[cos 2πφ, sin 2πφ] — the
    nonlinear model the reference library targets (nonlinear_tracking.h
    header notes). The filter must converge on the true Doppler without any
    discriminator linearization."""
    rng = np.random.default_rng(3)
    dt = 1e-3
    amp = 1.0
    sigma = 0.15
    true_f = 37.0
    true_phi = 0.2
    f_mat = np.array([[1.0, dt], [0.0, 1.0]])
    q = np.diag([1e-8, 1e-2])
    r = np.eye(2) * sigma ** 2

    def h(x):
        ang = 2.0 * jnp.pi * x[0]
        return amp * jnp.stack([jnp.cos(ang), jnp.sin(ang)])

    fj = lambda v: jnp.asarray(f_mat) @ v
    x = jnp.asarray([0.0, 0.0])
    p = jnp.asarray(np.diag([0.1 ** 2, 30.0 ** 2]))
    predict = jax.jit(lambda x, p: nkf.cubature_predict(x, p, fj,
                                                        jnp.asarray(q)))
    update = jax.jit(lambda z, x, p: nkf.cubature_update(z, x, p, h,
                                                         jnp.asarray(r)))
    for k in range(400):
        phi = true_phi + true_f * k * dt
        z = np.array([np.cos(2 * np.pi * phi), np.sin(2 * np.pi * phi)])
        z = z + sigma * rng.standard_normal(2)
        x, p = predict(x, p)
        x, p = update(jnp.asarray(z), x, p)
    assert abs(float(x[1]) - true_f) < 0.5, float(x[1])
    phi_end = true_phi + true_f * 399 * dt
    err = (float(x[0]) - phi_end + 0.5) % 1.0 - 0.5
    assert abs(err) < 0.05, err


def test_batched_bank_equals_loop():
    """vmapped channel bank == per-channel loop (one filter per tracking
    channel in the reference; one fused device call here)."""
    with _x64():
        _check_batched_bank()


def _check_batched_bank():
    rng = np.random.default_rng(11)
    c, nx, ny = 5, 3, 2
    f_mat = rng.uniform(0.1, 1.0, (nx, nx))
    h_mat = rng.uniform(0.1, 1.0, (ny, nx))
    fj = lambda v: jnp.asarray(f_mat) @ v
    hj = lambda v: jnp.sin(jnp.asarray(h_mat) @ v)       # nonlinear bank
    xs = jnp.asarray(rng.standard_normal((c, nx)))
    ps = jnp.asarray(np.stack([np.diag(rng.uniform(0.5, 2.0, nx))
                               for _ in range(c)]))
    qs = jnp.asarray(np.stack([np.diag(rng.uniform(0.1, 0.5, nx))
                               for _ in range(c)]))
    rs = jnp.asarray(np.stack([np.diag(rng.uniform(0.2, 0.5, ny))
                               for _ in range(c)]))
    zs = jnp.asarray(rng.standard_normal((c, ny)))

    bp = nkf.batched_predict(nkf.cubature_predict)
    bu = nkf.batched_update(nkf.cubature_update)
    xp_b, pp_b = bp(xs, ps, fj, qs)
    xu_b, pu_b = bu(zs, xp_b, pp_b, hj, rs)
    for i in range(c):
        xp, pp = nkf.cubature_predict(xs[i], ps[i], fj, qs[i])
        xu, pu = nkf.cubature_update(zs[i], xp, pp, hj, rs[i])
        np.testing.assert_allclose(xp_b[i], xp, atol=1e-10)
        np.testing.assert_allclose(pu_b[i], pu, atol=1e-10)
        np.testing.assert_allclose(xu_b[i], xu, atol=1e-10)
