"""Sigma-point (cubature / unscented) Kalman filters, jit/vmap-native.

Reference analog: ``src/algorithms/tracking/libs/nonlinear_tracking.{h,cc}``
(CubatureFilter / UnscentedFilter, Arasaratnam & Haykin 2009), QA'd there by
``cubature_filter_test.cc`` / ``unscented_filter_test.cc`` against the exact
linear KF. The reference evaluates sigma points one column at a time through
an Armadillo ``ModelFunction``; here the model is a JAX callable mapped over
the sigma-point axis with ``vmap``, so one filter step is a handful of fused
[P, N] matrix ops — and a whole bank of filters (one per tracking channel)
batches with an outer ``vmap`` instead of a Python loop.

All functions are pure and jittable. ``predict`` and ``update`` are separate
(matching the reference's predict_sequential / update_sequential) so callers
can interleave them with NCO feedback between steps.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Model = Callable[[jax.Array], jax.Array]


def _sqrt_cov(p: jax.Array) -> jax.Array:
    """Symmetric PSD matrix square root via eigendecomposition.

    The reference uses ``arma::sqrtmat_sympd``; eigh is its jit-safe analog
    (cholesky would NaN on the semidefinite covariances that arise after a
    strong update collapses a state direction).
    """
    w, v = jnp.linalg.eigh(p)
    w = jnp.sqrt(jnp.maximum(w, 0.0))
    return (v * w[None, :]) @ v.T


def _cubature_points(x: jax.Array, p: jax.Array) -> jax.Array:
    """[2n, n] cubature point set: x ± sqrt(n)·S·e_i (3rd-degree rule)."""
    n = x.shape[0]
    s = _sqrt_cov(p) * jnp.sqrt(jnp.asarray(float(n), x.dtype))
    return jnp.concatenate([x[None, :] + s.T, x[None, :] - s.T], axis=0)


def cubature_predict(x: jax.Array, p: jax.Array, f: Model, q: jax.Array
                     ) -> tuple[jax.Array, jax.Array]:
    """CKF time update: propagate 2n cubature points through ``f``.

    Args:
      x: [n] posterior mean.   p: [n, n] posterior covariance.
      f: transition model, [n] -> [n] (vmapped over points here).
      q: [n, n] process noise covariance.
    Returns (x_pred, p_pred).
    """
    pts = jax.vmap(f)(_cubature_points(x, p))            # [2n, n]
    x_pred = jnp.mean(pts, axis=0)
    d = pts - x_pred[None, :]
    p_pred = d.T @ d / pts.shape[0] + q
    return x_pred, 0.5 * (p_pred + p_pred.T)


def cubature_update(z: jax.Array, x_pred: jax.Array, p_pred: jax.Array,
                    h: Model, r: jax.Array
                    ) -> tuple[jax.Array, jax.Array]:
    """CKF measurement update with measurement model ``h`` ([n] -> [m]).

    Returns (x_post, p_post). Innovation covariance is solved, not inverted
    (``jnp.linalg.solve`` on the [m, m] system).
    """
    pts = _cubature_points(x_pred, p_pred)               # [2n, n]
    zs = jax.vmap(h)(pts)                                # [2n, m]
    z_pred = jnp.mean(zs, axis=0)
    dz = zs - z_pred[None, :]
    dx = pts - x_pred[None, :]
    npts = pts.shape[0]
    s = dz.T @ dz / npts + r                             # [m, m]
    pxz = dx.T @ dz / npts                               # [n, m]
    k = jnp.linalg.solve(s.T, pxz.T).T                   # [n, m]
    x_post = x_pred + k @ (z - z_pred)
    p_post = p_pred - k @ s @ k.T
    return x_post, 0.5 * (p_post + p_post.T)


def _ut_weights(n: int, alpha: float, kappa: float, beta: float,
                dtype) -> tuple[jax.Array, jax.Array, float]:
    lam = alpha * alpha * (n + kappa) - n
    wm = jnp.full((2 * n + 1,), 1.0 / (2.0 * (n + lam)), dtype)
    wm = wm.at[0].set(lam / (n + lam))
    wc = wm.at[0].set(lam / (n + lam) + (1.0 - alpha * alpha + beta))
    return wm, wc, float(n + lam)


def _ut_points(x: jax.Array, p: jax.Array, scale: float) -> jax.Array:
    """[2n+1, n] unscented point set: x, x ± sqrt(n+λ)·S·e_i."""
    s = _sqrt_cov(p) * jnp.sqrt(jnp.asarray(scale, x.dtype))
    return jnp.concatenate(
        [x[None, :], x[None, :] + s.T, x[None, :] - s.T], axis=0)


def unscented_predict(x: jax.Array, p: jax.Array, f: Model, q: jax.Array,
                      *, alpha: float = 1e-3, kappa: float = 0.0,
                      beta: float = 2.0) -> tuple[jax.Array, jax.Array]:
    """UKF time update (reference defaults α=1e-3, κ=0, β=2,
    ``nonlinear_tracking.cc`` UnscentedFilter::predict_sequential)."""
    n = x.shape[0]
    wm, wc, scale = _ut_weights(n, alpha, kappa, beta, x.dtype)
    pts = jax.vmap(f)(_ut_points(x, p, scale))           # [2n+1, n]
    x_pred = wm @ pts
    d = pts - x_pred[None, :]
    p_pred = (d * wc[:, None]).T @ d + q
    return x_pred, 0.5 * (p_pred + p_pred.T)


def unscented_update(z: jax.Array, x_pred: jax.Array, p_pred: jax.Array,
                     h: Model, r: jax.Array, *, alpha: float = 1e-3,
                     kappa: float = 0.0, beta: float = 2.0
                     ) -> tuple[jax.Array, jax.Array]:
    """UKF measurement update; weights as in the reference."""
    n = x_pred.shape[0]
    wm, wc, scale = _ut_weights(n, alpha, kappa, beta, x_pred.dtype)
    pts = _ut_points(x_pred, p_pred, scale)              # [2n+1, n]
    zs = jax.vmap(h)(pts)                                # [2n+1, m]
    z_pred = wm @ zs
    dz = zs - z_pred[None, :]
    dx = pts - x_pred[None, :]
    s = (dz * wc[:, None]).T @ dz + r
    pxz = (dx * wc[:, None]).T @ dz
    k = jnp.linalg.solve(s.T, pxz.T).T
    x_post = x_pred + k @ (z - z_pred)
    p_post = p_pred - k @ s @ k.T
    return x_post, 0.5 * (p_post + p_post.T)


def batched_predict(step: Model = cubature_predict) -> Callable:
    """Lift a predict step over a leading channel axis:
    (x[C,n], P[C,n,n], f, Q[C,n,n]) -> (x_pred[C,n], P_pred[C,n,n]) —
    the channel-bank analog of the reference running one filter object per
    tracking channel, fused into one device call."""
    return jax.vmap(step, in_axes=(0, 0, None, 0))


def batched_update(step: Model = cubature_update) -> Callable:
    """Lift an update step over a leading channel axis:
    (z[C,m], x[C,n], P[C,n,n], h, R[C,m,m]) -> posterior bank."""
    return jax.vmap(step, in_axes=(0, 0, 0, None, 0))
