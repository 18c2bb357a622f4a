"""MXU-native FFT: four-step Cooley-Tukey built from dense DFT matmuls.

The acquisition engine's FFTs must run on TPU hardware whose XLA backend may
not ship the FFT custom-call (and even where it does, a matmul formulation
rides the MXU systolic array, which is where this chip's FLOPs live). For a
length n = n1*n2 transform:

    X[k1*n2 + k2] = sum_t1 W_n[t1*k2] * W_n1[t1*k1]
                    * (sum_t2 x[t2*n1 + t1] * W_n2[t2*k2])

i.e. reshape -> [n2-point DFT as matmul] -> twiddle -> [n1-point DFT as
matmul] -> reshape. Both stages are [batch, n1, n2] x [n, n] complex matmuls
expressed in real arithmetic (4 real MXU matmuls each). Factors are chosen
<= 512 so the DFT matrices stay tiny; one split level covers n <= 262144.

Used by ops/acquisition.py in "matmul" mode; numerically validated against
numpy.fft in tests/test_fft.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def _split(n: int) -> tuple[int, int]:
    """Factor n = n1 * n2 with both factors <= 512 (prefer balanced)."""
    best = None
    for n1 in range(int(np.sqrt(n)), 0, -1):
        if n % n1 == 0:
            n2 = n // n1
            if n1 <= 512 and n2 <= 512:
                return n1, n2
            if best is None:
                best = (n1, n2)
    return best  # may exceed 512 for pathological n; still correct


@functools.lru_cache(maxsize=32)
def _dft_matrices(n: int, inverse: bool):
    """Host-side constant DFT/twiddle tables for length n."""
    n1, n2 = _split(n)
    sign = 2j if inverse else -2j
    w1 = np.exp(sign * np.pi / n1 * np.outer(np.arange(n1), np.arange(n1)))
    w2 = np.exp(sign * np.pi / n2 * np.outer(np.arange(n2), np.arange(n2)))
    tw = np.exp(sign * np.pi / n * np.outer(np.arange(n1), np.arange(n2)))
    return (n1, n2, w1.astype(np.complex64), w2.astype(np.complex64),
            tw.astype(np.complex64))


def _cmatmul(a, b):
    """Complex matmul via 4 real MXU contractions (f32 accumulate)."""
    ar, ai = jnp.real(a), jnp.imag(a)
    br, bi = jnp.real(b), jnp.imag(b)
    rr = jnp.matmul(ar, br, preferred_element_type=jnp.float32) \
        - jnp.matmul(ai, bi, preferred_element_type=jnp.float32)
    ri = jnp.matmul(ar, bi, preferred_element_type=jnp.float32) \
        + jnp.matmul(ai, br, preferred_element_type=jnp.float32)
    return jax.lax.complex(rr, ri)


def _fft_impl(x: jax.Array, n: int, inverse: bool) -> jax.Array:
    n1, n2, w1, w2, tw = _dft_matrices(n, inverse)
    w1 = jnp.asarray(w1)
    w2 = jnp.asarray(w2)
    tw = jnp.asarray(tw)
    batch = x.shape[:-1]
    # A[t2, t1] with t = t2*n1 + t1
    a = x.reshape(*batch, n2, n1)
    # inner DFT over t2: B[t1, k2] = sum_t2 A[t2, t1] W2[t2, k2]
    b = _cmatmul(jnp.swapaxes(a, -1, -2), w2)            # [.., n1, n2]
    b = b * tw                                            # twiddle
    # outer DFT over t1: C[k1, k2] = sum_t1 W1[k1, t1] B[t1, k2]
    c = _cmatmul(w1, b)                                   # [.., n1, n2]
    out = c.reshape(*batch, n)
    if inverse:
        out = out / jnp.complex64(n)
    return out


@functools.partial(jax.jit, static_argnames=("n",))
def fft(x: jax.Array, n: int | None = None) -> jax.Array:
    """FFT along the last axis (complex64), matmul formulation."""
    if n is None:
        n = x.shape[-1]
    return _fft_impl(x.astype(jnp.complex64), n, inverse=False)


@functools.partial(jax.jit, static_argnames=("n",))
def ifft(x: jax.Array, n: int | None = None) -> jax.Array:
    if n is None:
        n = x.shape[-1]
    return _fft_impl(x.astype(jnp.complex64), n, inverse=True)


def next_composite_pow2(n: int) -> int:
    """Smallest power of two >= n (pow2 splits keep factors small)."""
    p = 1
    while p < n:
        p *= 2
    return p


def is_friendly(n: int) -> bool:
    """True when _split factors n with both factors <= 512 — i.e. the
    matmul FFT needs only small dense DFT matrices (no O(n^2) fallback)."""
    n1, n2 = _split(n)
    return n1 <= 512 and n2 <= 512


def friendly_len(n: int) -> int:
    """Smallest m >= n that factors m = m1 * m2 with both <= 512.

    Acquisition pads its FFT windows to this length so an awkward sample
    rate (prime samples-per-code) can never trigger _split's dense-DFT
    fallback — which would compile an n x n complex constant (multi-GB for
    megasample windows). Dense below 262144 = 512^2; callers stay under it.
    """
    if n > 512 * 512:
        raise ValueError(f"no <=512-factor split exists for n >= {n}")
    m = n
    while not is_friendly(m):
        m += 1
    return m
