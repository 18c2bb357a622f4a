"""Split-IQ boundary convention.

Complex64 arrays must never cross the host<->device boundary: on the target
TPU runtime, device->host transfers of complex64 are not implemented (the
reference never has this problem because its VOLK kernels are host code).
The framework therefore uses **interleaved real float32** — shape [..., 2]
with I in channel 0 and Q in channel 1 — for every jitted function's inputs,
outputs, and carried state. Complex arithmetic is free *inside* a jit
(XLA lowers it to the same real math), so kernels convert on entry with
:func:`as_complex` and convert back on exit with :func:`as_iq2`.

This is also the natural wire format: RF front-ends deliver interleaved I/Q
(the reference's ishort/ibyte formats, ``src/algorithms/data_type_adapter``),
so the split representation avoids a host-side complex pack/unpack entirely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def split(x: np.ndarray) -> np.ndarray:
    """Host-side: complex array -> float32 [..., 2] (I, Q)."""
    x = np.asarray(x)
    if x.dtype.kind != "c":
        if x.ndim >= 1 and x.shape[-1] == 2:
            return np.ascontiguousarray(x, np.float32)
        raise TypeError(f"expected complex or [..., 2] array, got {x.dtype}")
    return np.ascontiguousarray(
        np.stack([x.real, x.imag], axis=-1), dtype=np.float32)


def combine(x2: np.ndarray) -> np.ndarray:
    """Host-side: float32 [..., 2] -> complex64."""
    x2 = np.asarray(x2, np.float32)
    return (x2[..., 0] + 1j * x2[..., 1]).astype(np.complex64)


def as_complex(x2: jax.Array) -> jax.Array:
    """In-jit: [..., 2] float -> complex (or pass complex through)."""
    if jnp.iscomplexobj(x2):
        return x2
    return jax.lax.complex(x2[..., 0], x2[..., 1])


def as_iq2(z: jax.Array) -> jax.Array:
    """In-jit: complex -> [..., 2] float32 (or pass [..., 2] through)."""
    if not jnp.iscomplexobj(z):
        return z
    return jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1).astype(jnp.float32)
