"""Tracking-loop discriminators (pure jnp functions, batched over channels).

Same estimator family as the reference's
``src/algorithms/tracking/libs/tracking_discriminators.cc`` — DLL non-coherent
early-minus-late power envelope, Costas PLL atan, FLL atan2 over consecutive
prompts — reformulated as vectorized float32 ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# plain numpy scalars, NOT jnp: a module-level jnp constant is an eager
# device array; closed over by a jitted scan it forces the whole loop onto a
# ~60x slower execution path on the target TPU runtime (and the eager op
# itself may not be supported on backends without eager dispatch)
_TWO_PI = np.float32(2.0 * np.pi)
_EPS = np.float32(1e-20)


def dll_nc_emlp(early: jax.Array, late: jax.Array,
                spacing_chips: float = 0.5) -> jax.Array:
    """Normalized non-coherent early-minus-late power, output in chips.

    err = (|E| - |L|) / (|E| + |L|) * (1 - spacing) ... classic normalized EMLP
    (reference: dll_nc_e_minus_l_normalized, tracking_discriminators.cc).
    """
    e = jnp.abs(early)
    l = jnp.abs(late)
    return (e - l) / jnp.maximum(e + l, _EPS) * jnp.float32(1.0 - spacing_chips)


def dll_nc_vemlp(very_early, early, late, very_late) -> jax.Array:
    """VEML power discriminator for BOC signals (chips)."""
    p_e = jnp.sqrt(jnp.abs(very_early) ** 2 + jnp.abs(early) ** 2)
    p_l = jnp.sqrt(jnp.abs(very_late) ** 2 + jnp.abs(late) ** 2)
    return (p_e - p_l) / jnp.maximum(p_e + p_l, _EPS)


def pll_costas(prompt: jax.Array) -> jax.Array:
    """Costas-loop atan discriminator, output in cycles (data-bit insensitive)."""
    i = jnp.real(prompt)
    q = jnp.imag(prompt)
    safe_i = jnp.where(jnp.abs(i) < _EPS, _EPS, i)
    return jnp.arctan(q / safe_i) / _TWO_PI


def pll_atan2(prompt: jax.Array) -> jax.Array:
    """Four-quadrant phase discriminator (pilot channels), cycles."""
    return jnp.arctan2(jnp.imag(prompt), jnp.real(prompt)) / _TWO_PI


def fll_atan2(prev_prompt: jax.Array, prompt: jax.Array,
              dt_s: jax.Array) -> jax.Array:
    """Frequency discriminator over consecutive prompts, output in Hz.

    cross = Im(P_k * conj(P_{k-1})), dot = Re(P_k * conj(P_{k-1}));
    f_err = atan(cross/dot) / (2*pi*dt) — the atan (not atan2) form is
    insensitive to data-bit sign flips between the two prompts; pull-in range
    is +/- 1/(4*dt) Hz. Positive when the true carrier is above the NCO.
    """
    z = prompt * jnp.conj(prev_prompt)
    dot = jnp.real(z)
    safe_dot = jnp.where(jnp.abs(dot) < _EPS, _EPS, dot)
    return jnp.arctan(jnp.imag(z) / safe_dot) / (_TWO_PI * dt_s)
