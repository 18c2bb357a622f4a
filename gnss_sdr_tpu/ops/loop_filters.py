"""Digital tracking loop filters as pure carry-state update functions.

Equivalent role to the reference's ``tracking_2nd_DLL_filter.cc`` /
``tracking_2nd_PLL_filter.cc`` / ``tracking_FLL_PLL_filter.cc``: classic
Kaplan-style 2nd/3rd-order controllers, written as stateless (state-in,
state-out) float32 functions so they can live inside a ``lax.scan`` carry and
batch over channels.

Loop natural frequencies from noise bandwidth (Kaplan & Hegarty tables):
  1st order: w0 = 4.0 * Bn
  2nd order: w0 = Bn / 0.53,   a2 = 1.414
  3rd order: w0 = Bn / 0.7845, a3 = 1.1, b3 = 2.4
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Loop3State(NamedTuple):
    """Third-order loop integrators (also used for FLL-assisted PLL)."""

    acc1: jax.Array  # first integrator  (output accumulator)
    acc2: jax.Array  # second integrator


def loop3_init(shape, init_output) -> Loop3State:
    z = jnp.zeros(shape, jnp.float32)
    return Loop3State(acc1=jnp.asarray(init_output, jnp.float32) * jnp.ones(shape, jnp.float32), acc2=z)


def pll3_update(state: Loop3State, phase_err_cycles: jax.Array,
                freq_err_hz: jax.Array, dt_s: jax.Array,
                pll_bw_hz: jax.Array, fll_bw_hz: jax.Array) -> tuple[Loop3State, jax.Array]:
    """FLL-assisted 3rd-order PLL update; returns (state, freq_out_hz).

    With fll_bw == 0 this is a pure 3rd-order PLL. Errors: phase in cycles,
    frequency in Hz; output frequency command in Hz.
    """
    w0p = pll_bw_hz / jnp.float32(0.7845)
    a3 = jnp.float32(1.1)
    b3 = jnp.float32(2.4)
    w0f = fll_bw_hz / jnp.float32(0.53)
    a2 = jnp.float32(1.414)

    acc2 = state.acc2 + dt_s * (w0p ** 3 * phase_err_cycles
                                + w0f ** 2 * freq_err_hz)
    acc1 = state.acc1 + dt_s * (acc2
                                + a3 * w0p ** 2 * phase_err_cycles
                                + a2 * w0f * freq_err_hz)
    out = acc1 + b3 * w0p * phase_err_cycles
    return Loop3State(acc1=acc1, acc2=acc2), out


class Loop2State(NamedTuple):
    acc1: jax.Array


def loop2_init(shape, init_output) -> Loop2State:
    return Loop2State(acc1=jnp.asarray(init_output, jnp.float32)
                      * jnp.ones(shape, jnp.float32))


def dll2_update(state: Loop2State, code_err_chips: jax.Array, dt_s: jax.Array,
                dll_bw_hz: jax.Array) -> tuple[Loop2State, jax.Array]:
    """2nd-order DLL; error in chips, output in chips/s."""
    w0 = dll_bw_hz / jnp.float32(0.53)
    a2 = jnp.float32(1.414)
    acc1 = state.acc1 + dt_s * w0 ** 2 * code_err_chips
    out = acc1 + a2 * w0 * code_err_chips
    return Loop2State(acc1=acc1), out
