"""Scan-based multi-channel tracking engine.

TPU-native redesign of the reference's per-channel DLL/PLL tracking block
(``src/algorithms/tracking/gnuradio_blocks/dll_pll_veml_tracking.cc``,
``general_work`` at :1572): instead of one GNU Radio thread per satellite
consuming a ring buffer, ALL channels advance together through a fixed-size
sample chunk inside a single jitted ``lax.scan`` — one scan step = one code
epoch per channel, channels batched on the leading axis (``vmap``), loop
filters and NCO states threaded through the scan carry.

Variable epoch lengths (code-phase slew) are handled with fixed-size padded
windows + masking; per-channel sample offsets into the chunk live in the carry
and roll over between chunks (the chunk is fed with a one-epoch halo so any
epoch *starting* inside the chunk can complete).

Pull-in -> wide -> narrow state machine is branchless (per-channel state codes
select loop bandwidths / FLL assist via ``jnp.where``), mirroring the
reference's 5-state machine at dll_pll_veml_tracking.cc:1592-1791.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gnss_sdr_tpu.ops import cn0 as cn0_ops
from gnss_sdr_tpu.ops import correlator, discriminators, iq
from gnss_sdr_tpu.ops import loop_filters as lf

# channel tracking-state codes (reference: dll_pll_veml_tracking state machine)
STANDBY = 0
PULL_IN = 1
WIDE_TRACK = 2
NARROW_TRACK = 3


@dataclasses.dataclass(frozen=True)
class TrackingConfig:
    """Static (trace-time) tracking parameters for one signal family."""

    fs: float                       # conditioned sample rate [sps]
    code_length_chips: int
    code_rate_cps: float
    carrier_freq_hz: float          # nominal RF carrier (for code aiding)
    if_freq_hz: float = 0.0
    chunk_len: int = 0              # samples consumed per chunk (set by engine)
    n_steps: int = 0                # scan steps per chunk
    n_max: int = 0                  # padded epoch window [samples]
    tap_offsets: tuple = (-0.5, 0.0, 0.5)
    table_rate: int = 1             # code-table entries per chip (2 for BOC)
    pll_bw_hz: float = 40.0
    dll_bw_hz: float = 4.0
    fll_bw_hz: float = 10.0
    pll_bw_narrow_hz: float = 15.0
    dll_bw_narrow_hz: float = 2.0
    pull_in_epochs: int = 100       # epochs in PULL_IN before WIDE_TRACK
    wide_epochs: int = 400          # epochs in WIDE_TRACK before NARROW_TRACK
    cn0_min_dbhz: float = 25.0
    carrier_lock_min: float = 0.5
    max_lock_fail: int = 100
    cn0_alpha: float = 0.05

    @property
    def prompt_index(self) -> int:
        return len(self.tap_offsets) // 2

    @property
    def samples_per_code(self) -> float:
        return self.fs * self.code_length_chips / self.code_rate_cps

    @property
    def code_to_carrier(self) -> float:
        return self.code_rate_cps / self.carrier_freq_hz


def default_config(spec, fs: float, chunk_ms: int, **kw) -> TrackingConfig:
    """Build a TrackingConfig from a SignalSpec."""
    spc = fs * spec.code_length_chips / spec.code_rate_cps
    n_max = int(spc) + 64
    code_period_ms = spec.code_length_chips / spec.code_rate_cps * 1e3
    n_steps = int(np.ceil(chunk_ms / code_period_ms)) + 2
    table_rate = 2 if spec.subcarrier_rate_hz > 0 else 1
    taps = (-0.15, -0.5, 0.0, 0.15, 0.5) if spec.subcarrier_rate_hz > 0 else (-0.5, 0.0, 0.5)
    if spec.subcarrier_rate_hz > 0:
        taps = (-0.6, -0.15, 0.0, 0.15, 0.6)  # VEML for BOC(1,1)
    return TrackingConfig(
        fs=fs, code_length_chips=spec.code_length_chips,
        code_rate_cps=spec.code_rate_cps, carrier_freq_hz=spec.carrier_freq_hz,
        chunk_len=int(fs * chunk_ms / 1000), n_steps=n_steps, n_max=n_max,
        tap_offsets=taps, table_rate=table_rate, **kw)


class TrackingState(NamedTuple):
    """Per-channel carry, all arrays shaped [C]."""

    active: jax.Array           # bool — channel assigned to a satellite
    state: jax.Array            # int32 — STANDBY/PULL_IN/WIDE/NARROW
    sample_offset: jax.Array    # int32 — next epoch start within current chunk
    rem_code_phase: jax.Array   # float32 — chips, [0, chips/sample)
    code_freq: jax.Array        # float32 — chips/s
    carrier_freq: jax.Array     # float32 — Hz (IF + Doppler)
    carr_phase_frac: jax.Array  # float32 — cycles in [0,1)
    carr_phase_cycles: jax.Array  # int32 — accumulated whole cycles
    dll: lf.Loop2State
    pll: lf.Loop3State
    prev_prompt: jax.Array      # float32 [C, 2] split-IQ (see ops/iq.py)
    cn0: cn0_ops.Cn0State
    epochs_in_state: jax.Array  # int32
    epoch_count: jax.Array      # int32 — total valid epochs since start_tracking
    lock_fail: jax.Array        # int32
    loss_of_lock: jax.Array     # bool — latched; host reacts


class TrackingOutput(NamedTuple):
    """Per-scan-step outputs, arrays shaped [n_steps, C]."""

    valid: jax.Array
    prompt: jax.Array           # float32 [n_steps, C, 2] prompt (split-IQ)
    correlators: jax.Array      # [n_steps, C, K, 2] float32 (all taps, I/Q)
    start_offset: jax.Array     # int32 epoch start sample within chunk
    n_samples: jax.Array        # int32 epoch length
    rem_code_phase: jax.Array   # float32 chips at epoch START
    code_freq: jax.Array        # float32 chips/s during epoch
    carrier_freq: jax.Array     # float32 Hz during epoch
    carr_phase_cycles: jax.Array  # int32 at epoch START
    carr_phase_frac: jax.Array  # float32 at epoch START
    cn0_dbhz: jax.Array
    carrier_lock: jax.Array
    state: jax.Array
    epoch_index: jax.Array      # int32 running epoch number (at epoch START)


def init_state(n_channels: int) -> TrackingState:
    """Host-side (numpy) state construction — the carry lives on host between
    chunks so the control plane can edit it without eager device ops (some
    backends only support jit execution, not eager primitive dispatch)."""
    c = n_channels
    z32 = np.zeros((c,), np.int32)
    zf = np.zeros((c,), np.float32)
    eps = np.full((c,), 1e-12, np.float32)
    return TrackingState(
        active=np.zeros((c,), bool),
        state=z32.copy(), sample_offset=z32.copy(), rem_code_phase=zf.copy(),
        code_freq=zf.copy(), carrier_freq=zf.copy(), carr_phase_frac=zf.copy(),
        carr_phase_cycles=z32.copy(),
        dll=lf.Loop2State(acc1=zf.copy()),
        pll=lf.Loop3State(acc1=zf.copy(), acc2=zf.copy()),
        prev_prompt=np.zeros((c, 2), np.float32),
        cn0=cn0_ops.Cn0State(zf.copy(), eps.copy(), zf.copy(), eps.copy()),
        epochs_in_state=z32.copy(), epoch_count=z32.copy(),
        lock_fail=z32.copy(),
        loss_of_lock=np.zeros((c,), bool),
    )


def _to_host(state: TrackingState) -> TrackingState:
    return jax.tree.map(np.asarray, state)


def start_channel(state: TrackingState, ch: int, *, code_freq: float,
                  doppler_hz: float, sample_offset: int,
                  rem_code_phase: float = 0.0,
                  if_freq_hz: float = 0.0) -> TrackingState:
    """Host-side acq->trk handoff for one channel (reference:
    TrackingInterface::start_tracking, dll_pll state 1 pull-in init).
    Pure numpy mutation of a host copy of the carry."""
    st = _to_host(state)
    st = jax.tree.map(np.array, st)  # writable copies
    st.active[ch] = True
    st.state[ch] = PULL_IN
    st.sample_offset[ch] = sample_offset
    st.rem_code_phase[ch] = rem_code_phase
    st.code_freq[ch] = code_freq
    st.carrier_freq[ch] = if_freq_hz + doppler_hz
    st.carr_phase_frac[ch] = 0.0
    st.carr_phase_cycles[ch] = 0
    st.dll.acc1[ch] = 0.0
    st.pll.acc1[ch] = if_freq_hz + doppler_hz
    st.pll.acc2[ch] = 0.0
    st.prev_prompt[ch, :] = 0.0
    st.cn0.ema_abs_i[ch] = 0.0
    st.cn0.ema_p2[ch] = 1e-12
    st.cn0.ema_i2_minus_q2[ch] = 0.0
    st.cn0.ema_i2_plus_q2[ch] = 1e-12
    st.epochs_in_state[ch] = 0
    st.epoch_count[ch] = 0
    st.lock_fail[ch] = 0
    st.loss_of_lock[ch] = False
    return st


def stop_channel(state: TrackingState, ch: int) -> TrackingState:
    st = jax.tree.map(np.array, _to_host(state))
    st.active[ch] = False
    st.state[ch] = STANDBY
    return st


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_chunk(cfg: TrackingConfig, chunk: jax.Array, state: TrackingState,
                code_tables: jax.Array) -> tuple[TrackingState, TrackingOutput]:
    """Advance all channels through one chunk of conditioned samples.

    Args:
      cfg: static tracking config.
      chunk: [chunk_len + n_max, 2] float32 split-IQ samples (chunk + halo
        from the next chunk); complex64 also accepted in-trace.
      state: carry from previous chunk.
      code_tables: [C, Lc*table_rate] float32 per-channel local code tables.

    Returns (new_state, outputs). ``new_state.sample_offset`` is already
    rebased for the next chunk (offset -= chunk_len).
    """
    chunk = iq.as_iq2(chunk)
    fs = jnp.float32(cfg.fs)
    code_len = jnp.float32(cfg.code_length_chips)
    taps = jnp.asarray(cfg.tap_offsets, jnp.float32)
    prompt_i = cfg.prompt_index
    chunk_len = cfg.chunk_len

    def step(st: TrackingState, _):
        cps = st.code_freq / fs
        safe_cps = jnp.maximum(cps, jnp.float32(1e-6))
        n_samp = jnp.ceil((code_len - st.rem_code_phase) / safe_cps).astype(jnp.int32)
        n_samp = jnp.clip(n_samp, 1, cfg.n_max)
        tracking = st.active & (st.state > STANDBY)
        valid = tracking & (st.sample_offset >= 0) & (st.sample_offset < chunk_len)

        safe_off = jnp.clip(st.sample_offset, 0, chunk_len)
        corr = correlator.batch_epoch_correlate(
            chunk, safe_off, jnp.where(valid, n_samp, 0), code_tables,
            st.rem_code_phase, cps, st.carr_phase_frac, st.carrier_freq / fs,
            taps, n_max=cfg.n_max, table_rate=cfg.table_rate)   # [C, K, 2]

        prompt2 = corr[:, prompt_i]                  # [C, 2] split-IQ
        prompt = iq.as_complex(prompt2)              # complex, in-jit only
        early = iq.as_complex(corr[:, prompt_i - 1])
        late = iq.as_complex(corr[:, prompt_i + 1])
        dt = n_samp.astype(jnp.float32) / fs

        # ---- discriminators ------------------------------------------------
        spacing = float(cfg.tap_offsets[prompt_i + 1] - cfg.tap_offsets[prompt_i])
        code_err = discriminators.dll_nc_emlp(early, late, spacing)   # chips
        phase_err = discriminators.pll_costas(prompt)                 # cycles
        prev_prompt = iq.as_complex(st.prev_prompt)
        freq_err = discriminators.fll_atan2(prev_prompt, prompt, dt)  # Hz
        # FLL only during pull-in, and only once a previous prompt exists
        has_prev = jnp.abs(prev_prompt) > 0
        fll_on = (st.state == PULL_IN) & has_prev
        freq_err = jnp.where(fll_on, freq_err, 0.0)

        # ---- loop filters (bandwidth scheduled by state) -------------------
        # PULL_IN: pure 1st-order FLL — converges the frequency without
        # poisoning the PLL integrators; the PLL carry is kept synced so the
        # handoff to WIDE_TRACK starts from (freq, rate=0).
        narrow = st.state == NARROW_TRACK
        pll_bw = jnp.where(narrow, cfg.pll_bw_narrow_hz, cfg.pll_bw_hz).astype(jnp.float32)
        dll_bw = jnp.where(narrow, cfg.dll_bw_narrow_hz, cfg.dll_bw_hz).astype(jnp.float32)
        in_pullin = st.state == PULL_IN
        fll_freq = st.carrier_freq + dt * jnp.float32(4.0 * cfg.fll_bw_hz) * freq_err
        new_pll, pll_freq = lf.pll3_update(st.pll, phase_err,
                                           jnp.zeros_like(freq_err), dt,
                                           pll_bw, jnp.float32(0.0))
        new_pll = lf.Loop3State(
            acc1=jnp.where(in_pullin, fll_freq, new_pll.acc1),
            acc2=jnp.where(in_pullin, 0.0, new_pll.acc2))
        new_dll, code_cmd = lf.dll2_update(st.dll, code_err, dt, dll_bw)

        new_carrier_freq = jnp.where(in_pullin, fll_freq, pll_freq)  # Hz (IF+doppler)
        doppler = new_carrier_freq - jnp.float32(cfg.if_freq_hz)
        aid = doppler * jnp.float32(cfg.code_to_carrier)
        new_code_freq = jnp.float32(cfg.code_rate_cps) + aid - code_cmd

        # ---- C/N0 and lock detectors ---------------------------------------
        new_cn0 = cn0_ops.cn0_update(st.cn0, prompt, valid, cfg.cn0_alpha)
        cn0_est = cn0_ops.cn0_dbhz(new_cn0, dt)
        lock_metric = cn0_ops.carrier_lock_metric(new_cn0)
        warmed = st.epoch_count > 50
        fail_now = warmed & (st.state >= WIDE_TRACK) & (
            (cn0_est < cfg.cn0_min_dbhz) | (lock_metric < cfg.carrier_lock_min))
        new_lock_fail = jnp.where(
            valid, jnp.where(fail_now, st.lock_fail + 1,
                             jnp.maximum(st.lock_fail - 1, 0)), st.lock_fail)
        loss = st.loss_of_lock | (new_lock_fail > cfg.max_lock_fail)

        # ---- state machine --------------------------------------------------
        eis = jnp.where(valid, st.epochs_in_state + 1, st.epochs_in_state)
        promote_wide = (st.state == PULL_IN) & (eis >= cfg.pull_in_epochs)
        promote_narrow = (st.state == WIDE_TRACK) & (eis >= cfg.wide_epochs)
        new_state_code = jnp.where(promote_wide, WIDE_TRACK,
                                   jnp.where(promote_narrow, NARROW_TRACK, st.state))
        eis = jnp.where(promote_wide | promote_narrow, 0, eis)

        # ---- NCO phase/offset advance ---------------------------------------
        delta_cycles = (st.carrier_freq / fs) * n_samp.astype(jnp.float32)
        tot = st.carr_phase_frac + delta_cycles
        whole = jnp.floor(tot)
        new_frac = tot - whole
        new_cycles = st.carr_phase_cycles + whole.astype(jnp.int32)
        new_rem = st.rem_code_phase + cps * n_samp.astype(jnp.float32) - code_len
        new_rem = jnp.clip(new_rem, 0.0, None)
        new_offset = st.sample_offset + n_samp

        sel = lambda new, old: jnp.where(valid, new, old)
        selt = lambda new, old: jax.tree.map(lambda a, b: jnp.where(valid, a, b), new, old)

        out = TrackingOutput(
            valid=valid,
            prompt=prompt2,
            correlators=corr,
            start_offset=st.sample_offset,
            n_samples=n_samp,
            rem_code_phase=st.rem_code_phase,
            code_freq=st.code_freq,
            carrier_freq=st.carrier_freq,
            carr_phase_cycles=st.carr_phase_cycles,
            carr_phase_frac=st.carr_phase_frac,
            cn0_dbhz=cn0_est,
            carrier_lock=lock_metric,
            state=st.state,
            epoch_index=st.epoch_count,
        )

        new_st = TrackingState(
            active=st.active,
            state=sel(new_state_code, st.state),
            sample_offset=sel(new_offset, st.sample_offset),
            rem_code_phase=sel(new_rem, st.rem_code_phase),
            code_freq=sel(new_code_freq, st.code_freq),
            carrier_freq=sel(new_carrier_freq, st.carrier_freq),
            carr_phase_frac=sel(new_frac, st.carr_phase_frac),
            carr_phase_cycles=sel(new_cycles, st.carr_phase_cycles),
            dll=selt(new_dll, st.dll),
            pll=selt(new_pll, st.pll),
            prev_prompt=jnp.where(valid[:, None], prompt2, st.prev_prompt),
            cn0=selt(new_cn0, st.cn0),
            epochs_in_state=sel(eis, st.epochs_in_state),
            epoch_count=sel(st.epoch_count + 1, st.epoch_count),
            lock_fail=sel(new_lock_fail, st.lock_fail),
            loss_of_lock=sel(loss, st.loss_of_lock),
        )
        return new_st, out

    final, outs = jax.lax.scan(step, state, None, length=cfg.n_steps)
    final = final._replace(
        sample_offset=jnp.where(final.active,
                                final.sample_offset - chunk_len,
                                final.sample_offset))
    return final, outs
