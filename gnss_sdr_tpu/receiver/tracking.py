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
from gnss_sdr_tpu.ops import kalman
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
    # dual-component tracking (reference track_pilot, dll_pll_conf.h): the
    # main taps run on component 0 of a [C, 2, Lt] code table (the pilot),
    # plus one extra prompt tap on component 1 (the data, for telemetry)
    track_pilot: bool = False
    # secondary-code wipe table width (NH20/CS20/CS25 fit in 32)
    sec_table_len: int = 32
    # Kalman-filter carrier tracking (reference gps_l1_ca_kf_tracking_cc):
    # replaces the PLL in WIDE/NARROW states with a batched 3-state
    # phase/Doppler/rate filter whose R adapts to the C/N0 estimate
    carrier_kf: bool = False
    # rational-stride code-replica plan (p, R, M, A): when set, the scan
    # consumes int8 stride tables (ops/correlator.build_stride_tables)
    # instead of chip tables, replacing the element-serial Mosaic gather
    # with contiguous dynamic slices (7.7x on v5e; see correlator.py).
    # None = legacy gather path.
    stride_plan: tuple | None = None
    kf_q_phase: float = 1e-6     # phase random walk, cycles^2/s
    kf_q_freq: float = 1.0       # frequency random walk, Hz^2/s
    kf_q_rate: float = 100.0     # Doppler-rate random walk, (Hz/s)^2/s

    @property
    def n_taps(self) -> int:
        """Total correlator taps (main + data prompt when track_pilot)."""
        return len(self.tap_offsets) + (1 if self.track_pilot else 0)

    @property
    def tap_components(self) -> tuple | None:
        if not self.track_pilot:
            return None
        return (0,) * len(self.tap_offsets) + (1,)

    @property
    def prompt_index(self) -> int:
        """Index of the tracked-component prompt tap."""
        return len(self.tap_offsets) // 2

    @property
    def data_prompt_index(self) -> int:
        """Index of the tap carrying the nav-data symbols."""
        return len(self.tap_offsets) if self.track_pilot else self.prompt_index

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
    kw.setdefault("stride_plan", correlator.stride_plan(
        fs, spec.code_rate_cps, table_rate, n_max,
        spec.code_length_chips))
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
    # extended coherent integration (reference extend_correlation_symbols,
    # dll_pll state 3): accumulate ext_n epochs coherently, update the loops
    # once per accumulation. ext_n=1 disables. Host sets ext after bit sync.
    ext_n: jax.Array            # int32 — epochs per coherent accumulation
    ext_anchor: jax.Array       # int32 — epoch_count of an accumulation start
    sec_len: jax.Array          # int32 — secondary-code length, 0 = none
    sec_anchor: jax.Array       # int32 — epoch_count of a secondary-seq start
    acc_corr: jax.Array         # float32 [C, K, 2] coherent accumulator
    acc_dt: jax.Array           # float32 [C] accumulated integration time
    acc_cnt: jax.Array          # int32 [C] epochs in the accumulator
    # Kalman carrier-tracking states (used when cfg.carrier_kf)
    kf_p: jax.Array             # float32 [C, 3, 3] covariance
    kf_acc: jax.Array           # float32 [C] Doppler rate estimate (Hz/s)
    # per-channel intermediate frequency (GLONASS FDMA slots differ per SV;
    # doppler = carrier_freq - if_freq must use the channel's own IF)
    if_freq: jax.Array          # float32 [C] Hz


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


@jax.jit
def pack_host_outputs(out: TrackingOutput, loss_of_lock: jax.Array):
    """Pack EVERY host-consumed output field into one dense float32 cube.

    The axon tunnel charges a fixed RPC latency per fetched array (~tens
    of ms), which dominated the steady-state chunk loop; packing the ~12
    per-epoch leaves + the int32 fields (bitcast to float32, recovered
    with ``.view(np.int32)`` on host) + the [C] loss flags (broadcast
    along the epoch axis) into ONE [S, C, 13] array makes the per-chunk
    download a single RPC (see unpack_host_outputs).
    """
    i32f = jax.lax.bitcast_convert_type(
        jnp.stack([out.epoch_index, out.start_offset,
                   out.carr_phase_cycles], axis=-1), jnp.float32)
    lol = jnp.broadcast_to(loss_of_lock.astype(jnp.float32)[None, :, None],
                           out.prompt.shape[:2] + (1,))
    return jnp.concatenate([
        jnp.stack([
            out.prompt[..., 0], out.prompt[..., 1],
            out.rem_code_phase, out.code_freq, out.carrier_freq,
            out.carr_phase_frac, out.cn0_dbhz, out.carrier_lock,
            out.valid.astype(jnp.float32)], axis=-1),
        i32f, lol], axis=-1)


def unpack_host_outputs(packed: np.ndarray):
    """Host-side inverse of :func:`pack_host_outputs` -> (f32p, i32p, lol)
    in the legacy triple layout ([S,C,9] float32, [S,C,3] int32, [C] bool)
    shared with the TCP-connector engine."""
    packed = np.asarray(packed)
    f32p = packed[..., :9]
    i32p = np.ascontiguousarray(packed[..., 9:12]).view(np.int32)
    lol = packed[0, :, 12] > 0.5 if len(packed) else \
        np.zeros(packed.shape[1], bool)
    return f32p, i32p, lol


def init_state(n_channels: int, n_taps: int = 3) -> TrackingState:
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
        ext_n=np.ones((c,), np.int32),
        ext_anchor=z32.copy(),
        sec_len=z32.copy(),
        sec_anchor=z32.copy(),
        acc_corr=np.zeros((c, n_taps, 2), np.float32),
        acc_dt=zf.copy(),
        acc_cnt=z32.copy(),
        kf_p=kalman.kf_init_cov(c),
        kf_acc=zf.copy(),
        if_freq=zf.copy(),
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
    st.if_freq[ch] = if_freq_hz
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
    st.ext_n[ch] = 1
    st.ext_anchor[ch] = 0
    st.sec_len[ch] = 0
    st.sec_anchor[ch] = 0
    st.acc_corr[ch] = 0.0
    st.acc_dt[ch] = 0.0
    st.acc_cnt[ch] = 0
    st.kf_p[ch] = kalman.kf_init_cov(1)[0]
    st.kf_acc[ch] = 0.0
    return st


def set_extension(state: TrackingState, ch: int, ext_n: int,
                  anchor_epoch: int) -> TrackingState:
    """Enable ext_n-epoch coherent integration for one channel; accumulation
    windows cover epochs [anchor + k*ext_n, anchor + (k+1)*ext_n)
    (reference: extended-integration handoff after bit sync,
    dll_pll_veml_tracking.cc state 3). Host-side numpy mutation."""
    st = jax.tree.map(np.array, _to_host(state))
    st.ext_n[ch] = max(1, int(ext_n))
    st.ext_anchor[ch] = int(anchor_epoch)
    st.acc_corr[ch] = 0.0
    st.acc_dt[ch] = 0.0
    st.acc_cnt[ch] = 0
    # re-initialize the loop filters at the mode switch (reference:
    # d_carrier_loop_filter.initialize() on the extended handoff): the rate
    # integrator accumulated with the wide per-epoch gains is stale noise at
    # the new update interval, and the Costas discriminator cannot recover
    # from the frequency ramp it would cause (saturates at +-90 deg)
    st.pll.acc1[ch] = st.carrier_freq[ch]
    st.pll.acc2[ch] = 0.0
    st.dll.acc1[ch] = 0.0
    return st


def set_secondary(state: TrackingState, sec_tables: np.ndarray, ch: int,
                  chips, anchor_epoch: int) -> TrackingState:
    """Configure secondary-code wipeoff for one channel: ``chips`` (0/1 or
    +-1) repeats with period len(chips), aligned so chip 0 multiplies epochs
    where (epoch - anchor) % len == 0. Mutates sec_tables[ch] in place."""
    st = jax.tree.map(np.array, _to_host(state))
    chips = np.asarray(chips, np.float32)
    if chips.min() >= 0.0:
        chips = 1.0 - 2.0 * chips          # 0/1 -> +1/-1 chip convention
    sec_tables[ch, :] = 1.0
    sec_tables[ch, : len(chips)] = chips
    st.sec_len[ch] = len(chips)
    st.sec_anchor[ch] = int(anchor_epoch)
    return st


def stop_channel(state: TrackingState, ch: int) -> TrackingState:
    st = jax.tree.map(np.array, _to_host(state))
    st.active[ch] = False
    st.state[ch] = STANDBY
    return st


@functools.partial(jax.jit, static_argnames=("cfg", "slab"))
def track_chunk_packed(cfg: TrackingConfig, chunk: jax.Array,
                       state: TrackingState, code_tables: jax.Array,
                       sec_tables: jax.Array | None = None,
                       slab: int | None = None):
    """One device program = one tunnel execute RPC: slice the shared
    uploaded chunk to this group's slab, run the tracking scan and pack
    the host outputs, all inside a single jit. The eager slice + separate
    pack call each cost a full RPC round trip over the axon tunnel
    (~25 ms), which dominated the steady-state CLI chunk loop."""
    if slab is not None:
        chunk = chunk[:slab]
    new_state, out = track_chunk(cfg, chunk, state, code_tables, sec_tables)
    return new_state, pack_host_outputs(out, new_state.loss_of_lock)


@functools.partial(jax.jit, static_argnames=("cfgs", "slabs"))
def track_multi_packed(cfgs: tuple, chunk: jax.Array, states: tuple,
                       code_tables: tuple, sec_tables: tuple,
                       slabs: tuple):
    """Every signal group's tracking scan fused into ONE device program,
    with all packed host outputs flattened into ONE float32 vector.

    Per-group execute + fetch RPCs serialize on the axon tunnel (a
    GPS+Galileo 8+8 hybrid measured 1.85x the slowest single group,
    BENCH_DETAIL hybrid_serialization), while each group's device compute
    is sub-millisecond — so the hybrid receiver pays tunnel latency, not
    FLOPs. Fusing the groups makes the whole constellation set cost the
    same RPC count as one group (reference analog: concurrent per-channel
    thread scheduling, gnss_flowgraph.cc:176-181). The host splits the
    flat vector by the statically-known per-group [S, C, 13] sizes
    (see unpack_host_outputs).
    """
    new_states, flats = [], []
    for cfg, st, tab, sec, slab in zip(cfgs, states, code_tables,
                                       sec_tables, slabs):
        c = chunk if slab is None else chunk[:slab]
        ns, out = track_chunk(cfg, c, st, tab, sec)
        new_states.append(ns)
        flats.append(pack_host_outputs(out, ns.loss_of_lock).reshape(-1))
    return tuple(new_states), jnp.concatenate(flats)


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_chunk(cfg: TrackingConfig, chunk: jax.Array, state: TrackingState,
                code_tables: jax.Array,
                sec_tables: jax.Array | None = None
                ) -> tuple[TrackingState, TrackingOutput]:
    """Advance all channels through one chunk of conditioned samples.

    Args:
      cfg: static tracking config.
      chunk: [chunk_len + n_max, 2] float32 split-IQ samples (chunk + halo
        from the next chunk); complex64 also accepted in-trace.
      state: carry from previous chunk.
      code_tables: [C, Lc*table_rate] float32 per-channel local code tables
        ([C, 2, Lc*table_rate] when cfg.track_pilot: [pilot, data]).
      sec_tables: [C, S] float32 +-1 secondary-code chips (see
        :func:`set_secondary`); None = no wipeoff anywhere.

    Returns (new_state, outputs). ``new_state.sample_offset`` is already
    rebased for the next chunk (offset -= chunk_len). Loop filters update
    once per ``ext_n``-epoch coherent accumulation (ext_n=1: every epoch).
    """
    chunk = iq.as_iq2(chunk)
    fs = jnp.float32(cfg.fs)
    code_len = jnp.float32(cfg.code_length_chips)
    prompt_i = cfg.prompt_index
    chunk_len = cfg.chunk_len
    n_ch = code_tables.shape[0]
    if cfg.track_pilot:
        tap_off = tuple(cfg.tap_offsets) + (0.0,)
    else:
        tap_off = tuple(cfg.tap_offsets)
    taps = jnp.asarray(tap_off, jnp.float32)

    def step(st: TrackingState, _):
        cps = st.code_freq / fs
        safe_cps = jnp.maximum(cps, jnp.float32(1e-6))
        n_samp = jnp.ceil((code_len - st.rem_code_phase) / safe_cps).astype(jnp.int32)
        n_samp = jnp.clip(n_samp, 1, cfg.n_max)
        tracking = st.active & (st.state > STANDBY)
        valid = tracking & (st.sample_offset >= 0) & (st.sample_offset < chunk_len)

        safe_off = jnp.clip(st.sample_offset, 0, chunk_len)
        # stride path engages only when the caller actually passed stride
        # tables (trailing shape (p, A)); plain [.., Lc] tables keep the
        # legacy gather path, so direct track_chunk users are unaffected
        plan = cfg.stride_plan
        use_stride = (plan is not None
                      and code_tables.shape[-2:] == (plan[0], plan[3]))
        if use_stride:
            # code_tables here are the int8 [C(,G), p, A] stride tables
            corr = correlator.batch_epoch_correlate_stride(
                chunk, safe_off, jnp.where(valid, n_samp, 0), code_tables,
                st.rem_code_phase, cps, st.carr_phase_frac,
                st.carrier_freq / fs, taps, n_max=cfg.n_max,
                table_rate=cfg.table_rate, plan=plan,
                tap_components=cfg.tap_components)   # [C, K, 2]
        else:
            corr = correlator.batch_epoch_correlate(
                chunk, safe_off, jnp.where(valid, n_samp, 0), code_tables,
                st.rem_code_phase, cps, st.carr_phase_frac,
                st.carrier_freq / fs, taps, n_max=cfg.n_max,
                table_rate=cfg.table_rate,
                tap_components=cfg.tap_components)   # [C, K, 2]

        dt = n_samp.astype(jnp.float32) / fs
        eidx = st.epoch_count

        # ---- secondary-code wipe + coherent accumulation -------------------
        if sec_tables is None:
            chip = jnp.ones((n_ch,), jnp.float32)
        else:
            sidx = jnp.mod(eidx - st.sec_anchor,
                           jnp.maximum(st.sec_len, 1))
            chip = jnp.where(st.sec_len > 0,
                             sec_tables[jnp.arange(n_ch), sidx], 1.0)
        corr_w = corr * chip[:, None, None]
        vsel = valid[:, None, None].astype(jnp.float32)
        acc = st.acc_corr + corr_w * vsel
        acc_dt = st.acc_dt + jnp.where(valid, dt, 0.0)
        acc_cnt = st.acc_cnt + valid.astype(jnp.int32)
        # loop update fires on the last epoch of each accumulation window
        rel = jnp.mod(eidx - st.ext_anchor, jnp.maximum(st.ext_n, 1))
        boundary = valid & (rel == st.ext_n - 1)
        dt_eff = acc_dt

        prompt2 = acc[:, prompt_i]                   # [C, 2] accumulated
        prompt = iq.as_complex(prompt2)              # complex, in-jit only
        early = iq.as_complex(acc[:, prompt_i - 1])
        late = iq.as_complex(acc[:, prompt_i + 1])

        # ---- discriminators ------------------------------------------------
        spacing = float(cfg.tap_offsets[prompt_i + 1] - cfg.tap_offsets[prompt_i])
        code_err = discriminators.dll_nc_emlp(early, late, spacing)   # chips
        phase_err = discriminators.pll_costas(prompt)                 # cycles
        prev_prompt = iq.as_complex(st.prev_prompt)
        freq_err = discriminators.fll_atan2(prev_prompt, prompt, dt_eff)  # Hz
        # FLL only during pull-in, and only once a previous prompt exists
        has_prev = jnp.abs(prev_prompt) > 0
        fll_on = (st.state == PULL_IN) & has_prev
        freq_err = jnp.where(fll_on, freq_err, 0.0)

        # ---- loop filters (bandwidth scheduled by state) -------------------
        # PULL_IN: pure 1st-order FLL — converges the frequency without
        # poisoning the PLL integrators; the PLL carry is kept synced so the
        # handoff to WIDE_TRACK starts from (freq, rate=0).
        # Extended integration implies the narrow bandwidths (reference:
        # extended mode runs the *_bw_narrow_hz loop set) — the update
        # interval grows by ext_n, so the wide B*T would go unstable.
        narrow = (st.state == NARROW_TRACK) | (st.ext_n > 1)
        pll_bw = jnp.where(narrow, cfg.pll_bw_narrow_hz, cfg.pll_bw_hz).astype(jnp.float32)
        dll_bw = jnp.where(narrow, cfg.dll_bw_narrow_hz, cfg.dll_bw_hz).astype(jnp.float32)
        in_pullin = st.state == PULL_IN
        fll_freq = st.carrier_freq + dt_eff * jnp.float32(4.0 * cfg.fll_bw_hz) * freq_err
        new_pll, pll_freq = lf.pll3_update(st.pll, phase_err,
                                           jnp.zeros_like(freq_err), dt_eff,
                                           pll_bw, jnp.float32(0.0))
        new_pll = lf.Loop3State(
            acc1=jnp.where(in_pullin, fll_freq, new_pll.acc1),
            acc2=jnp.where(in_pullin, 0.0, new_pll.acc2))
        new_dll, code_cmd = lf.dll2_update(st.dll, code_err, dt_eff, dll_bw)

        new_carrier_freq = jnp.where(in_pullin, fll_freq, pll_freq)  # Hz (IF+doppler)

        # ---- C/N0 and lock detectors ---------------------------------------
        new_cn0 = cn0_ops.cn0_update(st.cn0, prompt, boundary, cfg.cn0_alpha)
        # moments hold full-window prompts; report with the full coherent
        # time even on mid-window rows (acc_dt there is a partial sum)
        dt_cn0 = st.ext_n.astype(jnp.float32) * dt
        cn0_est = cn0_ops.cn0_dbhz(new_cn0, dt_cn0)

        # ---- Kalman carrier tracking (optional) ------------------------------
        kf_on = jnp.zeros_like(boundary)
        new_kf_p, new_kf_acc = st.kf_p, st.kf_acc
        kf_dphi = jnp.zeros_like(phase_err)
        if cfg.carrier_kf:
            r = kalman.phase_meas_var_cyc2(cn0_est, jnp.maximum(dt_eff, 1e-4))
            p_n, f_kf, a_kf, dphi = kalman.kf_update(
                st.kf_p, st.kf_acc, st.carrier_freq, phase_err, dt_eff, r,
                q_phase=cfg.kf_q_phase, q_freq=cfg.kf_q_freq,
                q_rate=cfg.kf_q_rate)
            kf_on = boundary & (st.state >= WIDE_TRACK)
            new_carrier_freq = jnp.where(kf_on & ~in_pullin, f_kf,
                                         new_carrier_freq)
            kf_dphi = jnp.where(kf_on, dphi, 0.0)
            new_kf_p = jnp.where(kf_on[:, None, None], p_n, st.kf_p)
            new_kf_acc = jnp.where(kf_on, a_kf, st.kf_acc)
            # keep the PLL carry synced so a fallback starts cleanly
            new_pll = lf.Loop3State(
                acc1=jnp.where(kf_on, new_carrier_freq, new_pll.acc1),
                acc2=jnp.where(kf_on, 0.0, new_pll.acc2))

        doppler = new_carrier_freq - st.if_freq
        aid = doppler * jnp.float32(cfg.code_to_carrier)
        new_code_freq = jnp.float32(cfg.code_rate_cps) + aid - code_cmd
        lock_metric = cn0_ops.carrier_lock_metric(new_cn0)
        warmed = st.epoch_count > 50
        fail_now = warmed & (st.state >= WIDE_TRACK) & (
            (cn0_est < cfg.cn0_min_dbhz) | (lock_metric < cfg.carrier_lock_min))
        new_lock_fail = jnp.where(
            boundary, jnp.where(fail_now, st.lock_fail + 1,
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
        # KF phase-error transfer: jump the NCO phase by the estimated error
        tot = st.carr_phase_frac + delta_cycles + kf_dphi
        whole = jnp.floor(tot)
        new_frac = tot - whole
        new_cycles = st.carr_phase_cycles + whole.astype(jnp.int32)
        new_rem = st.rem_code_phase + cps * n_samp.astype(jnp.float32) - code_len
        new_rem = jnp.clip(new_rem, 0.0, None)
        new_offset = st.sample_offset + n_samp

        sel = lambda new, old: jnp.where(valid, new, old)
        bsel = lambda new, old: jnp.where(boundary, new, old)
        bselt = lambda new, old: jax.tree.map(
            lambda a, b: jnp.where(boundary, a, b), new, old)

        out = TrackingOutput(
            valid=valid,
            prompt=corr[:, cfg.data_prompt_index],   # raw per-epoch data tap
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

        zero_acc = jnp.zeros_like(acc)
        new_st = TrackingState(
            active=st.active,
            state=sel(new_state_code, st.state),
            sample_offset=sel(new_offset, st.sample_offset),
            rem_code_phase=sel(new_rem, st.rem_code_phase),
            code_freq=bsel(new_code_freq, st.code_freq),
            carrier_freq=bsel(new_carrier_freq, st.carrier_freq),
            carr_phase_frac=sel(new_frac, st.carr_phase_frac),
            carr_phase_cycles=sel(new_cycles, st.carr_phase_cycles),
            dll=bselt(new_dll, st.dll),
            pll=bselt(new_pll, st.pll),
            prev_prompt=jnp.where(boundary[:, None], prompt2, st.prev_prompt),
            cn0=bselt(new_cn0, st.cn0),
            epochs_in_state=sel(eis, st.epochs_in_state),
            epoch_count=sel(st.epoch_count + 1, st.epoch_count),
            lock_fail=bsel(new_lock_fail, st.lock_fail),
            loss_of_lock=bsel(loss, st.loss_of_lock),
            ext_n=st.ext_n, ext_anchor=st.ext_anchor,
            sec_len=st.sec_len, sec_anchor=st.sec_anchor,
            acc_corr=jnp.where(boundary[:, None, None], zero_acc, acc),
            acc_dt=jnp.where(boundary, 0.0, acc_dt),
            acc_cnt=jnp.where(boundary, 0, acc_cnt),
            kf_p=new_kf_p,
            kf_acc=new_kf_acc,
            if_freq=st.if_freq,
        )
        return new_st, out

    final, outs = jax.lax.scan(step, state, None, length=cfg.n_steps)
    final = final._replace(
        sample_offset=jnp.where(final.active,
                                final.sample_offset - chunk_len,
                                final.sample_offset))
    return final, outs


def prepare_code_tables(cfg: TrackingConfig, code_tables: np.ndarray):
    """Device-ready code tables for track_chunk: the int8 stride tables
    when cfg.stride_plan is active (ops/correlator.build_stride_tables),
    the plain chip tables otherwise. Callers upload the result once per
    table revision (code tables change only on channel (re)assignment)."""
    if cfg.stride_plan is None:
        return np.asarray(code_tables)
    return correlator.build_stride_tables(np.asarray(code_tables),
                                          cfg.stride_plan)
