"""Top-level receiver: the chunked block-pipeline + channel manager.

This is the TPU-native replacement for the reference's control plane + GNU
Radio flowgraph (``GNSSFlowgraph`` in ``src/core/receiver/gnss_flowgraph.cc``
and ``ControlThread``): instead of one thread per block with ring buffers, the
receiver advances chunk by chunk; per chunk it runs
   1. batched PCPS acquisition for idle channels  (one jit call per signal)
   2. the tracking scan for all channels          (one jit call per signal)
   3. host-side telemetry decoding / observables / PVT
The channel manager mirrors the reference's state machine (idle -> acquiring ->
tracking, reacquire on loss; gnss_flowgraph.cc:1203-1366).

Multi-constellation: channels are organized in **signal groups** (one per
signal family, e.g. GPS L1 C/A + Galileo E1b — the reference's
``Channels_1C.count=8`` / ``Channels_1B.count=8`` hybrid configs,
conf/gnss-sdr_multisource_Hybrid_*.conf). Each group runs its own tracking
scan and acquisition batch on the shared conditioned stream; observables and
PVT merge all groups, with per-system receiver clocks in the solver.
"""

from __future__ import annotations

import dataclasses
import logging
import pathlib
import time

import jax
import numpy as np

from gnss_sdr_tpu import constants
from gnss_sdr_tpu.models import codes
from gnss_sdr_tpu.ops import acquisition as acq_ops
from gnss_sdr_tpu.ops import iq
from gnss_sdr_tpu.receiver import tracking as trk
from gnss_sdr_tpu.receiver.observables import ChannelObservable, EpochRecord, ObservablesEngine
from gnss_sdr_tpu.receiver.pvt import geodesy as _geodesy_mod
from gnss_sdr_tpu.receiver.pvt import solver as pvt_solver
from gnss_sdr_tpu.receiver.telemetry import make_telemetry

log = logging.getLogger("gnss_sdr_tpu")


@dataclasses.dataclass
class ReceiverConfig:
    signal: str = "1C"
    fs: float = 2.046e6                # internal (conditioned) sample rate
    if_freq_hz: float = 0.0
    n_channels: int = 8
    prns: tuple = tuple(range(1, 33))  # satellite pool (primary signal)
    # multi-signal plan: tuple of (signal, n_channels) or
    # (signal, n_channels, prns); empty = single group from the fields above
    signal_plan: tuple = ()
    # per-group parameter overrides: tuple of (signal, ((field, value), ...))
    # applied over this config when building that signal's group (reference:
    # each Acquisition_<sig>/Tracking_<sig> section configures its own
    # adapters; without this only the first group's sections would count)
    group_params: tuple = ()
    chunk_ms: int = 100
    # quantize the sample stream to int8 for upload (ops/iq.quantize8):
    # 4x less host->device traffic, which is the streaming bottleneck on
    # remote-accelerator tunnels (~50 MB/s measured). Lossless in practice
    # for noise-dominated GNSS baseband; False = float32 split-IQ.
    upload_int8: bool = True
    # sample-upload word size: 8 = int8 split-IQ (2 B/sample, default),
    # 4 = packed-nibble uint8 (1 B/sample, <0.05 dB CN0 cost — the fast
    # streaming configuration; see ops/iq.quantize4), 32 = float32.
    # 0 derives from upload_int8 for backward compatibility.
    upload_bits: int = 0
    # streaming throughput: fuse up to this many chunks into ONE device
    # dispatch (one upload + one execute + one download RPC over the
    # accelerator tunnel instead of one set per chunk). The host control
    # cadence coarsens to K*chunk_ms while any acquisition work is pending
    # the loop drops back to single chunks so TTFF/reacquisition latency
    # stays at chunk_ms granularity. 1 = off (reference analog: GNU Radio
    # buffer depth; here it amortizes the per-RPC tunnel latency that
    # bounds real-time rate, see BENCH streaming_x)
    dispatch_chunks: int = 1
    # deferred-consume pipeline depth in the fused steady state: up to
    # depth-1 dispatched quanta stay in flight before the oldest is
    # consumed. Depth 2 = classic double buffering; 3-4 give each
    # background fetch several host iterations to land, which hides the
    # tunnel's contended completion-poll latency (measured ~135 ms when
    # upload/dispatch RPCs share the link vs 72 ms quiet). Measured on
    # the v5-lite tunnel: depth 4 is the knee (8.5-9.7x realtime at
    # K=8); depth >= 5 floods the tunnel with concurrent poll RPCs and
    # stalls — don't raise it. Host-visible effects (telemetry,
    # observables, loss-of-lock) lag depth-1 quanta.
    pipeline_depth: int = 4
    # acquisition
    acq_doppler_max_hz: float = 5000.0
    acq_doppler_step_hz: float = 250.0
    acq_threshold_cfar: float = 2.0
    acq_noncoherent: int = 2
    acq_bit_transition: bool = False   # doubled-FFT transition-tolerant mode
    acq_two_step: bool = True          # fine-Doppler refinement after a hit
    acq_doppler_step2_hz: float = 25.0
    max_in_acquisition: int = 33       # batch width (all by default)
    # assisted acquisition (reference pcps_assisted_acquisition / warm start):
    # with an ephemeris and a position estimate, search a narrow Doppler
    # window around the predicted value instead of the full grid
    acq_assisted: bool = True
    acq_assisted_doppler_max_hz: float = 600.0
    # acquisition variant (registry implementation= selected): "pcps" is the
    # default engine; "e1_8ms" = Galileo_E1_PCPS_8ms_Ambiguous_Acquisition
    # (two-period coherent correlation against a +/- sign-hypothesis replica
    # pair); "e5a_caf" = Galileo_E5a_Noncoherent_IQ_Acquisition_CAF
    # (separate data/pilot correlation, noncoherent combining, triangular
    # CAF Doppler smoothing)
    acq_variant: str = "pcps"
    # CAF filter width (reference Acquisition_5X.CAF_window_hz; 0 = off)
    acq_caf_window_hz: float = 0.0
    # combine E5a-I and E5a-Q noncoherently (both_signal_components)
    acq_both_components: bool = True
    # tracking
    pll_bw_hz: float = 40.0
    dll_bw_hz: float = 4.0
    fll_bw_hz: float = 10.0
    pll_bw_narrow_hz: float = 15.0
    dll_bw_narrow_hz: float = 2.0
    # coherent integration extension after bit sync, in nav symbols
    # (reference Tracking_XX.extend_correlation_symbols); 1 = off
    extend_symbols: int = 1
    # track the pilot component where the signal has one (reference
    # Tracking_XX.track_pilot): E1 -> E1C, E5a -> E5a-Q, L5 -> L5Q
    track_pilot: bool = False
    # Kalman carrier tracking (reference GPS_L1_CA_KF_Tracking implementation)
    carrier_kf: bool = False
    # TCP-connector tracking (reference GPS_L1_CA_TCP_CONNECTOR_Tracking /
    # Galileo_E1_TCP_CONNECTOR_Tracking): loop filters run in an external
    # process reached over TCP at port_ch0 + channel (0 = ephemeral ports)
    tcp_connector: bool = False
    tcp_port_ch0: int = 2060
    # GLONASS FDMA: orbital slot (PRN) -> frequency channel k; the published
    # almanac assignment (reference gets k from GNAV almanac / config)
    glonass_freq_slots: tuple = (
        1, -4, 5, 6, 1, -4, 5, 6, -2, -7, 0, -1,
        -2, -7, 0, -1, 4, -3, 3, 2, 4, -3, 3, 2)
    # observables / pvt
    obs_interval_ms: float = 20.0
    # Hatch-filter carrier smoothing window M (reference
    # Observables.enable_carrier_smoothing + smoothing_factor); <=1 = off
    carrier_smoothing_factor: int = 0
    pvt_output_rate_ms: float = 100.0
    pvt_apply_tropo: bool = True
    pvt_apply_iono: bool = True
    # False for the per-source sub-receivers of a MultiSourceReceiver: the
    # branch still forms observables (and harvests nav data into the SHARED
    # ephemeris store) but the merged cross-source PVT runs upstream
    pvt_enabled: bool = True
    # apply SBAS fast corrections (PR + PRC) from tracked SBAS channels
    pvt_apply_sbas: bool = True
    # periodic status log: every N seconds of stream time log the fix +
    # tracked channels (reference: channel_status_msg_receiver collecting
    # per-channel status for the monitors); 0 = off
    status_period_s: float = 0.0
    # tracing dumps (reference: per-block dump=true -> .dat/.mat)
    dump_dir: str | None = None
    dump_mat: bool = False             # also write MATLAB .mat (save_matfile)
    # multi-device execution: shard the channel axis (tracking state, code
    # tables) and the acquisition signal axis over an n-device jax mesh
    # (SURVEY §2.4: the reference's N channel threads -> channel-axis data
    # parallelism over ICI). None = single-device.
    n_mesh_devices: int | None = None


class Channel:
    """Host-side per-channel bookkeeping (FSM mirror of reference Channel).

    Epoch records are stored columnar (one numpy array per field) rather
    than as a list of EpochRecord objects: a fused K-chunk consume pushes
    K*chunk_ms epochs per channel, and materializing thousands of Python
    objects per quantum was a measured streaming-loop cost. EpochRecords
    are built on demand (a few per observables tick)."""

    _REC_FIELDS = ("start", "eidx", "rem", "codef", "carrf",
                   "cyc", "frac", "cn0")

    def __init__(self, ch_id: int, global_id: int):
        self.ch_id = ch_id              # index within its signal group
        self.global_id = global_id      # receiver-wide index (telecommands)
        self.prn: int | None = None
        self.state = "idle"             # idle | tracking
        self.telemetry = None
        self._rec: dict | None = None   # columnar epoch history

    def clear_records(self) -> None:
        self._rec = None

    def push_record_block(self, start, eidx, rem, codef, carrf,
                          cyc, frac, cn0) -> None:
        """Append one consumed chunk's epochs, keeping a single row of
        history for ticks that land before the new block."""
        new = dict(start=np.asarray(start, np.int64),
                   eidx=np.asarray(eidx, np.int64),
                   rem=np.asarray(rem, np.float64),
                   codef=np.asarray(codef, np.float64),
                   carrf=np.asarray(carrf, np.float64),
                   cyc=np.asarray(cyc, np.int64),
                   frac=np.asarray(frac, np.float64),
                   cn0=np.asarray(cn0, np.float32))
        old = self._rec
        if old is not None and len(old["start"]):
            new = {k: np.concatenate([old[k][-1:], new[k]])
                   for k in self._REC_FIELDS}
        self._rec = new

    def _materialize(self, i: int) -> EpochRecord:
        r = self._rec
        return EpochRecord(
            abs_start_sample=int(r["start"][i]), epoch_index=int(r["eidx"][i]),
            rem_code_phase=float(r["rem"][i]), code_freq=float(r["codef"][i]),
            carrier_freq=float(r["carrf"][i]),
            carr_phase_cycles=int(r["cyc"][i]),
            carr_phase_frac=float(r["frac"][i]),
            cn0_dbhz=float(r["cn0"][i]))

    @property
    def records(self) -> list:
        """Materialized record list (tests/status paths, not the hot loop)."""
        if self._rec is None:
            return []
        return [self._materialize(i) for i in range(len(self._rec["start"]))]

    def latest_record_before(self, sample: int) -> EpochRecord | None:
        r = self._rec
        if r is None or not len(r["start"]):
            return None
        i = int(np.searchsorted(r["start"], sample, side="right")) - 1
        if i < 0:
            return None
        return self._materialize(i)

    def last_record(self) -> EpochRecord | None:
        r = self._rec
        if r is None or not len(r["start"]):
            return None
        return self._materialize(len(r["start"]) - 1)


class SignalGroup:
    """Per-signal-family receiver state: tracking scan carry, code tables,
    acquisition pool (reference: one GetChannel_* family per signal)."""

    def __init__(self, cfg: ReceiverConfig, signal: str, n_channels: int,
                 prns: tuple, global_id0: int, c_pad: int | None = None):
        self.signal = signal
        self.rx_cfg = cfg
        self.spec = constants.SIGNALS[signal]
        # commensurate sampling trap: when fs is an exact integer multiple
        # of the chip rate, the ZOH code replica's correlation peak grows a
        # flat top one sample wide — a DLL dead zone with static per-channel
        # pseudorange biases of up to c/(2*fs) (tens of meters at 2 Msps)
        spc = cfg.fs / self.spec.code_rate_cps
        if abs(spc - round(spc)) < 1e-6 * max(spc, 1.0):
            log.warning(
                "fs=%.0f Hz is an integer multiple of the %s chip rate "
                "(%.0f samples/chip): expect a DLL dead zone with static "
                "pseudorange biases; prefer an incommensurate rate "
                "(e.g. the reference confs use 2.0 MHz for L1 C/A)",
                cfg.fs, signal, spc)
        # padded channel-array width: a multiple of the mesh size so the
        # channel axis shards evenly; pad rows stay inactive in the scan
        self.c_pad = c_pad if c_pad is not None else n_channels
        track_pilot = cfg.track_pilot and codes.has_pilot(signal)
        self.trk_cfg = trk.default_config(
            self.spec, cfg.fs, cfg.chunk_ms,
            if_freq_hz=cfg.if_freq_hz,
            pll_bw_hz=cfg.pll_bw_hz, dll_bw_hz=cfg.dll_bw_hz,
            fll_bw_hz=cfg.fll_bw_hz,
            pll_bw_narrow_hz=cfg.pll_bw_narrow_hz,
            dll_bw_narrow_hz=cfg.dll_bw_narrow_hz,
            track_pilot=track_pilot,
            carrier_kf=cfg.carrier_kf)
        self.channels = [Channel(i, global_id0 + i) for i in range(n_channels)]
        self.trk_state = trk.init_state(self.c_pad, self.trk_cfg.n_taps)
        table_len = self.spec.code_length_chips * self.trk_cfg.table_rate
        shape = ((self.c_pad, 2, table_len) if track_pilot
                 else (self.c_pad, table_len))
        self.code_tables = np.zeros(shape, np.float32)
        self.sec_tables = np.ones(
            (self.c_pad, self.trk_cfg.sec_table_len), np.float32)
        self.extend_symbols = max(1, int(cfg.extend_symbols))
        self.spc = int(round(cfg.fs * self.spec.code_period_s))
        self._trk_cfg_k: dict[int, object] = {}
        # secondary-code overlays (NH/CS) flip the symbol sign at EVERY code
        # boundary, splitting the plain PCPS peak to +-1/(2*T_code) Doppler
        # sidebands (observed: a 500 Hz-off handoff false-locking the
        # Costas/FLL at exactly half a cycle per epoch, amplitude 2/pi);
        # the doubled-FFT transition-tolerant mode is therefore the default
        # for these signals (reference bit_transition_flag)
        # ... and so do data symbols on signals whose bit period equals the
        # code period (L2 CM: one 50 sps CNAV symbol per 20 ms code; E1-B:
        # one 250 sps I/NAV symbol per 4 ms code). E1 is NOT exempt: with
        # the plain mode a dwell straddling symbol flips splits the peak to
        # +-125 Hz, and both the fine-Doppler refinement and the FLL
        # pull-in use bit-insensitive (pi-ambiguous) discriminators, so the
        # channel settles exactly half a cycle per epoch off (prompt
        # amplitude 2/pi, CN0 -3.9 dB — still above the lock threshold) and
        # I/NAV page sync never succeeds. Observed: 5-sat E1 scenario where
        # one SV false-locked 125 Hz off and never decoded a page.
        self.acq_double = bool(cfg.acq_bit_transition
                               or self.spec.secondary_code
                               or self.spec.bit_period_ms * 1e-3
                               <= self.spec.code_period_s + 1e-9)
        self.acq_reps: dict[int, np.ndarray] = {}
        self.acq_reps2: dict[int, tuple] = {}   # variant replica pairs
        self.acq_pool = list(prns)
        self.acq_backoff: dict[int, int] = {}
        # consecutive failed dwells per PRN: retry intervals grow
        # exponentially (5 chunks doubling to a 300-chunk cap) so a
        # receiver with idle channels is not pinned to the single-chunk
        # acquisition cadence forever — satellites that are simply not
        # visible get retried on the satellite-rise timescale while the
        # fused steady-state dispatch engages in between (the reference
        # pays the same cost differently: its acquisition runs on its own
        # worker thread, gnss_flowgraph.cc:1249)
        self.acq_fails: dict[int, int] = {}
        self.pinned: dict[int, int] = {}   # local channel -> PRN
        # TCP-connector mode: loop closure through an external peer; the
        # engine replaces the jitted scan for this group (see tcp_tracking)
        self.tcp_engine = None
        if cfg.tcp_connector:
            from gnss_sdr_tpu.receiver import tcp_tracking
            self.tcp_engine = tcp_tracking.TcpTrackingEngine(
                spec=self.spec, fs=cfg.fs, n_channels=n_channels,
                n_steps=self.trk_cfg.n_steps, n_max=self.trk_cfg.n_max,
                port_ch0=cfg.tcp_port_ch0,
                table_rate=self.trk_cfg.table_rate,
                cn0_min_dbhz=self.trk_cfg.cn0_min_dbhz,
                carrier_lock_min=self.trk_cfg.carrier_lock_min,
                max_lock_fail=self.trk_cfg.max_lock_fail)

    @property
    def n_max(self) -> int:
        return self.trk_cfg.n_max

    def trk_cfg_for(self, k: int):
        """Tracking config for a k-chunk fused dispatch: the scan covers
        k * chunk_len samples in one device program (one tunnel RPC set
        instead of k). The carry is shape-identical, so the engine can
        alternate k freely; each distinct k compiles once."""
        if k <= 1:
            return self.trk_cfg
        if k not in self._trk_cfg_k:
            import dataclasses as _dc
            cl = self.trk_cfg.chunk_len * k
            ns = int(np.ceil(cl / self.trk_cfg.samples_per_code)) + 2
            self._trk_cfg_k[k] = _dc.replace(self.trk_cfg,
                                             chunk_len=cl, n_steps=ns)
        return self._trk_cfg_k[k]

    def if_freq_for(self, prn: int) -> float:
        """Per-satellite IF: GLONASS FDMA slots sit at k * step from the
        band center (reference: per-channel freq_xlating conditioning)."""
        if self.spec.fdma_step_hz > 0.0:
            slots = self.rx_cfg.glonass_freq_slots
            k = slots[(prn - 1) % len(slots)]
            return self.rx_cfg.if_freq_hz + k * self.spec.fdma_step_hz
        return self.rx_cfg.if_freq_hz

    def carrier_freq_for(self, prn: int) -> float:
        """Per-satellite RF carrier (FDMA slot frequency for GLONASS)."""
        if self.spec.fdma_step_hz > 0.0:
            slots = self.rx_cfg.glonass_freq_slots
            k = slots[(prn - 1) % len(slots)]
            return self.spec.carrier_freq_hz + k * self.spec.fdma_step_hz
        return self.spec.carrier_freq_hz


class _FusedPend:
    """One group's slice of a fused multi-group tracking dispatch: a
    SHARED flat [sum(S*C*13)] download (device array, then Future, then
    host ndarray — mutated in place through ``box`` so all groups pay
    for ONE fetch RPC) plus this group's static offset and [S, C, 13]
    packed shape inside it (see tracking.track_multi_packed)."""
    __slots__ = ("box", "offset", "shape")

    def __init__(self, box: dict, offset: int, shape: tuple):
        self.box = box
        self.offset = offset
        self.shape = shape


class Receiver:
    def __init__(self, config: ReceiverConfig):
        self.cfg = config
        # device mesh for channel/signal-axis sharding (None = single-device)
        self.mesh = None
        self._n_dev = 1
        if config.n_mesh_devices and config.n_mesh_devices > 1:
            from gnss_sdr_tpu.parallel import sharding as shd
            self._shd = shd
            self.mesh = shd.make_mesh(config.n_mesh_devices)
            self._n_dev = config.n_mesh_devices
        plan = list(config.signal_plan) or [
            (config.signal, config.n_channels, config.prns)]
        self.groups: list[SignalGroup] = []
        gid = 0
        gparams = {sig: dict(items) for sig, items in config.group_params}
        for entry in plan:
            sig, n_ch = entry[0], entry[1]
            prns = entry[2] if len(entry) > 2 and entry[2] else tuple(
                range(1, constants.SIGNALS[sig].prn_max + 1))
            c_pad = -(-n_ch // self._n_dev) * self._n_dev
            gcfg = (dataclasses.replace(config, **gparams[sig])
                    if sig in gparams else config)
            self.groups.append(
                SignalGroup(gcfg, sig, n_ch, prns, gid, c_pad=c_pad))
            gid += n_ch
        # primary group keeps the single-signal API working
        g0 = self.groups[0]
        self.spec = g0.spec
        self.trk_cfg = g0.trk_cfg
        self.chunk_len = g0.trk_cfg.chunk_len
        self.n_max = max(g.n_max for g in self.groups)
        self.spc = g0.spc

        self.observables = ObservablesEngine(
            config.fs, config.obs_interval_ms,
            carrier_smoothing_factor=config.carrier_smoothing_factor)
        self.ephemerides = {}           # keyed (system, prn)
        self.almanacs = {}              # keyed (system, prn), weeks-valid
        self.iono = None
        self.utc = None                  # broadcast UTC model (LNAV/CNAV)
        # assisted-start prior: position + receiver TOW at sample 0, loaded
        # from a checkpoint (reference ControlThread assist_GNSS position/
        # time injection); used when no fix exists yet
        self.assist_pos = None
        self.assist_tow = None
        # SUPL acquisition assistance: (system, prn) -> Doppler hints
        # (reference global_gps_acq_assist_map feeding
        # pcps_assisted_acquisition)
        self.acq_assist: dict = {}
        self.fixes: list[pvt_solver.PvtSolution] = []
        self.obs_log: list[tuple[int, list[ChannelObservable]]] = []
        self._sample_base = 0           # absolute sample index of chunk start
        # deferred (pends, base, dlen) tuples, oldest first; the fused
        # steady state keeps up to pipeline_depth-1 quanta in flight
        self._pending_q: list = []
        self._q_rms = None              # int8 upload scale (upload_int8)
        self._q_rms_next = 0
        self._q_scratch: dict = {}      # per-length quantizer f32 scratch
        self._fetch_pool = None         # background result-download thread
        self._fetch_ema = 0.0           # EMA of dispatch->done fetch latency
        self._pvt_interval = int(round(
            config.pvt_output_rate_ms / config.obs_interval_ms))
        self._tick_count = 0
        self._chunk_index = 0
        # output hooks (printers / monitors): called as f(sol) and
        # f(tick_sample, observables) respectively
        self.fix_sinks: list = []
        self.obs_sinks: list = []
        # control plane (telecommands are polled between chunks)
        from gnss_sdr_tpu.receiver import control as control_mod
        self._control_mod = control_mod
        self.control_queue = control_mod.ControlQueue()
        self.restart_requested = False
        self.stop_requested = False
        self.standby = False
        # tracing dumps
        self._dumps = None
        if config.dump_dir:
            from gnss_sdr_tpu.io import dumps as dumps_mod
            d = pathlib.Path(config.dump_dir)
            m = config.dump_mat
            self._dumps = dict(
                tracking=dumps_mod.TrackingDump(d / "tracking.npz", mat=m),
                acquisition=dumps_mod.AcquisitionDump(
                    d / "acquisition.npz", mat=m),
                observables=dumps_mod.ObservablesDump(
                    d / "observables.npz", mat=m),
                pvt=dumps_mod.PvtDump(d / "pvt.npz", mat=m))
            self.obs_sinks.append(
                lambda t, obs: self._dumps["observables"].push_epoch(t, obs))
            self.fix_sinks.append(
                lambda sol: self._dumps["pvt"].push_fix(sol))

    # ------------------------------------------------------------- channels
    @property
    def channels(self) -> list[Channel]:
        """Receiver-wide channel list (all groups, global order)."""
        return [ch for g in self.groups for ch in g.channels]

    @property
    def trk_state(self):
        """Primary signal group's tracking carry (single-signal API)."""
        return self.groups[0].trk_state

    def _group_of(self, ch: Channel) -> SignalGroup:
        for g in self.groups:
            if ch in g.channels:
                return g
        raise KeyError(ch)

    # ------------------------------------------------------------------ acq
    def _acq_window(self, g: SignalGroup, variant: str) -> tuple[int, int]:
        """(fft_window, dwell_stride) for this group's acquisition.

        The natural window (1 or 2 code periods) is kept when its length
        factors MXU-friendly (ops/fft._split factors <= 512). An awkward
        sample rate — e.g. one that makes samples-per-code prime — would
        otherwise hit the dense-DFT fallback and compile an n x n complex
        constant; instead the window is zero-pad-extended (code replica) /
        sample-extended (dwell) to the next friendly length that keeps
        every lag in [0, spc) a full wrap-free correlation: spc + the
        replica's nonzero length."""
        spc = g.spc
        if variant == "e1_8ms":
            base, nonzero = 2 * spc, 2 * spc
        elif variant == "e5a_caf":
            base, nonzero = spc, spc
        else:
            base = 2 * spc if g.acq_double else spc
            nonzero = spc
        from gnss_sdr_tpu.ops import fft as mxu_fft
        if mxu_fft.is_friendly(base):
            return base, base
        return mxu_fft.friendly_len(spc + nonzero), base

    def _code_fft(self, g: SignalGroup, prn: int) -> np.ndarray:
        if prn not in g.acq_reps:
            boc = g.spec.subcarrier_rate_hz
            rep = codes.sample_code(
                codes.code_chips(g.signal, prn), self.cfg.fs,
                g.spec.code_rate_cps, g.spc, boc_rate=boc)
            window, _ = self._acq_window(g, g.rx_cfg.acq_variant)
            if window > len(rep):
                # doubled-FFT mode (reference bit_transition_flag,
                # pcps_acquisition.cc:101) and/or friendly-length padding
                # (_acq_window): zero-pad the code so every code-phase
                # hypothesis correlates over an uninterrupted window even
                # when a data-bit edge falls inside the dwell
                rep = np.concatenate(
                    [rep, np.zeros(window - len(rep), rep.dtype)])
            # split-IQ: complex never crosses the host->device boundary
            g.acq_reps[prn] = iq.split(np.conj(np.fft.fft(rep)))
        return g.acq_reps[prn]

    def _code_fft_pair(self, g: SignalGroup, prn: int) -> tuple:
        """Replica-pair spectra for the variant engines.

        ``e1_8ms``: two-period replicas A = [code, code] and
        B = [code, -code] (galileo_pcps_8ms_acquisition_cc.cc:133-140) so a
        sign flip at the period boundary matches one of the two hypotheses.
        ``e5a_caf``: separate data (E5a-I) and pilot (E5a-Q) single-period
        replicas (galileo_e5a_noncoherent_iq_acquisition_caf_cc)."""
        if prn not in g.acq_reps2:
            boc = g.spec.subcarrier_rate_hz
            rep = codes.sample_code(
                codes.code_chips(g.signal, prn), self.cfg.fs,
                g.spec.code_rate_cps, g.spc, boc_rate=boc)
            if g.rx_cfg.acq_variant == "e1_8ms":
                a = np.concatenate([rep, rep])
                b = np.concatenate([rep, -rep])
            else:                                # e5a_caf: data + pilot
                a = rep
                b = codes.sample_code(
                    codes.pilot_code_chips(g.signal, prn), self.cfg.fs,
                    g.spec.code_rate_cps, g.spc, boc_rate=boc)
            window, _ = self._acq_window(g, g.rx_cfg.acq_variant)
            if window > len(a):               # friendly-length padding
                pad = np.zeros(window - len(a), a.dtype)
                a = np.concatenate([a, pad])
                b = np.concatenate([b, pad])
            g.acq_reps2[prn] = (iq.split(np.conj(np.fft.fft(a))),
                                iq.split(np.conj(np.fft.fft(b))))
        return g.acq_reps2[prn]

    def _refine_doppler(self, g: SignalGroup, chunk: np.ndarray, prn: int,
                        delay: int, doppler: float) -> float:
        """Step-two fine Doppler (reference d_step_two analog): correlate K
        consecutive code periods at the coarse Doppler and estimate the
        residual from the prompt phase slope — data-bit insensitive
        (atan of consecutive-prompt products), pull range +-1/(4 T_code)."""
        k = 8
        n = g.spc
        if delay + k * n > len(chunk):
            return doppler
        boc = g.spec.subcarrier_rate_hz
        rep = codes.sample_code(codes.code_chips(g.signal, prn),
                                self.cfg.fs, g.spec.code_rate_cps, n,
                                boc_rate=boc).astype(np.float64)
        wipe = np.exp(-2j * np.pi * doppler * (np.arange(k * n) / self.cfg.fs))
        seg = chunk[delay: delay + k * n].astype(np.complex128) * wipe
        corr = (seg.reshape(k, n) * rep[None, :]).sum(axis=1)
        z = corr[1:] * np.conj(corr[:-1])
        # bit-insensitive frequency discriminator, averaged over K-1 pairs
        dot = np.real(z)
        dot = np.where(np.abs(dot) < 1e-30, 1e-30, dot)
        t_per = n / self.cfg.fs
        f_res = float(np.mean(np.arctan(np.imag(z) / dot))) / (2 * np.pi * t_per)
        return doppler + f_res

    def _predicted_dopplers(self, g: SignalGroup,
                            candidates: list[int]) -> list[float] | None:
        """Per-candidate Doppler predictions for assisted (warm) acquisition;
        None unless assistance and a position estimate cover ALL candidates
        (reference: ControlThread::assist_GNSS + pcps_assisted_acquisition).
        """
        if not g.rx_cfg.acq_assisted:
            return None
        fix = self.latest_fix()
        if fix is not None:
            pos, tow = fix.pos_ecef, fix.tow_s
        elif self.assist_pos is not None and self.assist_tow is not None:
            # warm start before any fix: checkpointed position + time,
            # advanced by the stream time processed so far (reference
            # ControlThread::get_visible_sats from stored almanac + ref
            # position/time, control_thread.cc:163)
            pos = self.assist_pos
            tow = self.assist_tow + self._sample_base / self.cfg.fs
        else:
            pos = tow = None
        if pos is None and not self.acq_assist:
            return None
        if not self.ephemerides and not self.almanacs \
                and not self.acq_assist:
            return None
        out = []
        for p in candidates:
            # direct SUPL acquisition assistance first (reference
            # pcps_assisted_acquisition_cc.cc:180-186 narrows the search
            # window to Doppler0); fresh for minutes at most
            hint = self.acq_assist.get((g.spec.system, p))
            if hint is not None:
                dt = 0.0 if tow is None or hint.get("tow_s") is None \
                    else tow - hint["tow_s"]
                if abs(dt) < 600.0:
                    fd = hint["doppler_hz"] \
                        + hint.get("doppler_rate_hz_s", 0.0) * dt
                    out.append(fd + g.if_freq_for(p) - self.cfg.if_freq_hz)
                    continue
            if pos is None:
                return None
            # ephemeris preferred; the weeks-valid almanac covers the
            # common warm-start case where no ephemeris is stored
            eph = self.ephemerides.get((g.spec.system, p))
            if eph is None:
                alm = self.almanacs.get((g.spec.system, p))
                if alm is None:
                    return None
                eph = alm.to_ephemeris()
            fd = self._control_mod.predicted_doppler(
                eph, pos, tow, g.carrier_freq_for(p))
            out.append(fd + g.if_freq_for(p) - self.cfg.if_freq_hz)
        return out

    def _prioritize_candidates(self, g: SignalGroup,
                               candidates: list) -> list:
        """Order acquisition candidates by predicted elevation when a
        position/time estimate and orbit data (ephemeris or almanac) exist
        (reference ControlThread::get_visible_sats, control_thread.cc:163,
        feeding GNSSFlowgraph::priorize_satellites): visible satellites
        first, highest elevation first; satellites below -5 deg go to the
        back of the pool; unknown orbits keep their place in between.
        Elevations change slowly, so the ranking refreshes every ~100
        chunks rather than per chunk."""
        fix = self.latest_fix()
        if fix is not None:
            pos, tow = fix.pos_ecef, fix.tow_s
        elif self.assist_pos is not None and self.assist_tow is not None:
            pos = self.assist_pos
            tow = self.assist_tow + self._sample_base / self.cfg.fs
        else:
            return candidates
        cache = getattr(g, "_vis_rank", None)
        if cache is None or self._chunk_index - cache[0] >= 100:
            rank: dict = {}
            for p in g.acq_pool:
                eph = self.ephemerides.get((g.spec.system, p))
                if eph is None:
                    alm = self.almanacs.get((g.spec.system, p))
                    if alm is None:
                        continue
                    eph = alm.to_ephemeris()
                try:
                    sat_pos, _ = eph.position_velocity(tow)
                    _, el = _geodesy_mod.az_el(pos, sat_pos)
                except (ValueError, FloatingPointError):
                    continue
                rank[p] = float(el)
            g._vis_rank = cache = (self._chunk_index, rank)
        rank = cache[1]

        def key(p):
            el = rank.get(p)
            if el is None:
                return (1, 0.0)               # unknown orbit: middle
            if el < np.deg2rad(-5.0):
                return (2, -el)               # set satellites: back
            return (0, -el)                   # visible: front, high el first
        return sorted(candidates, key=key)

    def _run_acquisition(self, g: SignalGroup, chunk: np.ndarray,
                         chunk_dev=None) -> None:
        idle = [ch for ch in g.channels if ch.state == "idle"]
        if not idle:
            return
        tracked = {ch.prn for ch in g.channels if ch.state == "tracking"}
        candidates = [p for p in g.acq_pool
                      if p not in tracked
                      and g.acq_backoff.get(p, 0) <= self._chunk_index]
        if len(candidates) > self.cfg.max_in_acquisition:
            candidates = self._prioritize_candidates(g, candidates)
        candidates = candidates[: self.cfg.max_in_acquisition]
        if not candidates:
            return
        variant = g.rx_cfg.acq_variant
        nc = g.rx_cfg.acq_noncoherent
        if variant == "e1_8ms":
            nc = 1                           # one coherent 8 ms dwell
        window, slab = self._acq_window(g, variant)
        # total samples the dwell stack spans: nc strides of one natural
        # dwell each, the last extended to the (friendly-padded) window
        head_len = (nc - 1) * slab + window
        if len(chunk) < head_len:
            return
        # slide the dwell start by one code period per chunk: the chunk
        # length is typically an integer number of data-bit periods
        # (100 ms = 5 x 20 ms LNAV bits), so a fixed chunk-head dwell
        # re-samples the SAME bit-phase alignment on every retry — a
        # satellite whose bit edge falls inside the dwell then fails the
        # CFAR test indefinitely (observed: a 47 dB-Hz satellite searched
        # for 17 s until the assisted path found it). Stepping the offset
        # through the code-period grid de-aliases the bit phase.
        n_off = max(1, min(23, (len(chunk) - head_len) // max(g.spc, 1)))
        off = (self._chunk_index % n_off) * g.spc
        # device-side slice of the shared uploaded chunk (no re-upload)
        head_dev = (chunk_dev[off: off + head_len] if chunk_dev is not None
                    else iq.split(chunk[off: off + head_len]))
        # decouple dwell advance (code-period multiple) from the padded
        # FFT window; None = natural layout (shares the compile cache)
        stride = slab if slab != window else None
        # pad the candidate batch to a bucket size so the jitted search
        # compiles once per bucket instead of once per distinct pool size
        # (the pool shrinks/grows every chunk as satellites are assigned)
        n_cand = len(candidates)
        bucket = 4 if n_cand <= 4 else ((n_cand + 7) // 8) * 8
        padded = candidates + [candidates[-1]] * (bucket - n_cand)
        dopplers = acq_ops.make_doppler_grid(
            g.rx_cfg.acq_doppler_max_hz, g.rx_cfg.acq_doppler_step_hz)
        # CFAR exclusion half-width: CEIL of samples/chip. int() floored
        # 2.0 MHz / 1.023 Mcps = 1.955 to ONE sample, so the main peak's
        # own shoulder (0.5 chip away, ~0.7 amplitude at worst sampling
        # phase) counted as the "second peak" and halved every CFAR ratio
        # — satellites with an unlucky code/sampling alignment then sat
        # below threshold for tens of seconds (observed: a 47 dB-Hz SV
        # stuck at cfar 1.4-1.9 until the assisted path rescued it).
        spchip = max(1, int(np.ceil(self.cfg.fs / g.spec.code_rate_cps)))
        if variant in ("e1_8ms", "e5a_caf"):
            pairs = [self._code_fft_pair(g, p) for p in padded]
            cfa = np.stack([a for a, _ in pairs])
            cfb = np.stack([b for _, b in pairs])
            if variant == "e1_8ms":
                res = jax.device_get(acq_ops.pcps_8ms_search(
                    head_dev, cfa, cfb, dopplers,
                    fs=self.cfg.fs, samples_per_code=g.spc,
                    samples_per_chip=spchip))
            else:
                caf_half = int(round(g.rx_cfg.acq_caf_window_hz
                                     / (2.0 * g.rx_cfg.acq_doppler_step_hz)))
                res = jax.device_get(acq_ops.noncoherent_iq_caf_search(
                    head_dev, cfa, cfb, dopplers,
                    fs=self.cfg.fs, samples_per_code=g.spc,
                    samples_per_chip=spchip, noncoherent=nc,
                    caf_bins_half=caf_half,
                    both_components=g.rx_cfg.acq_both_components,
                    stride=stride))
            cfar = np.asarray(res.test_cfar)
            code_phases = [int(v) for v in res.code_phase]
            doppler_hz = [float(v) for v in res.doppler_hz]
            cf = None
            predicted = None
        else:
            cf = np.stack([self._code_fft(g, p) for p in padded])
            predicted = self._predicted_dopplers(g, candidates)
        if cf is None:
            pass
        elif predicted is not None and g.spec.fdma_step_hz == 0.0:
            # assisted warm start: per-candidate narrow grids around the
            # predicted Doppler, batched into ONE device call (reference
            # pcps_assisted_acquisition runs one worker per satellite)
            grids = np.stack([
                acq_ops.make_doppler_grid(
                    g.rx_cfg.acq_assisted_doppler_max_hz,
                    g.rx_cfg.acq_doppler_step_hz,
                    doppler_center=predicted[min(i, n_cand - 1)])
                for i in range(bucket)])
            res = acq_ops.pcps_search_grids(
                head_dev, cf, grids,
                fs=self.cfg.fs, samples_per_code=g.spc,
                samples_per_chip=spchip, noncoherent=nc, stride=stride)
            res = jax.device_get(res)        # ONE d2h RPC for all leaves
            cfar = np.asarray(res.test_cfar)
            code_phases = [int(v) for v in res.code_phase]
            doppler_hz = [float(v) for v in res.doppler_hz]
        elif g.spec.fdma_step_hz > 0.0:
            # FDMA: each candidate sits at its own slot IF — fold the slot
            # offset into a per-candidate grid center (equivalent to the
            # reference's per-channel Freq_Xlating conditioning, but one
            # batched device call for all slots)
            centers = np.array([g.if_freq_for(p) for p in padded],
                               np.float32)
            grids = centers[:, None] + dopplers[None, :]
            res = acq_ops.pcps_search_grids(
                head_dev, cf, grids,
                fs=self.cfg.fs, samples_per_code=g.spc,
                samples_per_chip=spchip, noncoherent=nc, stride=stride)
            res = jax.device_get(res)
            cfar = np.asarray(res.test_cfar)
            code_phases = [int(v) for v in res.code_phase]
            # report residual Doppler relative to each slot's IF
            doppler_hz = [float(v) - float(c) for v, c in
                          zip(res.doppler_hz, centers)]
        else:
            if self.mesh is not None:
                # signal axis sharded: pad the code-FFT stack to a multiple
                # of the mesh size, search per-device, slice the results
                n_sig = len(padded)
                s_pad = -(-n_sig // self._n_dev) * self._n_dev
                cf_p = (np.concatenate(
                    [cf, np.repeat(cf[-1:], s_pad - n_sig, axis=0)])
                    if s_pad > n_sig else cf)
                res = self._shd.pcps_search_sharded(
                    self.mesh, head_dev, cf_p, dopplers,
                    fs=self.cfg.fs, samples_per_code=g.spc,
                    samples_per_chip=spchip, noncoherent=nc, stride=stride)
                res = jax.tree.map(lambda a: a[:n_sig],
                                   jax.device_get(res))
            else:
                res = jax.device_get(acq_ops.pcps_search(
                    head_dev, cf, dopplers,
                    fs=self.cfg.fs, samples_per_code=g.spc,
                    samples_per_chip=spchip, noncoherent=nc,
                    stride=stride))
            cfar = np.asarray(res.test_cfar)
            code_phases = [int(v) for v in res.code_phase]
            doppler_hz = [float(v) for v in res.doppler_hz]
        cfar = np.asarray(cfar)[:n_cand]
        code_phases = code_phases[:n_cand]
        doppler_hz = doppler_hz[:n_cand]
        if self._dumps is not None:
            self._dumps["acquisition"].push_batch(
                g.signal, self._chunk_index, candidates, cfar,
                np.asarray(res.test_max_power)[:n_cand], code_phases,
                doppler_hz, np.asarray(res.magnitude)[:n_cand],
                g.rx_cfg.acq_threshold_cfar)
        order = np.argsort(-cfar)
        for idx in order:
            if not idle:
                break
            prn = candidates[int(idx)]
            if cfar[idx] < g.rx_cfg.acq_threshold_cfar:
                fails = self.acq_fails_for(g, prn)
                g.acq_backoff[prn] = self._chunk_index + min(
                    5 << min(fails, 6), 300)
                continue
            # the dwell started `off` samples into the chunk; `off` is a
            # multiple of the code period, so the code boundary nearest
            # the chunk head is at the same phase — report the absolute
            # in-chunk sample so handoff starts on a true boundary
            delay = code_phases[int(idx)] + off
            doppler = doppler_hz[int(idx)]
            if g.rx_cfg.acq_two_step and g.spec.fdma_step_hz == 0.0:
                doppler = self._refine_doppler(g, chunk, prn, delay, doppler)
            # honor channel pinning from set_ch_satellite telecommands
            pinned_chs = [c for c in idle if g.pinned.get(c.ch_id) == prn]
            free_chs = [c for c in idle if c.ch_id not in g.pinned]
            pick = pinned_chs[0] if pinned_chs else (free_chs[0] if free_chs else None)
            if pick is None:
                continue
            idle.remove(pick)
            self._assign_channel(g, pick, prn, delay, doppler)

    def acq_fails_for(self, g: SignalGroup, prn: int) -> int:
        """Count of consecutive failed dwells for this PRN (post-increment:
        returns the count BEFORE this failure)."""
        n = g.acq_fails.get(prn, 0)
        g.acq_fails[prn] = n + 1
        return n

    def _assign_channel(self, g: SignalGroup, ch: Channel, prn: int,
                        delay: int, doppler: float) -> None:
        fc = g.carrier_freq_for(prn)
        code_freq = g.spec.code_rate_cps * (1.0 + doppler / fc)
        # acquisition ran on the head of the *current* chunk, so the code
        # boundary at `delay` is directly usable — tracking starts this chunk
        def _table(chips):
            if g.trk_cfg.table_rate == 2:
                # BOC(1,1): table at 2 entries/chip, subcarrier applied
                return np.repeat(chips, 2) * np.tile(
                    [1.0, -1.0], g.spec.code_length_chips).astype(np.float32)
            return chips
        data_table = _table(codes.code_chips(g.signal, prn))
        if g.trk_cfg.track_pilot:
            g.code_tables[ch.ch_id, 0] = _table(
                codes.pilot_code_chips(g.signal, prn))
            g.code_tables[ch.ch_id, 1] = data_table
        else:
            g.code_tables[ch.ch_id] = data_table
        g.tables_rev = getattr(g, "tables_rev", 0) + 1
        if g.tcp_engine is not None:
            g.tcp_engine.start_channel(
                ch.ch_id, code_table=g.code_tables[ch.ch_id],
                code_freq=code_freq, doppler_hz=doppler,
                sample_offset=int(delay), if_freq_hz=g.if_freq_for(prn))
        else:
            g.trk_state = trk.start_channel(
                g.trk_state, ch.ch_id, code_freq=code_freq,
                doppler_hz=doppler, sample_offset=int(delay),
                if_freq_hz=g.if_freq_for(prn))
        g.acq_fails.pop(prn, None)
        ch.prn = prn
        ch.state = "tracking"
        ch.telemetry = make_telemetry(g.signal, prn)
        ch.clear_records()
        ch.ext_configured = False
        log.info("ch %d [%s]: PRN %d acquired (delay=%d, doppler=%.0f)",
                 ch.global_id, g.signal, prn, delay, doppler)

    def _drop_channel(self, g: SignalGroup, ch: Channel) -> None:
        log.info("ch %d [%s]: PRN %s loss of lock",
                 ch.global_id, g.signal, ch.prn)
        if g.tcp_engine is not None:
            g.tcp_engine.stop_channel(ch.ch_id)
        g.trk_state = trk.stop_channel(g.trk_state, ch.ch_id)
        # the satellite was demonstrably present: retry on the fast
        # cadence (fail counter reset), first dwell after 10 chunks
        g.acq_fails.pop(ch.prn, None)
        g.acq_backoff[ch.prn] = self._chunk_index + 10
        ch.prn = None
        ch.state = "idle"
        ch.telemetry = None
        ch.clear_records()

    # ------------------------------------------------------------ tracking
    def _dispatch_tracking_all(self, chunk_dev, k: int = 1) -> list:
        """Dispatch every group's tracking scan, fusing the scan-engine
        groups into ONE device program + ONE flat download when there is
        more than one: per-group execute/fetch RPCs serialize on the axon
        tunnel (GPS+Galileo 8+8 measured 1.85x the slowest single group,
        BENCH_DETAIL hybrid_serialization) while each group's device
        compute is sub-millisecond. Returns [(group, pend)] in
        self.groups order; TCP-engine and mesh-sharded groups keep the
        per-group path."""
        fusable = [g for g in self.groups
                   if g.tcp_engine is None and self.mesh is None
                   and any(ch.state == "tracking" for ch in g.channels)]
        if len(fusable) < 2:
            return [(g, self._dispatch_tracking(g, chunk_dev, k))
                    for g in self.groups]
        cfgs, slabs, states, tabs, secs = [], [], [], [], []
        for g in fusable:
            self._refresh_tables_dev(g)
            cfg_k = g.trk_cfg_for(k)
            slab = k * self.chunk_len + g.n_max
            cfgs.append(cfg_k)
            slabs.append(None if chunk_dev.shape[0] == slab else slab)
            states.append(g.trk_state)
            tabs.append(g._tables_dev)
            secs.append(g._sec_dev)
        new_states, flat = trk.track_multi_packed(
            tuple(cfgs), chunk_dev, tuple(states), tuple(tabs),
            tuple(secs), tuple(slabs))
        box = {"pend": flat}
        fused, off = {}, 0
        for g, cfg_k, ns in zip(fusable, cfgs, new_states):
            g.trk_state = ns
            shape = (cfg_k.n_steps, g.c_pad, 13)
            fused[id(g)] = _FusedPend(box, off, shape)
            off += int(np.prod(shape))
        return [(g, fused[id(g)]) if id(g) in fused
                else (g, self._dispatch_tracking(g, chunk_dev, k))
                for g in self.groups]

    def _refresh_tables_dev(self, g: SignalGroup) -> None:
        """Cache the (rarely-changing) code/secondary tables on device:
        re-uploading them every chunk costs tunnel RPCs. Stride tables
        (ops/correlator.build_stride_tables) are built here too — once
        per table revision, i.e. per channel (re)assignment."""
        if getattr(g, "_tables_rev", -1) != getattr(g, "tables_rev", 0):
            g._tables_dev = jax.device_put(
                trk.prepare_code_tables(g.trk_cfg, g.code_tables))
            g._sec_dev = jax.device_put(g.sec_tables)
            g._tables_rev = getattr(g, "tables_rev", 0)

    def _dispatch_tracking(self, g: SignalGroup, chunk_dev, k: int = 1):
        """Launch this group's tracking scan without blocking on the result.

        JAX dispatch is asynchronous, so returning the packed device arrays
        (futures) lets the chunk loop launch EVERY group's scan before the
        first blocking download — multi-constellation receivers overlap one
        group's host-side consume / tunnel RPC latency with the other
        groups' device compute (SURVEY §2.4 pipeline-parallelism row; the
        reference gets the same overlap from its thread-per-block
        scheduler). Returns None when the group has no tracking channels.
        """
        if not any(ch.state == "tracking" for ch in g.channels):
            return None
        cfg_k = g.trk_cfg_for(k)
        slab = k * self.chunk_len + g.n_max
        if g.tcp_engine is not None:
            # host-stepped loop closure through the external TCP peers; the
            # packed layout matches pack_host_outputs so everything below
            # the unpack is shared with the scan path
            host_chunk = np.asarray(jax.device_get(chunk_dev[:slab]))
            if host_chunk.dtype == np.uint8:
                host_chunk = iq.dequant4_host(host_chunk)
            elif host_chunk.dtype == np.int8:
                host_chunk = host_chunk.astype(np.float32) / iq.QUANT8_RMS
            return g.tcp_engine.process_chunk(host_chunk,
                                              k * self.chunk_len)
        state, sec = g.trk_state, g.sec_tables
        if self.mesh is not None:
            # channel axis sharded across devices, sample chunk replicated
            # (SURVEY §2.4: per-satellite data parallelism over the mesh)
            chunk2 = chunk_dev[:slab]
            state = self._shd.shard_tracking_state(state, self.mesh)
            tables = self._shd.shard_channel_array(
                trk.prepare_code_tables(g.trk_cfg, g.code_tables), self.mesh)
            sec = self._shd.shard_channel_array(sec, self.mesh)
            chunk2 = self._shd.replicate(chunk2, self.mesh)
            g.trk_state, packed = trk.track_chunk_packed(
                cfg_k, chunk2, state, tables, sec)
            return packed
        self._refresh_tables_dev(g)
        tables, sec = g._tables_dev, g._sec_dev
        # slice + scan + host-output pack fused into ONE device program:
        # one execute RPC per group per dispatch over the tunnel
        g.trk_state, packed = trk.track_chunk_packed(
            cfg_k, chunk_dev, state, tables, sec,
            slab=None if chunk_dev.shape[0] == slab else slab)
        return packed

    def _submit_fetch(self, pend):
        """Start downloading a dispatched result on the fetch thread;
        host-side pends (TCP engine) pass through untouched.

        The worker sleeps ~75 % of the recent dispatch->done latency (EMA)
        before parking in device_get: a thread parked immediately spends
        the whole device-compute window polling the tunnel, and on a
        small host those poll cycles steal CPU from the main loop (the
        measured gap between summed host costs and wall time). Sleeping
        first keeps the early-return benefit while idling through the
        predictable part of the wait."""
        import concurrent.futures
        if pend is None or isinstance(pend, tuple):
            return pend
        if isinstance(pend, _FusedPend):
            # fused multi-group dispatch: ONE shared flat download; the
            # first group's submit starts it, the rest alias it
            if not isinstance(pend.box["pend"],
                              (concurrent.futures.Future, np.ndarray)):
                pend.box["pend"] = self._submit_fetch(pend.box["pend"])
            return pend
        if self._fetch_pool is None:
            self._fetch_pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=max(2, int(self.cfg.pipeline_depth)),
                thread_name_prefix="gnss-fetch")
        t_sub = time.perf_counter()
        delay = 0.75 * self._fetch_ema if self._fetch_ema else 0.0

        def _work():
            if delay > 0.0:
                time.sleep(delay)
            r = jax.device_get(pend)
            dt = time.perf_counter() - t_sub
            self._fetch_ema = (dt if not self._fetch_ema
                               else 0.7 * self._fetch_ema + 0.3 * dt)
            return r

        return self._fetch_pool.submit(_work)

    def _finish_tracking(self, g: SignalGroup, pend,
                         sample_base: int | None = None) -> None:
        import concurrent.futures
        if isinstance(pend, tuple):          # TCP engine: host-side triple
            f32p, i32p, lol = pend
            self._consume_tracking(g, f32p, i32p, lol, sample_base)
            return
        if isinstance(pend, _FusedPend):
            flat = pend.box["pend"]
            if isinstance(flat, concurrent.futures.Future):
                flat = np.asarray(flat.result())
            elif not isinstance(flat, np.ndarray):
                flat = np.asarray(jax.device_get(flat))
            pend.box["pend"] = flat          # later groups reuse host copy
            n = int(np.prod(pend.shape))
            packed = flat[pend.offset: pend.offset + n].reshape(pend.shape)
        elif isinstance(pend, concurrent.futures.Future):
            packed = pend.result()           # background fetch (deferred)
        else:                                # scan engine: ONE fused fetch
            packed = jax.device_get(pend)
        f32p, i32p, lol = trk.unpack_host_outputs(packed)
        self._consume_tracking(g, f32p, i32p, lol, sample_base)

    def _consume_tracking(self, g: SignalGroup, f32p, i32p, lol,
                          sample_base: int | None = None) -> None:
        """Feed one chunk's packed tracking outputs (pack_host_outputs
        layout, from the scan engine or the TCP-connector engine) into
        telemetry / records / dumps and run the channel watchdogs.

        ``sample_base``: absolute sample index of the chunk these outputs
        belong to (defaults to the current chunk; the deferred-consume
        pipeline passes the base captured at dispatch time)."""
        base = self._sample_base if sample_base is None else sample_base
        prompt = (f32p[..., 0] + 1j * f32p[..., 1]).astype(np.complex64)
        rem = f32p[..., 2]
        codef = f32p[..., 3]
        carrf = f32p[..., 4]
        frac = f32p[..., 5]
        cn0 = f32p[..., 6]
        lock_all = f32p[..., 7]
        valid = f32p[..., 8] > 0.5
        eidx = i32p[..., 0]
        start = i32p[..., 1]
        cyc = i32p[..., 2]

        for ch in g.channels:
            if ch.state != "tracking":
                continue
            i = ch.ch_id
            v = valid[:, i]
            if v.any():
                ch.telemetry.push(eidx[v, i], prompt[v, i].real)
                ch.push_record_block(
                    base + start[v, i].astype(np.int64), eidx[v, i],
                    rem[v, i], codef[v, i], carrf[v, i], cyc[v, i],
                    frac[v, i], cn0[v, i])
            # after bit sync: enable extended coherent integration (+
            # secondary-code wipe for NH/CS-overlaid signals), anchored at
            # the telemetry's bit boundary (reference: extended-integration
            # handoff, dll_pll_veml_tracking.cc state 3)
            if (g.extend_symbols > 1 and g.tcp_engine is None
                    and not getattr(ch, "ext_configured", True)
                    and getattr(ch.telemetry, "bit_phase", None) is not None):
                anchor = int(ch.telemetry.bit_phase)
                if g.spec.secondary_code:
                    chips = np.array([int(b) for b in g.spec.secondary_code])
                    g.trk_state = trk.set_secondary(
                        g.trk_state, g.sec_tables, i, chips, anchor)
                    g.tables_rev = getattr(g, "tables_rev", 0) + 1
                g.trk_state = trk.set_extension(
                    g.trk_state, i, g.extend_symbols, anchor)
                ch.ext_configured = True
                log.info("ch %d [%s]: extended integration %d epochs",
                         ch.global_id, g.signal, g.extend_symbols)
            if v.any() and self._dumps is not None:
                lock = lock_all
                self._dumps["tracking"].push_epochs(
                    ch.global_id, ch.prn, base + start[v, i],
                    eidx[v, i], prompt[v, i], cn0[v, i], carrf[v, i],
                    codef[v, i], rem[v, i], lock[v, i])
            if lol[i] or getattr(ch.telemetry, "sync_failed", False):
                self._drop_channel(g, ch)

    # --------------------------------------------------------- observables
    def _run_observables(self, sample_base: int | None = None,
                         length: int | None = None) -> None:
        base = self._sample_base if sample_base is None else sample_base
        ticks = self.observables.ticks_for_range(
            base, base + (self.chunk_len if length is None else length))
        for t in ticks:
            chans = []
            for g in self.groups:
                # staleness bound for tick extrapolation: within its epoch
                # the held code/carrier NCO rates are EXACT (the scan keeps
                # them constant across an epoch), but a tick that lands
                # after a dropped/invalid epoch would silently extrapolate
                # stale dynamics (reference interp_trk_obs rejects obs
                # pairs that do not bracket the tick,
                # hybrid_observables_gs.cc:357-427) — allow at most two
                # (possibly extended) epoch lengths
                max_ds = 2 * g.spc * max(1, getattr(g, "extend_symbols", 1))
                for ch in g.channels:
                    if ch.state != "tracking" or ch.telemetry is None:
                        continue
                    rec = ch.latest_record_before(t)
                    if rec is None:
                        continue
                    if t - rec.abs_start_sample > max_ds:
                        continue
                    chans.append(dict(prn=ch.prn, signal=g.signal,
                                      code_len=g.spec.code_length_chips,
                                      code_rate=g.spec.code_rate_cps,
                                      if_freq=g.if_freq_for(ch.prn),
                                      carrier_freq=g.carrier_freq_for(ch.prn),
                                      record=rec, telemetry=ch.telemetry))
            obs = self.observables.compute(t, chans)
            if obs:
                self.obs_log.append((t, obs))
                for sink in self.obs_sinks:
                    sink(t, obs)
            self._tick_count += 1
            if obs and self._tick_count % self._pvt_interval == 0:
                self._run_pvt(obs)

    def _run_pvt(self, obs: list[ChannelObservable]) -> None:
        self.harvest_nav()
        if not self.cfg.pvt_enabled:
            return
        inputs = pvt_solver.combine_iono_free(self.pvt_inputs(obs))
        sbas_lt, sbas_iono = self.sbas_corrections()
        sol = pvt_solver.solve_pvt(
            inputs, self.ephemerides,
            iono=self.iono if self.cfg.pvt_apply_iono else None,
            apply_tropo=self.cfg.pvt_apply_tropo,
            sbas_lt=sbas_lt,
            sbas_iono=sbas_iono if self.cfg.pvt_apply_iono else None)
        if sol.valid:
            # week is set by the solver from the ephemeris that anchors
            # tow_s (rollover-corrected); no back-fill needed here
            self.fixes.append(sol)
            for sink in self.fix_sinks:
                sink(sol)

    def harvest_nav(self) -> None:
        """Pull decoded ephemerides / iono from the telemetry channels into
        the receiver's (possibly shared) stores."""
        for g in self.groups:
            for ch in g.channels:
                if ch.state == "tracking" and ch.telemetry is not None:
                    eph = ch.telemetry.ephemeris()
                    if eph is not None:
                        self.ephemerides[(g.spec.system, ch.prn)] = eph
                    iono = getattr(ch.telemetry.assembler, "iono", None)
                    if iono is not None and iono.valid:
                        self.iono = iono
                    utc = getattr(ch.telemetry.assembler, "utc", None)
                    if utc is not None and utc.valid:
                        self.utc = utc
                    geo = getattr(ch.telemetry, "geo_eph", None)
                    if geo is not None:
                        self.ephemerides[("S", ch.prn)] = geo
                    # constellation almanac from SF4/5 (or GNAV) pages:
                    # pages name OTHER satellites, so key by the almanac's
                    # own PRN, not the broadcasting channel's
                    alms = getattr(ch.telemetry.assembler, "almanacs", None)
                    if alms:
                        for prn, alm in alms.items():
                            self.almanacs[(g.spec.system, prn)] = alm

    def sbas_corrections(self):
        """(long-term corrections keyed (system, prn), iono grid) from the
        tracked SBAS channels (reference rtklib sbssatcorr/sbsioncorr
        inputs); (None, None) when SBAS is off or nothing is decoded."""
        if not self.cfg.pvt_apply_sbas:
            return None, None
        lt: dict = {}
        grid = None
        for g in self.groups:
            for ch in g.channels:
                tlm = ch.telemetry
                if ch.state != "tracking" or tlm is None:
                    continue
                mask = getattr(tlm, "prn_mask", None)
                for slot, corr in getattr(tlm, "long_term", {}).items():
                    # MT25 slots are 1-based mask positions
                    if mask and 0 < slot <= len(mask):
                        lt[("G", mask[slot - 1])] = corr
                ig = getattr(tlm, "iono_grid", None)
                if ig is not None and ig.n_points and grid is None:
                    grid = ig
        return (lt or None), grid

    def pvt_inputs(self, obs: list[ChannelObservable]) -> list:
        """Solver inputs for this receiver's observables (SBAS corrections
        + per-group carrier frequencies applied). Exposed so a
        MultiSourceReceiver can merge inputs across source branches before
        the (single) solve."""
        # SBAS fast corrections: slot -> PRN via the type-1 mask (DO-229;
        # PR_corrected = PR + PRC), applied to matching GPS observables
        sbas_prc: dict[tuple, float] = {}
        if self.cfg.pvt_apply_sbas:
            for g in self.groups:
                for ch in g.channels:
                    tlm = ch.telemetry
                    if (ch.state == "tracking" and tlm is not None
                            and hasattr(tlm, "fast_corrections")):
                        mask = getattr(tlm, "prn_mask", [])
                        for slot, prc in tlm.fast_corrections.items():
                            if slot < len(mask):
                                sbas_prc[("G", mask[slot])] = prc
        group_by_sig = {g.signal: g for g in self.groups}
        inputs = [pvt_solver.ObsInput(
            prn=o.prn,
            pseudorange_m=o.pseudorange_m + sbas_prc.get(
                (constants.SIGNALS[o.signal].system, o.prn), 0.0),
            doppler_hz=o.doppler_hz,
            carrier_freq_hz=(group_by_sig[o.signal].carrier_freq_for(o.prn)
                             if o.signal in group_by_sig else
                             constants.SIGNALS[o.signal].carrier_freq_hz),
            t_tx_sv=o.t_tx_sv, cn0_dbhz=o.cn0_dbhz,
            system=constants.SIGNALS[o.signal].system) for o in obs]
        return inputs

    # ------------------------------------------------------------- pipeline
    def process(self, samples: np.ndarray, defer: bool = False,
                drain: bool = False) -> None:
        """Feed a contiguous block of conditioned samples (complex64 or
        split-IQ float32 [N, 2]).

        Must be called with blocks of exactly chunk_len except the last.
        Internally keeps the one-epoch halo continuity.

        ``defer=True`` enables the depth-2 chunk pipeline (one chunk of
        host-visible latency, ~3x steady-state throughput over the axon
        tunnel); callers must invoke :meth:`flush` at end of stream. The
        streaming run loops (run_source / run_file_source) do both.
        """
        samples = np.asarray(samples)
        if samples.dtype.kind != "c":
            samples = iq.combine(samples)
            if samples.base is not None:
                # combine() reinterprets contiguous float32 with zero copy;
                # buffered samples must own their memory (a source is free
                # to recycle its read buffer after process() returns)
                samples = samples.copy()
        if not hasattr(self, "_buf"):
            self._buf = np.zeros(0, np.complex64)
            self._buf_pos = 0
            self._frags: list = []
            self._frag_n = 0
        # amortized buffering: incoming blocks pile up in a fragment list
        # and the working buffer is consumed through an offset — both a
        # per-block concat of the accumulating buffer and a per-dispatch
        # tail copy are O(buffered^2) memcpy otherwise (measured: they,
        # not the device, capped streaming at high dispatch depths)
        if len(samples):
            self._frags.append(samples.astype(np.complex64, copy=False))
            self._frag_n += len(samples)
        while True:
            avail = len(self._buf) - self._buf_pos + self._frag_n
            k = self._dispatch_k()
            dlen = k * self.chunk_len
            if avail < dlen + self.n_max:
                # mid-stream, wait for the full fused-dispatch quantum;
                # only an explicit end-of-stream drain() processes the
                # tail in single chunks (otherwise every sub-K buffer
                # state would trigger a K=1 dispatch and the fusion never
                # engages)
                if not drain or k == 1 \
                        or avail < self.chunk_len + self.n_max:
                    break
                k, dlen = 1, self.chunk_len
            if len(self._buf) - self._buf_pos < dlen + self.n_max:
                self._buf = np.concatenate(
                    [self._buf[self._buf_pos:]] + self._frags)
                self._buf_pos = 0
                self._frags, self._frag_n = [], 0
            chunk = self._buf[self._buf_pos: self._buf_pos + dlen + self.n_max]
            self._dispatch_commands()
            if not self.standby:
                if not (defer and k > 1):
                    # single-chunk (acquisition-active) iterations: consume
                    # the PREVIOUS chunk's outputs FIRST — before this
                    # chunk's acquisition can reassign a channel that the
                    # consume drops for loss-of-lock (a consume-after-
                    # acquire ordering would push the old PRN's epochs into
                    # the new PRN's telemetry/observables for one chunk).
                    self.flush()
                # ONE host->device upload per chunk; acquisition and every
                # group's tracking scan slice the same device array (the
                # axon tunnel's per-RPC cost makes repeated implicit
                # uploads the receiver's main overhead). int8 quantization
                # (ops/iq.py) cuts the upload 4x; the rms scale refreshes
                # every ~50 chunks (the dequant constant is fixed, so the
                # scale only needs to keep the signal inside the int8
                # range, not be exact)
                bits = self.cfg.upload_bits or (
                    8 if self.cfg.upload_int8 else 32)
                if bits in (4, 8):
                    if (self._q_rms is None
                            or self._chunk_index >= self._q_rms_next):
                        self._q_rms = iq.measure_rms(chunk)
                        self._q_rms_next = self._chunk_index + 50
                    scr = self._q_scratch.get(len(chunk))
                    if scr is None and len(self._q_scratch) < 4:
                        scr = self._q_scratch.setdefault(
                            len(chunk), np.empty((len(chunk), 2), np.float32))
                    quant = iq.quantize4 if bits == 4 else iq.quantize8
                    chunk_dev = jax.device_put(
                        quant(chunk, rms=self._q_rms, scratch=scr))
                else:
                    chunk_dev = jax.device_put(iq.split(chunk))
                for g in self.groups:
                    self._run_acquisition(g, chunk, chunk_dev)
                # dispatch every group's scan before the first blocking
                # download: group k+1's device compute overlaps group k's
                # host consume + download latency (the hybrid-group
                # serialization noted in bench.py's hybrid_serialization)
                pends = self._dispatch_tracking_all(chunk_dev, k)
                if defer:
                    # host-visible effects (telemetry, records,
                    # observables, loss-of-lock drops) lag one dispatch;
                    # the sample accounting uses the base captured at
                    # dispatch time. The result download starts NOW on a
                    # background thread: the remote-tunnel completion
                    # poll backs off exponentially, so a fetch issued at
                    # consume time can overshoot the program's finish by
                    # hundreds of ms (measured 2x on the steady-state
                    # dispatch cadence); a thread parked in device_get
                    # returns as soon as the result lands.
                    pends = [(g, self._submit_fetch(p)) for g, p in pends]
                    self._pending_q.append(
                        (pends, self._sample_base, dlen))
                    if k > 1:
                        # fused steady state (k > 1 means _dispatch_k saw
                        # no acquisition work, so _run_acquisition above
                        # no-oped and no channel was reassigned): quantum
                        # n is dispatched BEFORE older quanta are
                        # consumed, and up to pipeline_depth-1 quanta stay
                        # in flight — each deferred fetch gets several
                        # host iterations to land (the tunnel's completion
                        # poll contends with concurrent upload/dispatch
                        # RPCs, so a fetch needs more than one quantum of
                        # slack; measured ~135 ms vs 72 ms uncontended).
                        # A loss-of-lock drop during a consume only idles
                        # the channel: later in-flight quanta's columns
                        # for it are skipped at their own consume
                        # (state != tracking), and any reacquisition
                        # happens strictly later, on a k==1 iteration
                        # whose flush() runs before acquisition.
                        depth = max(2, int(self.cfg.pipeline_depth))
                        while len(self._pending_q) >= depth:
                            self._consume_chunk(*self._pending_q.pop(0))
                    else:
                        # acquisition-active cadence: depth 2 keeps
                        # host-visible effects at most one chunk behind
                        while len(self._pending_q) > 1:
                            self._consume_chunk(*self._pending_q.pop(0))
                else:
                    self._consume_chunk(pends, self._sample_base, dlen)
            self._buf_pos += dlen
            self._sample_base += dlen
            self._chunk_index += k
            if self.cfg.status_period_s > 0.0:
                period = int(round(self.cfg.status_period_s * self.cfg.fs))
                if (self._sample_base // period
                        != (self._sample_base - dlen) // period):
                    log.info("status @ %.1f s: %s",
                             self._sample_base / self.cfg.fs,
                             self.status_text())

    def _consume_chunk(self, pends, sample_base: int,
                       length: int | None = None) -> None:
        for g, pend in pends:
            if pend is not None:
                self._finish_tracking(g, pend, sample_base)
        self._run_observables(sample_base, length)

    def _dispatch_k(self) -> int:
        """Chunks to fuse into the next device dispatch: the configured
        depth, unless any group has acquisition work due (idle channels
        with non-backed-off candidates) — then single chunks keep the
        dwell-retry cadence at chunk_ms."""
        k = max(1, int(self.cfg.dispatch_chunks))
        if k == 1 or self.standby:
            return 1
        for g in self.groups:
            if not any(ch.state == "idle" for ch in g.channels):
                continue
            tracked = {ch.prn for ch in g.channels if ch.state == "tracking"}
            if any(p not in tracked
                   and g.acq_backoff.get(p, 0) <= self._chunk_index
                   for p in g.acq_pool):
                return 1
        return k

    def drain(self) -> None:
        """End of stream: process any buffered tail (in single chunks —
        the K-fusion quantum no longer applies) and consume the deferred
        dispatch. Run loops call this after the source is exhausted."""
        self.process(np.zeros(0, np.complex64), defer=True, drain=True)
        self.flush()

    def flush(self) -> None:
        """Consume every deferred quantum still in flight (end of stream,
        or before control-plane actions that mutate channel state)."""
        while self._pending_q:
            self._consume_chunk(*self._pending_q.pop(0))

    # ------------------------------------------------------------- control
    def _dispatch_commands(self) -> None:
        events = self.control_queue.pop_all()
        if events:
            # telecommands mutate channel/group state; retire any deferred
            # chunk first so drops/restarts see consistent bookkeeping
            self.flush()
        for ev in events:
            log.info("telecommand: %s %s", ev.command, ev.args)
            if ev.command == "standby":
                self.standby = True
                for g in self.groups:
                    for ch in g.channels:
                        if ch.state == "tracking":
                            self._drop_channel(g, ch)
            elif ev.command in ("coldstart", "warmstart", "hotstart"):
                self.standby = False
                if ev.command == "coldstart":
                    self.ephemerides.clear()
                    self.iono = None
                for g in self.groups:
                    for ch in g.channels:
                        if ch.state == "tracking":
                            self._drop_channel(g, ch)
                    g.acq_backoff.clear()
                    g.acq_fails.clear()
            elif ev.command == "reset":
                self.restart_requested = True
            elif ev.command in ("stop", "quit"):
                # keyboard 'q' / stop telecommand: end the run loop without
                # requesting a harness restart (reference keyboard_listener,
                # control_thread.cc:180 -> stop message into the queue)
                self.stop_requested = True
            elif ev.command == "set_ch_satellite":
                ch_id, prn = ev.args
                for g in self.groups:
                    for ch in g.channels:
                        if ch.global_id == ch_id:
                            g.pinned[ch.ch_id] = prn
                            if prn not in g.acq_pool:
                                g.acq_pool.append(prn)

    def status_text(self) -> str:
        f = self.latest_fix()
        tracked = ",".join(str(p) for p in self.tracked_prns())
        if f is None:
            return f"NO FIX; tracking PRNs [{tracked}]"
        return (f"FIX lat={np.degrees(f.lat_rad):.6f} "
                f"lon={np.degrees(f.lon_rad):.6f} h={f.height_m:.1f} "
                f"sats={f.n_sats} pdop={f.pdop:.2f}; tracking [{tracked}]")

    def close_dumps(self) -> None:
        if self._dumps is not None:
            for d in self._dumps.values():
                d.close()

    def close(self) -> None:
        """Release external resources (TCP loop peers, dump files)."""
        for g in self.groups:
            if g.tcp_engine is not None:
                g.tcp_engine.close()
        self.close_dumps()

    def checkpoint(self, path) -> None:
        """Persist assistance data (ephemeris/almanac/iono + last position
        and time) for warm/hot start."""
        fix = self.latest_fix()
        self._control_mod.save_assistance(
            path, self.ephemerides, self.iono,
            almanacs=self.almanacs,
            position_ecef=(fix.pos_ecef if fix is not None
                           else self.assist_pos),
            tow_s=(fix.tow_s if fix is not None else self.assist_tow))

    def restore(self, path) -> None:
        self.apply_assistance(self._control_mod.load_assistance(path))

    def apply_assistance(self, a) -> None:
        """Merge an Assistance record (JSON checkpoint, rinex2assist or
        SUPL A-GNSS fetch) into the warm-start state."""
        self.ephemerides.update(a.ephemerides)
        self.almanacs.update(a.almanacs)
        self.acq_assist.update(getattr(a, "acq", {}) or {})
        if a.iono is not None:
            self.iono = a.iono
        if a.position_ecef is not None:
            self.assist_pos = a.position_ecef
            self.assist_tow = a.tow_s

    def step_source(self, source, cond=None, block_len: int | None = None,
                    input_filter=None) -> bool:
        """Pull ONE block from ``source``, condition it, and process it.
        Returns False when the source is exhausted. The pull-based twin of
        :meth:`run_file_source` used by the multi-source receiver to
        interleave several streams in time order (reference: the flowgraph
        scheduler servicing N source->conditioner chains,
        gnss_flowgraph.cc:126-737)."""
        block = source.read(block_len if block_len is not None
                            else self.chunk_len)
        if input_filter is not None and len(block):
            block = input_filter(block)
        if len(block) < (2 if cond is not None else 1):
            return False
        self.process(np.asarray(cond(block)) if cond is not None else block)
        return True

    def run_source(self, source, max_chunks: int | None = None,
                   input_filter=None, double_buffer: bool = True) -> None:
        if double_buffer:
            return self._run_pipelined(source, None, self.chunk_len,
                                       input_filter, max_chunks)
        n = 0
        while ((max_chunks is None or n < max_chunks)
               and not (self.restart_requested or self.stop_requested)):
            block = source.read(self.chunk_len)
            if input_filter is not None and len(block):
                block = input_filter(block)
            if len(block) == 0:
                break
            self.process(block, defer=True)
            n += 1
        self.drain()

    def _run_pipelined(self, source, cond, block_len: int, input_filter,
                       max_chunks: int | None) -> None:
        """Double-buffered chunk loop: a producer thread reads, filters and
        rate-conditions chunk k+1 while the device processes chunk k
        (SURVEY §2.4 pipeline-parallelism row — the reference overlaps its
        source/conditioner blocks with the channel chain through GNU
        Radio's per-block threads; here one prefetch thread suffices
        because the whole channel chain is a single device program).
        """
        import queue as queue_mod
        import threading

        q: queue_mod.Queue = queue_mod.Queue(maxsize=2)
        stop = threading.Event()

        def producer():
            n = 0
            try:
                while ((max_chunks is None or n < max_chunks)
                       and not stop.is_set()):
                    block = source.read(block_len)
                    if input_filter is not None and len(block):
                        block = input_filter(block)
                    if len(block) < (2 if cond is not None else 1):
                        break
                    if cond is not None:
                        block = np.asarray(cond(block))
                    q.put(block)
                    n += 1
            finally:
                q.put(None)                  # end-of-stream sentinel

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while not (self.restart_requested or self.stop_requested):
                block = q.get()
                if block is None:
                    break
                self.process(block, defer=True)
            self.drain()
        finally:
            stop.set()
            # drain so a blocked producer can observe the stop flag
            try:
                while q.get_nowait() is not None:
                    pass
            except queue_mod.Empty:
                pass
            t.join(timeout=5.0)

    def run_file_source(self, source, max_chunks: int | None = None,
                        input_filter=None, double_buffer: bool = True
                        ) -> None:
        """Run from a source whose rate may exceed the internal rate; a
        decimating FIR (integer ratios) or polyphase fractional resampler
        (reference Mmse_Resampler) bridges the rates, with an optional
        ``input_filter`` (notch / pulse blanking / beamformer, see
        config.ini.input_filter_from_ini) applied at the source rate first
        (reference: SignalConditioner = DataTypeAdapter -> InputFilter ->
        Resampler). ``double_buffer`` overlaps the host-side
        read/filter/condition of the next chunk with device processing."""
        cond, block_len = make_rate_conditioner(source.fs, self.cfg.fs,
                                                self.chunk_len)
        if double_buffer:
            return self._run_pipelined(source, cond, block_len,
                                       input_filter, max_chunks)
        n = 0
        while ((max_chunks is None or n < max_chunks)
               and not (self.restart_requested or self.stop_requested)):
            block = source.read(block_len)
            if input_filter is not None and len(block):
                block = input_filter(block)
            if len(block) < (2 if cond is not None else 1):
                break
            self.process(np.asarray(cond(block))
                         if cond is not None else block, defer=True)
            n += 1
        self.drain()

    # ------------------------------------------------------------- queries
    def tracked_prns(self) -> list[int]:
        return [ch.prn for g in self.groups for ch in g.channels
                if ch.state == "tracking"]

    def latest_fix(self):
        return self.fixes[-1] if self.fixes else None


def make_rate_conditioner(source_fs: float, target_fs: float,
                          chunk_len: int):
    """Rate-bridging conditioner from source rate to the internal rate.

    Returns ``(cond, block_len)``: ``cond`` maps a source-rate block to a
    target-rate block (None when the rates already match) and ``block_len``
    is the source-rate read size that conditions to ~one chunk. Shared by
    ``Receiver.run_file_source`` and the per-source chains of the
    multi-source receiver (reference: the per-source SignalConditioner =
    DataTypeAdapter -> InputFilter -> Resampler instantiated once per
    SignalSourceK, gnss_flowgraph.cc:126-737).
    """
    from gnss_sdr_tpu.ops.fir import (StreamingFir,
                                      StreamingFractionalResampler,
                                      design_lowpass)

    ratio = source_fs / target_fs
    if abs(ratio - 1.0) < 1e-9:
        return None, chunk_len
    decim = int(round(ratio))
    if abs(ratio - decim) < 1e-9:
        taps = design_lowpass(decim * 16 + 1, 0.8 / decim)
        return StreamingFir(taps, decim=decim), chunk_len * decim
    if ratio > 1.0:
        # downsampling: anti-alias at the output Nyquist, then
        # fractional interpolation
        lp = StreamingFir(design_lowpass(33, 0.8 / ratio))
        frac = StreamingFractionalResampler(source_fs, target_fs)
        return (lambda x: frac(lp(x))), int(round(chunk_len * ratio))
    # upsampling: no anti-alias filter needed (the input band is
    # already inside the output Nyquist)
    frac = StreamingFractionalResampler(source_fs, target_fs)
    return frac, max(2, int(round(chunk_len * ratio)))
