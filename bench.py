#!/usr/bin/env python3
"""Benchmark: IQ Msamples/s/chip through acquisition + tracking.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Scenario (BASELINE.json): GPS L1 C/A, 8 tracking channels at the reference's
internal rate (2 Msps, conf/gnss-sdr_GPS_L1_ishort.conf) + a full PCPS
acquisition sweep per second of signal. The reference's qualitative baseline
is 1x real-time on a commodity CPU ("test how many channels your processor
can handle in real-time", README.md:1482); the north star is >= 10x real-time
per chip. vs_baseline reports the real-time factor (value / 1x reference).
"""

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from gnss_sdr_tpu.models import codes
    from gnss_sdr_tpu.ops import acquisition as acq_ops
    from gnss_sdr_tpu.ops import iq
    from gnss_sdr_tpu.receiver import tracking as trk
    from gnss_sdr_tpu import constants
    from gnss_sdr_tpu.utils import generator

    fs = 2.0e6
    n_channels = 8
    chunk_ms = 200
    spec = constants.GPS_L1_CA
    cfg = trk.default_config(spec, fs, chunk_ms=chunk_ms)
    spc = int(fs * 1e-3)

    # --- signal: 8 satellites, 1 chunk of IQ reused round-robin -------------
    prns = [1, 3, 7, 11, 14, 19, 23, 28]
    sats = [generator.SatParams(prn=p, cn0_dbhz=45.0,
                                doppler_hz=500.0 * (i - 4) + 130.0,
                                code_delay_s=7e-5 * i)
            for i, p in enumerate(prns)]
    n_chunk = cfg.chunk_len + cfg.n_max
    x = generator.generate(spec, sats, fs, (n_chunk + spc) / fs, seed=1)
    chunk = jnp.asarray(iq.split(x[:n_chunk]))   # split-IQ boundary

    state = trk.init_state(n_channels)
    tables = np.stack([codes.gps_l1ca_code(p) for p in prns]).astype(np.float32)
    for i, s in enumerate(sats):
        state = trk.start_channel(
            state, i, code_freq=1.023e6 * (1 + s.doppler_hz / spec.carrier_freq_hz),
            doppler_hz=s.doppler_hz, sample_offset=int(s.code_delay_s * fs))
    tables = jnp.asarray(tables)

    cf = jnp.asarray(np.stack([
        iq.split(np.conj(np.fft.fft(codes.sample_code(
            codes.gps_l1ca_code(p), fs, 1.023e6, spc))))
        for p in prns]))
    dopplers = jnp.asarray(acq_ops.make_doppler_grid(5000, 250))

    def track_step(st):
        st2, outs = trk.track_chunk(cfg, chunk, st, tables)
        # keep offsets in-range so the steady-state loop can run forever
        st2 = st2._replace(sample_offset=st2.sample_offset % spc)
        return st2, outs.prompt

    def acq_step():
        return acq_ops.pcps_search(chunk[: 2 * spc], cf, dopplers, fs=fs,
                                   samples_per_code=spc, samples_per_chip=2,
                                   noncoherent=2)

    # --- warmup / compile. Acquisition first: it is the TPU-proven path; the
    # tracking scan is gated so a backend that cannot lower it still yields a
    # benchmark (acquisition-only) instead of nothing.
    jax.block_until_ready(acq_step())
    n_acq = 10
    t0 = time.perf_counter()
    for _ in range(n_acq):
        r = acq_step()
    jax.block_until_ready(r)
    t_acq = (time.perf_counter() - t0) / n_acq

    track_ok = True
    t_track = 0.0
    try:
        state, p = track_step(state)
        jax.block_until_ready(p)
        n_iter = 25
        t0 = time.perf_counter()
        for _ in range(n_iter):
            state, p = track_step(state)
        jax.block_until_ready(p)
        t_track = (time.perf_counter() - t0) / n_iter      # s per chunk
    except Exception:
        track_ok = False

    if track_ok:
        # receiver budget: every 1 s of signal = 1000/chunk_ms tracking chunks
        # + one full acquisition sweep
        t_per_second_of_signal = t_track * (1000.0 / chunk_ms) + t_acq
        realtime_factor = 1.0 / t_per_second_of_signal
        msps = realtime_factor * fs / 1e6
        print(json.dumps({
            "metric": "gps_l1_8ch_acq_track_throughput",
            "value": round(msps, 2),
            "unit": "Msamples/s/chip",
            "vs_baseline": round(realtime_factor, 2),
        }))
    else:
        # acquisition-only: full 8-PRN x 41-doppler PCPS sweep over 2 ms
        # dwells; real-time equivalent = how many seconds of signal the acq
        # engine can sweep per second (1 sweep needed per second of signal)
        realtime_factor = 1.0 / t_acq
        msps = realtime_factor * fs / 1e6
        print(json.dumps({
            "metric": "gps_l1_8prn_pcps_acquisition_throughput",
            "value": round(msps, 2),
            "unit": "Msamples/s/chip",
            "vs_baseline": round(realtime_factor, 2),
        }))


if __name__ == "__main__":
    main()
