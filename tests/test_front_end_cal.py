"""Front-end oscillator calibration test."""

import numpy as np

from gnss_sdr_tpu.receiver.pvt import geodesy
from gnss_sdr_tpu.utils import constellation
from gnss_sdr_tpu.utils.front_end_cal import estimate_oscillator_error


def test_oscillator_error_estimation():
    ephs = constellation.almanac_constellation()
    rcv = geodesy.geodetic_to_ecef(np.deg2rad(41.275), np.deg2rad(1.9876), 80.0)
    t = 354000.0
    vis = constellation.visible_sats(ephs, rcv, t)[:6]
    # simulate measured dopplers with a 3.2 ppm oscillator error (+ noise)
    f_l1 = 1.57542e9
    osc_hz = 3.2e-6 * f_l1
    rng = np.random.default_rng(0)
    measured = {}
    for prn, _, _ in vis:
        o = constellation.simulate_observation(ephs[prn], rcv, t)
        measured[prn] = o.doppler_hz + osc_hz + rng.normal(0, 5.0)
    res = estimate_oscillator_error(measured, ephs, rcv, t, f_l1)
    assert res.n_sats == 6
    # clock-drift terms differ per SV between sim and prediction (~tens of Hz)
    assert abs(res.clock_offset_hz - osc_hz) < 150.0
    assert abs(res.clock_offset_ppm - 3.2) < 0.1


def test_full_cal_flow_from_capture():
    """The complete front-end-cal app flow (reference main.cc:264): all-PRN
    acquisition sweep on a short capture whose front-end oscillator is
    3 ppm off, then the Doppler fit recovers the error."""
    from gnss_sdr_tpu import constants
    from gnss_sdr_tpu.utils import generator
    from gnss_sdr_tpu.utils.front_end_cal import run_front_end_cal

    ephs = constellation.almanac_constellation()
    rcv = geodesy.geodetic_to_ecef(np.deg2rad(41.275), np.deg2rad(1.9876),
                                   80.0)
    t = 354000.0
    vis = constellation.visible_sats(ephs, rcv, t)[:5]
    f_l1 = 1.57542e9
    osc_hz = 3.0e-6 * f_l1                      # ~4.7 kHz at L1
    fs = 2.0e6
    spec = constants.SIGNALS["1C"]
    sats = []
    for k, (prn, _, _) in enumerate(vis):
        o = constellation.simulate_observation(ephs[prn], rcv, t)
        sats.append(generator.SatParams(
            prn=prn, cn0_dbhz=46.0, doppler_hz=o.doppler_hz + osc_hz,
            code_delay_s=1.7e-4 * k))
    x = generator.generate(spec, sats, fs, 0.08, seed=3)

    cal, rows = run_front_end_cal(x, fs, ephs, rcv, t,
                                  doppler_max_hz=10_000.0,
                                  doppler_step_hz=250.0)
    det = {r.prn for r in rows if r.detected}
    assert {p for p, _, _ in vis} <= det
    # false alarms cannot swamp the sweep
    assert len(det) <= len(vis) + 3
    assert cal.n_sats >= 5
    # fit error budget: 250 Hz grid quantization + per-SV drift scatter
    assert abs(cal.clock_offset_hz - osc_hz) < 200.0
    assert abs(cal.clock_offset_ppm - 3.0) < 0.15
