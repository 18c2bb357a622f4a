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
