"""Front-end oscillator calibration from acquisition Doppler residuals.

Reference analog: the ``front-end-cal`` utility
(``src/utils/front-end-cal/main.cc``): acquire several satellites, predict
their true Doppler from assistance ephemeris + a rough position, and
attribute the common residual to the front-end reference-oscillator error
(reported in Hz at the carrier and in ppm).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from gnss_sdr_tpu.receiver.control import predicted_doppler


@dataclasses.dataclass
class CalResult:
    clock_offset_hz: float      # common Doppler residual at the carrier
    clock_offset_ppm: float
    residuals_hz: dict          # per-PRN after removing the common offset
    n_sats: int


def estimate_oscillator_error(measured_doppler_hz: dict[int, float],
                              ephemerides: dict, rcv_ecef: np.ndarray,
                              t_gps: float,
                              carrier_freq_hz: float = 1_575_420_000.0) -> CalResult:
    """LS fit of the common oscillator offset across acquired satellites.

    measured = predicted + f_osc_error for every SV; a robust (median) fit
    rejects satellites whose acquisition was a false alarm.
    """
    prns = [p for p in measured_doppler_hz if p in ephemerides]
    if not prns:
        raise ValueError("no overlapping PRNs between measurements and assistance")
    predicted = {p: predicted_doppler(ephemerides[p], rcv_ecef, t_gps,
                                      carrier_freq_hz) for p in prns}
    diffs = np.array([measured_doppler_hz[p] - predicted[p] for p in prns])
    offset = float(np.median(diffs))
    resid = {p: float(measured_doppler_hz[p] - predicted[p] - offset)
             for p in prns}
    return CalResult(clock_offset_hz=offset,
                     clock_offset_ppm=offset / carrier_freq_hz * 1e6,
                     residuals_hz=resid, n_sats=len(prns))
