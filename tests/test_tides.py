"""Solid Earth tide tests (reference: rtklib_tides tide_pl/sunmoonpos)."""

import numpy as np

from gnss_sdr_tpu.receiver.pvt import geodesy, tides

WEEK = 2245
RCV = geodesy.geodetic_to_ecef(np.deg2rad(41.275), np.deg2rad(1.9876), 80.0)


def test_sun_moon_positions_plausible():
    sun, moon = tides.sun_moon_ecef(WEEK, 352800.0)
    assert abs(np.linalg.norm(sun) - 1.496e11) < 0.05e11      # ~1 AU
    assert 3.5e8 < np.linalg.norm(moon) < 4.1e8               # ~384,000 km
    # over 6 hours the Sun's ECEF direction rotates ~90 deg (Earth spin)
    sun2, _ = tides.sun_moon_ecef(WEEK, 352800.0 + 6 * 3600.0)
    c = sun @ sun2 / np.linalg.norm(sun) / np.linalg.norm(sun2)
    assert abs(np.degrees(np.arccos(np.clip(c, -1, 1))) - 90.0) < 8.0


def test_tide_magnitude_and_period():
    """Solid tide: cm..dm magnitude, dominated by semi-diurnal periodicity."""
    tows = 352800.0 + 900.0 * np.arange(96)          # 24 h, 15 min steps
    d = np.stack([tides.solid_tide_displacement(RCV, WEEK, t) for t in tows])
    mag = np.linalg.norm(d, axis=1)
    assert 0.02 < mag.max() < 0.6, mag.max()         # typical 5..40 cm
    # radial component dominates
    e_r = RCV / np.linalg.norm(RCV)
    radial = d @ e_r
    assert np.abs(radial).max() > 0.6 * mag.max()
    # tidal oscillation over the day: several sign changes and a
    # peak-to-peak swing of at least ~15 cm (mix of diurnal + M2 at 12.42 h
    # makes an exact-12 h correlation test meaningless)
    flips = np.sum(np.sign(radial[1:]) != np.sign(radial[:-1]))
    assert flips >= 2, flips
    assert radial.max() - radial.min() > 0.15


def test_tide_displacement_smooth():
    d1 = tides.solid_tide_displacement(RCV, WEEK, 352800.0)
    d2 = tides.solid_tide_displacement(RCV, WEEK, 352830.0)
    assert np.linalg.norm(d1 - d2) < 0.005          # < 5 mm in 30 s
