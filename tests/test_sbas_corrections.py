"""SBAS correction depth: long-term (MT24/25), iono grid (MT18/26).

Reference analogs: rtklib_sbas.cc decode_sbstype18/24/25/26,
decode_longcorr0/1, searchigp/sbsioncorr, sbslongcorr — the correction
machinery beyond the fast corrections, applied in the single-point solver.
"""

import numpy as np

from gnss_sdr_tpu import constants as C
from gnss_sdr_tpu.models.nav import sbas
from gnss_sdr_tpu.receiver.pvt import geodesy, solver
from gnss_sdr_tpu.utils import constellation

TRUE_LLH = (np.deg2rad(41.275), np.deg2rad(1.9876), 80.0)
T0 = 352800.0


def test_long_term_half_roundtrip_velocity_code_0():
    c1 = sbas.LongTermCorrection(3, 17, (1.5, -2.25, 0.875), 2.5e-8)
    c2 = sbas.LongTermCorrection(9, 211, (-0.5, 0.125, 3.0), -1.2e-8)
    h = sbas.encode_type25_half(c1, c2)
    got = sbas.parse_long_term_half(
        np.concatenate([h, np.zeros(106, np.uint8)]), 0, tow_s=1000.0)
    assert len(got) == 2
    g1, g2 = got
    assert (g1.mask_no, g1.iode) == (3, 17)
    assert g1.dpos == (1.5, -2.25, 0.875)
    assert abs(g1.daf0 - 2.5e-8) <= 2.0 ** -31
    assert g1.dvel == (0.0, 0.0, 0.0)
    assert (g2.mask_no, g2.dpos) == (9, (-0.5, 0.125, 3.0))


def test_long_term_half_roundtrip_velocity_code_1():
    c = sbas.LongTermCorrection(5, 9, (3.0, -1.125, 2.0), -1e-8,
                                dvel=(0.01, -0.02, 0.005), daf1=2e-12,
                                t0_s=40000.0)
    h = sbas.encode_type25_half(c, velocity=True)
    g = sbas.parse_long_term_half(
        np.concatenate([h, np.zeros(106, np.uint8)]), 0, tow_s=40100.0)[0]
    assert g.mask_no == 5 and g.dpos == (3.0, -1.125, 2.0)
    for a, b in zip(g.dvel, c.dvel):
        assert abs(a - b) <= 2.0 ** -11
    assert abs(g.daf1 - c.daf1) <= 2.0 ** -39
    assert g.t0_s == 40000.0
    # correction propagates with velocity/drift
    dp, ddt = g.at(40100.0)
    assert abs(dp[0] - (3.0 + g.dvel[0] * 100.0)) < 1e-9
    assert abs(ddt - (g.daf0 + g.daf1 * 100.0)) < 1e-15


def test_igp_table_matches_do229_structure():
    """201 IGPs per band 0-7 (200 in band 8), with the published corner
    points (DO-229 Table A-14; reference rtklib_sbas.h IGPBAND1)."""
    for band in range(8):
        n = sum(len(lats) for _, lats in sbas._BAND_COLUMNS[band])
        assert n == 201, band
    assert sum(len(lats) for _, lats in sbas._BAND_COLUMNS[8]) == 200
    assert sbas.igp_location(0, 1) == (-75.0, -180.0)
    assert sbas.igp_location(0, 28) == (85.0, -180.0)
    assert sbas.igp_location(0, 29) == (-55.0, -175.0)
    assert sbas.igp_location(4, 101) == (-75.0, 0.0)     # X1 column at 0E
    assert sbas.igp_location(8, 178) == (-55.0, 175.0)
    assert sbas.igp_location(9, 1) is None               # polar bands n/a


def test_iono_grid_mask_delay_roundtrip_and_interpolation():
    """MT18 mask + MT26 delays -> bilinear vertical delay + obliquity."""
    grid = sbas.SbasIonoGrid()
    # band 5 covers 20E..55E; find IGP numbers for the 4 corners around
    # (41.3N, 2.0E)... 2.0E is band 4 (lon 0..15 region): use band 4
    want = {(40.0, 0.0), (45.0, 0.0), (40.0, 5.0), (45.0, 5.0)}
    igps = [i for i in range(1, 202)
            if sbas.igp_location(4, i) in want]
    assert len(igps) == 4
    grid.update_mask(sbas.parse_type18_igp_mask(
        sbas.encode_type18_igp_mask(4, igps)))
    delays = [(3.0, 5), (4.0, 5), (5.0, 5), (6.0, 5)]
    grid.update_delays(sbas.parse_type26_iono_delays(
        sbas.encode_type26_iono_delays(4, 0, delays)))
    assert grid.n_points == 4
    # the corner points themselves
    lo = sbas.igp_location(4, igps[0])
    v0 = grid.vertical_delay(*lo)
    assert v0 is not None and abs(v0 - 3.0) < 1e-9
    # interior point interpolates between the corners
    v = grid.vertical_delay(42.5, 2.5)
    assert v is not None and 3.0 < v < 6.0
    # outside the masked cell -> None (no extrapolation)
    assert grid.vertical_delay(50.1, 2.5) is None
    # slant delay includes the obliquity factor (>1 below zenith); high
    # elevation keeps the pierce point inside the single masked cell
    s = grid.slant_delay(np.deg2rad(42.5), np.deg2rad(2.5),
                         0.3, np.deg2rad(70.0))
    vpp = grid.vertical_delay(*map(np.degrees, sbas.pierce_point(
        np.deg2rad(42.5), np.deg2rad(2.5), 0.3, np.deg2rad(70.0))[:2]))
    assert s is not None and s > vpp


def test_solver_applies_sbas_long_term_and_iono():
    """Degraded broadcast (clock error + iono) + matching SBAS corrections
    recovers the fix; without them the error is large (rtklib
    sbssatcorr/sbsioncorr roles)."""
    ephs = constellation.almanac_constellation()
    rcv = geodesy.geodetic_to_ecef(*TRUE_LLH)
    vis = constellation.visible_sats(ephs, rcv, T0, el_mask_deg=15.0)
    prns = [p for p, _, _ in vis[:7]]

    # truth observations, then a per-satellite broadcast CLOCK error is
    # injected into the ephemerides the solver sees; SBAS long-term
    # corrections carry the negated error
    rng = np.random.default_rng(3)
    daf0_err = {p: float(rng.uniform(-8e-8, 8e-8)) for p in prns}

    # slant iono from a smooth synthetic vertical field sampled at the
    # pierce points; the SBAS grid broadcasts the same field
    def viono(lat_deg, lon_deg):
        return 3.0 + 0.08 * (lat_deg - 40.0) + 0.05 * (lon_deg - 2.0)

    # broadcast the full bands 3-5 (low-elevation pierce points reach
    # ~10 deg from the receiver): mask all IGPs, delays from the field
    grid = sbas.SbasIonoGrid()
    for band in (3, 4, 5):
        n = sum(len(lats) for _, lats in sbas._BAND_COLUMNS[band])
        igps = list(range(1, n + 1))
        grid.update_mask(sbas.parse_type18_igp_mask(
            sbas.encode_type18_igp_mask(band, igps)))
        vals = [(viono(*sbas.igp_location(band, i)), 5) for i in igps]
        for blk in range((len(vals) + 14) // 15):
            grid.update_delays(sbas.parse_type26_iono_delays(
                sbas.encode_type26_iono_delays(
                    band, blk, vals[15 * blk: 15 * blk + 15])))

    import dataclasses as dc
    obs = []
    bad_ephs = {}
    sbas_lt = {}
    for p in prns:
        o = constellation.simulate_observation(ephs[p], rcv, T0,
                                               rcv_clock_bias_s=1e-4)
        sp = ephs[p].position_velocity(o.t_tx_sv)[0]
        az, el = geodesy.az_el(rcv, sp)
        slant = grid.slant_delay(TRUE_LLH[0], TRUE_LLH[1], az, el)
        assert slant is not None
        o.pseudorange_m += slant                  # iono on the signal
        obs.append(o)
        bad = dc.replace(ephs[p], af0=ephs[p].af0 + daf0_err[p])
        bad_ephs[("G", p)] = bad
        # SBAS long-term correction cancels the broadcast clock error
        # (applied as dts += daf0, so the provider broadcasts the negated
        # broadcast-minus-precise clock error — rtklib sbslongcorr sign)
        sbas_lt[("G", p)] = sbas.LongTermCorrection(
            mask_no=p, iode=bad.iode, dpos=(0.0, 0.0, 0.0),
            daf0=-daf0_err[p])

    # uncorrected: broadcast clock errors + unmodeled iono -> large error
    sol_bad = solver.solve_pvt(obs, bad_ephs, iono=None, apply_tropo=False)
    err_bad = np.linalg.norm(sol_bad.pos_ecef - rcv)
    # corrected: long-term + grid iono
    sol_ok = solver.solve_pvt(obs, bad_ephs, iono=None, apply_tropo=False,
                              sbas_lt=sbas_lt, sbas_iono=grid)
    err_ok = np.linalg.norm(sol_ok.pos_ecef - rcv)
    assert err_bad > 5.0, f"degradation too small ({err_bad:.1f} m)"
    assert err_ok < 1.0, f"SBAS-corrected error {err_ok:.2f} m"
    assert err_ok < err_bad / 5.0


def test_sbas_telemetry_collects_long_term_and_grid():
    """SbasL1Telemetry decodes MT25/18/26 from the symbol stream into
    long_term + iono_grid (extending the MT1/2-5 path)."""
    from gnss_sdr_tpu.receiver.telemetry import SbasL1Telemetry

    c = sbas.LongTermCorrection(2, 33, (1.0, -0.5, 0.25), 1e-8)
    m25 = sbas.encode_type25(sbas.encode_type25_half(c),
                             np.zeros(106, np.uint8))
    m18 = sbas.encode_type18_igp_mask(4, [101, 102])
    m26 = sbas.encode_type26_iono_delays(4, 0, [(2.5, 4), (3.5, 4)])
    msgs = [(25, m25), (18, m18), (26, m26)] * 2
    sym01 = sbas.encode_stream(msgs)
    amp = 60.0
    prompts = np.repeat(amp * (1.0 - 2.0 * sym01.astype(np.float64)), 2)
    tlm = SbasL1Telemetry(prn=123)
    tlm.push(np.arange(len(prompts)), prompts)
    assert tlm.message_count >= 3
    assert 2 in tlm.long_term
    assert tlm.long_term[2].dpos == (1.0, -0.5, 0.25)
    assert tlm.iono_grid.n_points == 2
