"""Almanac subsystem: SF4/5 codec, models, checkpoint, almanac warm start.

Reference analogs: ``gps_navigation_message.cc`` subframe 4/5 almanac
decode, the ``Gps_Almanac`` XML persistence set (control_thread.h:189-202)
and ``ControlThread::get_visible_sats`` (control_thread.cc:163) driving
assisted acquisition from almanac + last position/time — the common
real-world warm start, where ephemerides have expired but the
weeks-valid almanac has not.
"""

import numpy as np

from gnss_sdr_tpu.models.almanac import GlonassAlmanac, GpsAlmanac
from gnss_sdr_tpu.models.nav import gps_lnav
from gnss_sdr_tpu.receiver.pvt import geodesy
from gnss_sdr_tpu.utils import constellation, scenario as scen

TRUE_LLH = (np.deg2rad(41.275), np.deg2rad(1.9876), 80.0)


def test_almanac_projection_matches_ephemeris():
    """from_ephemeris snaps toa to the 2^12 grid while propagating the
    epoch-dependent elements: the projected orbit stays within ~km of the
    full ephemeris over hours (the almanac drops only the harmonic terms
    and delta_n/idot)."""
    ephs = constellation.almanac_constellation()
    for prn in list(ephs)[:8]:
        eph = ephs[prn]
        alm = GpsAlmanac.from_ephemeris(eph)
        assert alm.toa % 4096.0 == 0.0
        for dt in (0.0, 1800.0, 7200.0):
            p1, _ = eph.position_velocity(eph.toe + dt)
            p2, _ = alm.position_velocity(eph.toe + dt)
            assert np.linalg.norm(p1 - p2) < 2000.0, (prn, dt)


def test_almanac_page_roundtrip():
    """SF5 almanac page encode->parity->decode within quantization."""
    ephs = constellation.almanac_constellation()
    eph = ephs[sorted(ephs)[0]]
    alm = GpsAlmanac.from_ephemeris(eph)
    for sfid in (4, 5):
        sf = gps_lnav.decode_subframe(
            gps_lnav.encode_almanac_page(sfid, 352806.0, alm))
        assert sf is not None and sf.sfid == sfid
        a2 = GpsAlmanac(**sf.fields["almanac"])
        assert a2.prn == alm.prn
        assert a2.toa == alm.toa
        assert abs(a2.e - alm.e) <= 2.0 ** -21
        assert abs(a2.sqrt_a - alm.sqrt_a) <= 2.0 ** -11
        assert abs(a2.m0 - alm.m0) <= 2.0 ** -23 * np.pi
        assert abs(a2.omega0 - alm.omega0) <= 2.0 ** -23 * np.pi
        assert abs(a2.af0 - alm.af0) <= 2.0 ** -20
        # decoded orbit within metres of the encoded one
        p1, _ = alm.position_velocity(alm.toa + 600.0)
        p2, _ = a2.position_velocity(alm.toa + 600.0)
        assert np.linalg.norm(p1 - p2) < 50.0


def test_almanac_reference_page_and_assembler():
    """SF5 page 25 (SVID 51) carries toa/WNa; the assembler collects pages
    from OTHER satellites into a constellation almanac map and applies the
    reference week to them."""
    ephs = constellation.almanac_constellation()
    prns = sorted(ephs)[:4]
    asm = gps_lnav.LnavAssembler(prns[0])
    for prn in prns:
        alm = GpsAlmanac.from_ephemeris(ephs[prn])
        sf = gps_lnav.decode_subframe(
            gps_lnav.encode_almanac_page(5, 352806.0, alm))
        asm.push(sf)
    ref = gps_lnav.decode_subframe(gps_lnav.encode_almanac_reference_page(
        352812.0, GpsAlmanac.from_ephemeris(ephs[prns[0]]).toa, 245))
    asm.push(ref)
    assert sorted(asm.almanacs) == prns
    assert all(a.wna == 245 for a in asm.almanacs.values())
    assert asm.alm_toa is not None


def test_encode_frames_pages_almanac_round_robin():
    """encode_frames with almanacs fills SF4/5 slots with staggered pages
    (the generator's source for almanac-bearing captures)."""
    ephs = constellation.almanac_constellation()
    prns = sorted(ephs)[:3]
    alms = [GpsAlmanac.from_ephemeris(ephs[p]) for p in prns]
    bits = gps_lnav.encode_frames(ephs[prns[0]], 352800.0, 12,
                                  sfid_cycle=(1, 2, 3, 5), almanacs=alms,
                                  alm_start=1)
    got = []
    for k in range(12):
        sf = gps_lnav.decode_subframe(bits[k * 300:(k + 1) * 300])
        assert sf is not None
        if sf.sfid == 5:
            got.append(sf.fields.get("almanac", {}).get(
                "prn", 51 if "alm_toa" in sf.fields else None))
    # alm_start=1 -> pages: prns[1], prns[2], ref(51)
    assert got == [prns[1], prns[2], 51]


def test_receiver_harvests_almanac_and_checkpoints(tmp_path):
    """Receiver.harvest_nav pulls almanacs from telemetry assemblers, and
    checkpoint/restore round-trips them with position+time."""
    from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig

    ephs = constellation.almanac_constellation()
    prns = sorted(ephs)[:3]
    rx = Receiver(ReceiverConfig(signal="1C", fs=1.023e6, n_channels=1))
    ch = rx.groups[0].channels[0]
    ch.state = "tracking"
    ch.prn = prns[0]
    from gnss_sdr_tpu.receiver.telemetry import make_telemetry
    ch.telemetry = make_telemetry("1C", prns[0])
    for prn in prns:
        sf = gps_lnav.decode_subframe(gps_lnav.encode_almanac_page(
            5, 352806.0, GpsAlmanac.from_ephemeris(ephs[prn])))
        ch.telemetry.assembler.push(sf)
    rx.harvest_nav()
    assert all(("G", p) in rx.almanacs for p in prns)

    from gnss_sdr_tpu.receiver.pvt import solver as pvt_solver
    rx.fixes.append(pvt_solver.PvtSolution(
        valid=True, pos_ecef=np.array([4.8e6, 1.6e5, 4.2e6]),
        tow_s=352801.0, n_sats=5))
    ck = tmp_path / "assist.json"
    rx.checkpoint(ck)

    rx2 = Receiver(ReceiverConfig(signal="1C", fs=1.023e6, n_channels=1))
    rx2.restore(ck)
    assert all(("G", p) in rx2.almanacs for p in prns)
    np.testing.assert_allclose(rx2.assist_pos, [4.8e6, 1.6e5, 4.2e6])
    assert rx2.assist_tow == 352801.0


def test_almanac_only_warm_start_acquisition():
    """Assisted acquisition from ALMANAC + checkpointed position/time with
    NO ephemerides and NO prior fix (reference get_visible_sats warm
    start): predictions land inside the assisted window and the receiver
    acquires every satellite."""
    from gnss_sdr_tpu.io.sources import ArraySignalSource
    from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig

    sc = scen.build_gps_l1_scenario(duration_s=2.0, n_sats=5, cn0_dbhz=47.0,
                                    fs=2.0e6)
    x = sc.generate(seed=91)
    rx = Receiver(ReceiverConfig(
        signal="1C", fs=sc.fs, n_channels=5, prns=tuple(sc.prns),
        chunk_ms=100, acq_assisted=True, acq_two_step=False,
        pvt_apply_tropo=False, pvt_apply_iono=False))
    # almanac-only warm-start state (ephemerides deliberately absent)
    for p in sc.prns:
        rx.almanacs[("G", p)] = GpsAlmanac.from_ephemeris(sc.ephemerides[p])
    rx.assist_pos = sc.rcv_ecef.copy()
    rx.assist_tow = sc.t0_gps
    assert not rx.ephemerides and rx.latest_fix() is None

    preds = rx._predicted_dopplers(rx.groups[0], list(sc.prns))
    assert preds is not None, "almanac warm start did not engage"
    for prn, fd in zip(sc.prns, preds):
        sat = next(s for s in sc.sats if s.prn == prn)
        # almanac-grade prediction: well inside the 600 Hz assisted window
        assert abs(fd - sat.doppler_hz) < 300.0, (prn, fd, sat.doppler_hz)
    rx.run_source(ArraySignalSource(x, sc.fs))
    assert len(set(rx.tracked_prns()) & set(sc.prns)) >= 4


def test_glonass_almanac_coarse_orbit():
    """GNAV almanac model: the draconitic-period axis lands at the GLONASS
    shell and the coarse propagation yields a bounded-velocity orbit usable
    for Doppler prediction."""
    # typical broadcast value: the draconitic period is ~40544 s, i.e.
    # delta_T ~ -2656 s from the 43200 s convention
    alm = GlonassAlmanac(slot=5, freq_slot=1, lambda_n=0.8,
                         t_lambda=20000.0, delta_i=np.deg2rad(1.2),
                         ecc=0.002, omega_n=0.3, delta_t=-2656.0)
    a = alm.semi_major_axis()
    assert 25.2e6 < a < 25.8e6          # GLONASS orbit shell
    p, v = alm.position_velocity(23000.0)
    assert abs(np.linalg.norm(p) - a) < 0.05 * a
    assert 2500.0 < np.linalg.norm(v) < 4500.0


def test_gnav_almanac_string_pair_roundtrip():
    """GNAV almanac even/odd string pair encode->Hamming->decode->assembler
    (ICD 4.5 strings 6-15; reference glonass_gnav_navigation_message)."""
    from gnss_sdr_tpu.models.nav import glonass_gnav as gn

    alm = GlonassAlmanac(slot=9, freq_slot=-2, health=1, lambda_n=-1.25,
                         t_lambda=31000.5, delta_i=np.deg2rad(0.8),
                         ecc=0.0012, omega_n=1.1, delta_t=-2655.4,
                         delta_t_dot=6.1e-4, tau_n=4.2e-5)
    b1, b2 = gn.encode_almanac_pair(8, alm)
    asm = gn.GnavAssembler(slot=3)
    for b in (b1, b2):
        res = gn.decode_string(b)
        assert res is not None
        asm.push(*res)
    assert 9 in asm.almanacs
    a2 = asm.almanacs[9]
    assert a2.freq_slot == -2 and a2.health == 1
    assert abs(a2.lambda_n - alm.lambda_n) <= 2.0 ** -20 * np.pi
    assert abs(a2.omega_n - alm.omega_n) <= 2.0 ** -15 * np.pi
    assert abs(a2.t_lambda - alm.t_lambda) <= 2.0 ** -5
    assert abs(a2.delta_t - alm.delta_t) <= 2.0 ** -9
    assert abs(a2.ecc - alm.ecc) <= 2.0 ** -20
    assert abs(a2.tau_n - alm.tau_n) <= 2.0 ** -18


def test_gnav_frame_stream_carries_almanac():
    """encode_frame_stream pages almanac pairs through strings 6-15 and a
    full receiver-side assembler recovers them."""
    from gnss_sdr_tpu.models.nav import glonass_gnav as gn

    eph = gn.GlonassEphemeris(slot=5, tb_s=40500.0,
                              pos_m=(12e6, -18e6, 11e6),
                              vel_m_s=(1200.0, 800.0, -2500.0),
                              acc_m_s2=(0.0, 0.0, 0.0))
    alms = [GlonassAlmanac(slot=s, freq_slot=k, lambda_n=0.1 * s,
                           t_lambda=1000.0 * s, ecc=0.001, omega_n=0.2,
                           delta_t=-2655.0)
            for s, k in ((3, 5), (9, -2), (17, 4))]
    sym = gn.encode_frame_stream(eph, 40530.0, n_frames=1, almanacs=alms)
    # walk the stream string by string (230 symbols each: 170 meander + 60
    # time-mark at 100 sps... time mark is 30 symbols) -> use the known
    # layout: 170 data + 30 mark per string
    asm = gn.GnavAssembler()
    per = 200
    n_strings = len(sym) // per
    for i in range(n_strings):
        seg = sym[i * per: i * per + 170].astype(np.int8)
        soft = (1 - 2 * seg[0::2].astype(float)) - (1 - 2 * seg[1::2].astype(float))
        bits = (soft < 0).astype(np.uint8)
        res = gn.decode_string(bits)
        if res:
            asm.push(*res)
    assert set(asm.almanacs) == {3, 9, 17}
    assert asm.almanacs[9].freq_slot == -2
    assert asm.ephemeris() is not None


# ---------------------------------------------------------------- Galileo


def _gal_constellation(n: int = 4) -> dict:
    """Realistic Galileo orbits (nominal a/i of the OS constellation) so
    the almanac delta fields stay inside their narrow broadcast ranges."""
    from gnss_sdr_tpu import constants as C
    from gnss_sdr_tpu.models.almanac import (GAL_ALMANAC_I0_REF,
                                             GAL_ALMANAC_SQRT_A_REF)
    from gnss_sdr_tpu.models.ephemeris import KeplerEphemeris

    out = {}
    rng = np.random.default_rng(7)
    for prn in range(1, n + 1):
        out[prn] = KeplerEphemeris(
            prn=prn, week=102, toe=352800.0, toc=352800.0,
            sqrt_a=GAL_ALMANAC_SQRT_A_REF + rng.normal(0, 1.0),
            e=0.0003 + 0.002 * rng.random(),
            m0=rng.uniform(-np.pi, np.pi),
            omega0=rng.uniform(-np.pi, np.pi),
            omega_dot=-5.5e-9 + rng.normal(0, 2e-10),
            omega=rng.uniform(-np.pi, np.pi),
            i0=GAL_ALMANAC_I0_REF + rng.normal(0, 0.01),
            af0=rng.normal(0, 1e-4), af1=rng.normal(0, 1e-12),
            iode=prn, iodc=prn, gm=C.GM_EARTH_GAL)
    return out


def test_galileo_almanac_words_roundtrip():
    """INAV words 7-10 carry 3 almanacs + GGTO; the assembler rebuilds them
    within broadcast quantization (reference galileo_navigation_message.cc
    cases 7-10 / Galileo_E1.h bit tables)."""
    from gnss_sdr_tpu.models.almanac import GalileoAlmanac
    from gnss_sdr_tpu.models.nav import galileo_inav as gi

    ephs = _gal_constellation(3)
    alms = [GalileoAlmanac.from_ephemeris(ephs[p], ioda=5) for p in (1, 2, 3)]
    ggto = (3.2e-9, 1.1e-14, 3600.0 * 50, 102 & 0x3F)
    words = gi.encode_almanac_words(alms, wn_a=alms[0].wna, t0a=alms[0].toa,
                                    ioda=5, ggto=ggto)
    asm = gi.InavAssembler(prn=1)
    for k, w in enumerate(words):
        wt, fields = gi.decode_word(w)
        assert wt == 7 + k
        asm.push(gi.InavPage(wt, fields, first_symbol_index=0))
    assert sorted(asm.almanacs) == [1, 2, 3]
    for a in alms:
        d = asm.almanacs[a.svid]
        assert d.ioda == 5 and d.toa == a.toa and d.wna == a.wna
        assert abs(d.e - a.e) <= 2.0 ** -17
        assert abs(d.delta_sqrt_a - a.delta_sqrt_a) <= 2.0 ** -10
        assert abs(d.m0 - a.m0) <= 2.0 ** -15 * np.pi
        assert abs(d.omega0 - a.omega0) <= 2.0 ** -15 * np.pi
        assert abs(d.af0 - a.af0) <= 2.0 ** -20
        # decoded orbit within a few km of the ephemeris it projects
        # (almanac quantization: ~2.8 km from the 2^-15-semicircle angles)
        for dt in (0.0, 7200.0):
            p1, _ = ephs[a.svid].position_velocity(a.toa + dt)
            p2, _ = d.position_velocity(a.toa + dt)
            assert np.linalg.norm(p1 - p2) < 10_000.0, (a.svid, dt)
    # GST-GPS conversion parameters survive the trip
    a0g, a1g, t0g, wn0g = asm.ggto
    assert abs(a0g - ggto[0]) <= 2.0 ** -36
    assert abs(a1g - ggto[1]) <= 2.0 ** -52
    assert t0g == ggto[2] and wn0g == ggto[3]


def test_inav_stream_carries_almanac():
    """encode_stream rotates almanac batches through words 7-10 and the
    E1-B telemetry assembler recovers both the ephemeris and the
    constellation almanac from the symbol stream."""
    from gnss_sdr_tpu.models.almanac import GalileoAlmanac
    from gnss_sdr_tpu.models.nav import galileo_inav as gi

    ephs = _gal_constellation(5)
    alms = [GalileoAlmanac.from_ephemeris(ephs[p]) for p in sorted(ephs)]
    sym = gi.encode_stream(ephs[1], 352800.0, n_pages=30, almanacs=alms)
    asm = gi.InavAssembler(prn=1)
    for k in range(len(sym) // 500):
        res = gi.decode_page(1.0 - 2.0 * sym[k * 500:(k + 1) * 500].astype(float))
        assert res is not None
        asm.push(gi.InavPage(res[0], res[1], first_symbol_index=k * 500))
    assert asm.ephemeris() is not None
    # 30 pages = 3 cycles of (1,2,3,4,5,7,8,9,10,5) -> batches 1-3 and 4-5
    assert sorted(asm.almanacs) == [1, 2, 3, 4, 5]
    assert asm.almanacs[4].svid == 4


# ----------------------------------------------------------------- BeiDou


def test_beidou_almanac_page_roundtrip():
    """D1 SF4/SF5 almanac pages encode->BCH->decode within quantization
    (reference beidou_dnav_navigation_message.cc cases 4/5 + the
    Beidou_DNAV.h D1_*_ALMANAC tables), SF5 page 8 applies WNa."""
    from gnss_sdr_tpu import constants as C
    from gnss_sdr_tpu.models.almanac import BDS_ALMANAC_I0_REF, BeidouAlmanac
    from gnss_sdr_tpu.models.ephemeris import KeplerEphemeris
    from gnss_sdr_tpu.models.nav import beidou_d1 as d1

    rng = np.random.default_rng(11)

    def bds_eph(prn, geo=False):
        return KeplerEphemeris(
            prn=prn, week=310, toe=352800.0, toc=352800.0,
            sqrt_a=np.sqrt(42.16e6 if geo else 27.9e6),
            e=0.001 + 0.002 * rng.random(),
            m0=rng.uniform(-np.pi, np.pi),
            omega0=rng.uniform(-np.pi, np.pi),
            omega_dot=(-2e-9 if geo else -7e-9),
            omega=rng.uniform(-np.pi, np.pi),
            i0=(0.01 if geo else BDS_ALMANAC_I0_REF + 0.02),
            af0=rng.normal(0, 1e-4), af1=rng.normal(0, 1e-11),
            gm=C.GM_EARTH_BDS)

    asm = d1.D1Assembler(prn=6)
    cases = [(8, False, 4, 8),    # MEO SV 8 on SF4 page 8 (PRN>5: MEO/IGSO)
             (1, True, 4, 1),     # GEO SV 1 on SF4 page 1
             (27, False, 5, 3)]   # SV 27 on SF5 page 3
    ephs = {}
    for sv, geo, fraid, pnum in cases:
        eph = bds_eph(sv, geo)
        ephs[sv] = eph
        alm = BeidouAlmanac.from_ephemeris(eph)
        out = d1.decode_subframe(
            d1.encode_almanac_page(fraid, 352806.0, alm, pnum))
        assert out is not None and out[0] == fraid
        asm.push(out[0], out[2])
    ref = d1.decode_subframe(
        d1.encode_almanac_reference_page(352812.0, 352800.0, wna=310 & 0xFF))
    assert ref is not None and ref[2]["pnum"] == 8
    asm.push(ref[0], ref[2])
    assert sorted(asm.almanacs) == [1, 8, 27]
    for sv, geo, _, _ in cases:
        a = asm.almanacs[sv]
        assert a.wna == 310 & 0xFF
        assert abs(a.toa - 352800.0) <= 2048.0
        # decoded orbit within km of the ephemeris it projects (coarsest
        # field: the 2^-23-semicircle angles ~ 5 m, delta_i 2^-19 sc ~ 160 m
        # ... dominated by the dropped harmonic terms)
        for dt in (0.0, 7200.0):
            p1, _ = ephs[sv].position_velocity(a.toa + dt)
            p2, _ = a.position_velocity(a.toa + dt)
            assert np.linalg.norm(p1 - p2) < 5_000.0, (sv, dt)


def test_beidou_assembler_ignores_empty_pages():
    from gnss_sdr_tpu.models.nav import beidou_d1 as d1

    asm = d1.D1Assembler(prn=6)
    # an all-zero SF4 page (sqrt_a = 0) must not create a record
    sf = d1.decode_subframe(d1.encode_almanac_reference_page(
        352812.0, 352800.0, wna=0))
    asm.push(sf[0], sf[2])
    out = d1.decode_subframe(d1.encode_subframe(1, 352800.0,
                                                _gal_constellation(1)[1]))
    assert out is not None
    assert asm.almanacs == {}


def test_beidou_health_pages():
    """SF5 pages 7/8 carry the 30-SV health words; the assembler applies
    them to collected almanac records (reference almanacHealth decode)."""
    from gnss_sdr_tpu.models.almanac import BeidouAlmanac
    from gnss_sdr_tpu.models.nav import beidou_d1 as d1

    asm = d1.D1Assembler(prn=6)
    alm = BeidouAlmanac(prn=8, sqrt_a=5282.0, toa=352256.0)
    out = d1.decode_subframe(d1.encode_almanac_page(4, 352806.0, alm, 8))
    asm.push(out[0], out[2])
    healths = {8: 0x100, 27: 3}
    p7 = d1.decode_subframe(d1.encode_health_page(352812.0, healths))
    assert p7 is not None and p7[2]["pnum"] == 7
    asm.push(p7[0], p7[2])
    p8 = d1.decode_subframe(d1.encode_almanac_reference_page(
        352818.0, 352256.0, wna=310 & 0xFF, healths=healths))
    asm.push(p8[0], p8[2])
    assert asm.health[8] == 0x100 and asm.health[27] == 3
    assert asm.health[1] == 0 and asm.health[30] == 0
    assert asm.almanacs[8].health == 0x100
    # a later almanac page for an SV with known health inherits it
    alm27 = BeidouAlmanac(prn=27, sqrt_a=5282.0, toa=352256.0)
    out = d1.decode_subframe(d1.encode_almanac_page(5, 352824.0, alm27, 3))
    asm.push(out[0], out[2])
    assert asm.almanacs[27].health == 3 and asm.almanacs[27].wna == 310 & 0xFF


def test_beidou_scenario_broadcasts_almanac():
    """build_beidou_b1i_scenario(almanac_pages=True) produces a D1 bit
    stream whose SF4/SF5 pages rebuild the visible constellation's almanac
    (generator source for BDS almanac-bearing captures)."""
    from gnss_sdr_tpu.models.nav import beidou_d1 as d1

    sc = scen.build_beidou_b1i_scenario(duration_s=150.0, n_sats=4,
                                        almanac_pages=True)
    sym = sc.sats[0].data_bits            # +/-1 symbols, 1 bit per symbol
    bits = ((1.0 - sym) / 2.0).astype(np.uint8)
    asm = d1.D1Assembler(prn=sc.prns[0])
    n_sf = len(bits) // 300
    decoded = 0
    for k in range(n_sf):
        out = d1.decode_subframe(bits[k * 300:(k + 1) * 300])
        assert out is not None, k
        asm.push(out[0], out[2])
        decoded += 1
    assert decoded >= 25
    assert asm.ephemeris() is not None
    got = set(asm.almanacs)
    assert set(sc.prns) & got == set(sc.prns), (sc.prns, got)
    assert all(a.wna == asm.alm_wna for a in asm.almanacs.values())


def test_warm_start_prioritizes_visible_satellites():
    """With a stored position/time and almanac, the acquisition candidate
    pool is reordered: visible satellites first (descending elevation),
    set satellites at the back (reference ControlThread::get_visible_sats
    feeding GNSSFlowgraph::priorize_satellites)."""
    from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig

    ephs = constellation.almanac_constellation()
    rcv = geodesy.geodetic_to_ecef(*TRUE_LLH)
    t = 352800.0
    rx = Receiver(ReceiverConfig(signal="1C", fs=1.023e6, n_channels=2))
    for p, e in ephs.items():
        rx.almanacs[("G", p)] = GpsAlmanac.from_ephemeris(e)
    rx.assist_pos = rcv
    rx.assist_tow = t
    g = rx.groups[0]
    order = rx._prioritize_candidates(g, list(g.acq_pool))
    vis = constellation.visible_sats(ephs, rcv, t, el_mask_deg=5.0)
    vis_prns = [p for p, _, _ in vis]
    # the visible set leads the pool, in elevation order
    assert order[: len(vis_prns)] == vis_prns
    # everything below -5 deg sits at the back
    els = {}
    for p, e in ephs.items():
        pos, _ = e.position_velocity(t)
        els[p] = np.rad2deg(geodesy.az_el(rcv, pos)[1])
    n_set = sum(1 for e in els.values() if e < -5.0)
    assert all(els[p] < -5.0 for p in order[-n_set:])
    # no assistance state -> order untouched
    rx2 = Receiver(ReceiverConfig(signal="1C", fs=1.023e6, n_channels=2))
    g2 = rx2.groups[0]
    assert rx2._prioritize_candidates(g2, list(g2.acq_pool)) == list(g2.acq_pool)
