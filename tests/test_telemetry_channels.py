"""Telemetry channel decoders driven by synthetic prompt streams.

Tests the symbol-domain chain (sync, FEC, framing) for L2C CNAV, GLONASS
GNAV and BeiDou D1 without full IQ simulation: prompts are generated exactly
as the tracking engine would emit them (chip convention: bit b -> +-(1-2b)*A
plus noise), including an arbitrary stream start offset and polarity flip.
"""

import numpy as np
import pytest

from gnss_sdr_tpu.models.nav import beidou_d1, glonass_gnav, gps_cnav
from gnss_sdr_tpu.receiver.telemetry import (BeidouB1ITelemetry,
                                             GlonassL1CaTelemetry,
                                             GpsL2CMTelemetry, make_telemetry)

from test_lnav import sample_ephemeris


def _feed(tlm, prompts, chunk=137, epoch0=0):
    e = epoch0 + np.arange(len(prompts), dtype=np.int64)
    for i in range(0, len(prompts), chunk):
        tlm.push(e[i:i + chunk], prompts[i:i + chunk])


def test_l2c_cnav_telemetry():
    eph = sample_ephemeris()
    eph.toe = eph.toc = 352800.0
    rng = np.random.default_rng(3)
    sym = gps_cnav.encode_symbol_stream(eph, 352800.0, 6)  # 6 messages, 72 s
    amp = 120.0
    prompts = -amp * (2.0 * sym.astype(np.float64) - 1.0)  # chip convention
    prompts += rng.normal(0, 20.0, len(prompts))
    start = 213  # arbitrary mid-stream start
    tlm = GpsL2CMTelemetry(prn=7)
    _feed(tlm, -prompts[start:])  # polarity flip too
    assert tlm.message_count >= 3, tlm.message_count
    assert tlm.have_tow
    dec = tlm.ephemeris()
    assert dec is not None
    assert abs(dec.sqrt_a - eph.sqrt_a) < 1e-5
    # transmit-time mapping: message k starts at tow_start + 12k; symbol s of
    # the stream is at tow_start + s * 0.02; epoch e (20 ms CM period) maps to
    # tow_start + (start + e)*0.02
    t = tlm.transmit_time(100, 0.0)
    expect = 352800.0 + (start + 100 - int(tlm._epochs[0])) * 0.02 - start * 0.0
    # direct check: anchor consistency
    assert t == pytest.approx(352800.0 + (start + 100) * 0.02, abs=1e-9)


def test_glonass_gnav_telemetry():
    eph = glonass_gnav.GlonassEphemeris(
        slot=5, tb_s=11700.0, pos_m=(1.0e7, 1.5e7, 1.7e7),
        vel_m_s=(-1324.25, 2145.73, -1054.12),
        acc_m_s2=(1.9e-6, -0.9e-6, 2.8e-6), gamma_n=6.4e-10, tau_n=-8.3e-5)
    sym = glonass_gnav.encode_symbol_stream(eph, n_frames=3)  # 12 strings
    rng = np.random.default_rng(5)
    # expand 100 sps slots to 1 kHz prompts (10 epochs per slot)
    amp = 90.0
    slot_amp = amp * (1.0 - 2.0 * sym.astype(np.float64))
    prompts = np.repeat(slot_amp, 10) + rng.normal(0, 25.0, len(sym) * 10)
    start = 1234
    tlm = GlonassL1CaTelemetry(prn=5)
    _feed(tlm, prompts[start:], epoch0=777)
    assert tlm.string_count >= 8, tlm.string_count
    dec = tlm.ephemeris()
    assert dec is not None
    np.testing.assert_allclose(dec.pos_m, eph.pos_m, atol=0.5)
    assert dec.tb_s == eph.tb_s
    assert tlm.have_tow


def test_beidou_d1_telemetry():
    eph = sample_ephemeris()
    eph.toe = eph.toc = 352800.0
    subframes = [beidou_d1.encode_subframe(f, 352800.0 + 6.0 * k, eph)
                 for k, f in enumerate([1, 2, 3, 4, 5, 1, 2, 3])]
    bits = np.concatenate(subframes)
    nh = BeidouB1ITelemetry.NH20.astype(np.float64)
    amp = 80.0
    # prompts: data bit (chip conv) * NH chip (chip conv), 20 epochs per bit
    data_amp = amp * (1.0 - 2.0 * bits.astype(np.float64))
    prompts = (np.repeat(data_amp, 20).reshape(-1, 20)
               * (1.0 - 2.0 * nh)[None, :]).reshape(-1)
    rng = np.random.default_rng(7)
    prompts = prompts + rng.normal(0, 18.0, len(prompts))
    start = 431
    tlm = BeidouB1ITelemetry(prn=13)
    _feed(tlm, -prompts[start:], epoch0=55)
    assert tlm.subframe_count >= 4, tlm.subframe_count
    assert tlm.have_tow
    dec = tlm.ephemeris()
    assert dec is not None
    assert abs(dec.sqrt_a - eph.sqrt_a) <= 2.0 ** -19
    assert dec.toe == eph.toe


def test_make_telemetry_factory():
    assert make_telemetry("2S", 1).__class__.__name__ == "GpsL2CMTelemetry"
    assert make_telemetry("1G", 1).__class__.__name__ == "GlonassL1CaTelemetry"
    assert make_telemetry("B1", 13).__class__.__name__ == "BeidouB1ITelemetry"
    assert make_telemetry("B1", 3).__class__.__name__ == "BeidouB1IGeoTelemetry"
    with pytest.raises(NotImplementedError):
        make_telemetry("XX", 1)


def test_galileo_e5a_fnav_telemetry():
    from gnss_sdr_tpu import constants
    from gnss_sdr_tpu.models.nav import galileo_fnav
    from gnss_sdr_tpu.receiver.telemetry import GalileoE5aTelemetry

    eph = sample_ephemeris()
    eph.toe = 352800.0
    tow0 = 352800.0
    sym01 = galileo_fnav.encode_stream(eph, tow0, n_pages=6, wn=eph.week)
    # 1 ms prompts: symbol amplitude (bit conv) * CS20 chip, 20 epochs/symbol
    cs = np.array([int(b) for b in constants.GALILEO_E5A_I.secondary_code])
    amp = 70.0
    sym_amp = amp * (1.0 - 2.0 * sym01.astype(np.float64))
    prompts = (np.repeat(sym_amp, 20).reshape(-1, 20)
               * (1.0 - 2.0 * cs)[None, :]).reshape(-1)
    rng = np.random.default_rng(11)
    prompts = prompts + rng.normal(0, 15.0, len(prompts))
    start = 777      # arbitrary mid-stream start (not symbol aligned)
    tlm = GalileoE5aTelemetry(prn=eph.prn)
    _feed(tlm, prompts[start:], epoch0=123)
    assert tlm.page_count >= 4, tlm.page_count
    assert tlm.have_tow
    dec = tlm.ephemeris()
    assert dec is not None
    assert abs(dec.sqrt_a - eph.sqrt_a) <= 2.0 ** -19
    assert dec.toe == eph.toe
    # transmit-time anchor: the page that set tow_ref started at a known
    # multiple of 10 s; spot-check epoch->TOW mapping consistency
    t = tlm.transmit_time(tlm.tow_ref.epoch, 0.0)
    assert t % 10.0 == 0.0


def test_sbas_codes_and_message_roundtrip():
    from gnss_sdr_tpu.models import codes as codes_mod
    from gnss_sdr_tpu.models.nav import sbas

    # SBAS PRNs generate valid, distinct Gold codes (DO-229 family)
    c120 = codes_mod.gps_l1ca_code(120)
    c138 = codes_mod.gps_l1ca_code(138)
    assert len(c120) == 1023 and set(np.unique(c120)) == {-1.0, 1.0}
    assert not np.array_equal(c120, c138)
    # balanced like any Gold code (sum = +-1 or small)
    assert abs(c120.sum()) <= 65

    rng = np.random.default_rng(7)
    msgs = [(2, rng.integers(0, 2, 212).astype(np.uint8)) for _ in range(4)]
    sym01 = sbas.encode_stream(msgs)
    soft = -(1.0 - 2.0 * sym01.astype(np.float64))   # +amp == bit1
    found = sbas.decode_stream(soft)
    assert len(found) >= 3
    offs = [o for o, _, _ in found]
    assert all(o2 - o1 == 250 for o1, o2 in zip(offs, offs[1:]))
    for k, (_, mtype, data) in enumerate(found):
        assert mtype == 2
        np.testing.assert_array_equal(data, msgs[k][1])


def test_sbas_telemetry_channel():
    from gnss_sdr_tpu.models.nav import sbas
    from gnss_sdr_tpu.receiver.telemetry import SbasL1Telemetry, make_telemetry

    assert isinstance(make_telemetry("1C", 122), SbasL1Telemetry)
    assert make_telemetry("1C", 22).__class__.__name__ == "GpsL1CaTelemetry"

    # craft type-2 fast corrections with known PRCs
    data = np.zeros(212, np.uint8)
    data[0:2] = [0, 1]                         # IODF
    prc_q = int(round(12.5 / 0.125))           # slot 0: +12.5 m
    for i in range(12):
        data[4 + i] = (prc_q >> (11 - i)) & 1
    # all UDREI = 5 (monitored)
    for k in range(13):
        v = 5
        for i in range(4):
            data[160 + 4 * k + i] = (v >> (3 - i)) & 1
    msgs = [(2, data)] * 5
    sym01 = sbas.encode_stream(msgs)
    amp = 60.0
    sym_amp = amp * (1.0 - 2.0 * sym01.astype(np.float64))
    prompts = np.repeat(sym_amp, 2)            # 2 epochs per symbol
    rng = np.random.default_rng(9)
    prompts = prompts + rng.normal(0, 12.0, len(prompts))
    tlm = SbasL1Telemetry(prn=120)
    _feed(tlm, prompts[3:], epoch0=41)         # mid-symbol start
    assert tlm.message_count >= 2, tlm.message_count
    assert abs(tlm.fast_corrections[0] - 12.5) < 1e-9
    assert not tlm.have_tow


def test_beidou_d2_geo_telemetry():
    from gnss_sdr_tpu.models.nav import beidou_d2
    from gnss_sdr_tpu.receiver.telemetry import BeidouB1IGeoTelemetry
    eph = sample_ephemeris()
    eph.toe = eph.toc = 352800.0
    bits = beidou_d2.encode_stream(eph, 352800.0, n_pages=14)
    amp = 70.0
    data_amp = amp * (1.0 - 2.0 * bits.astype(np.float64))
    prompts = np.repeat(data_amp, 2)            # 2 epochs per 500 bps bit
    rng = np.random.default_rng(3)
    prompts = -(prompts + rng.normal(0, 14.0, len(prompts)))  # flipped pol
    tlm = BeidouB1IGeoTelemetry(prn=3)
    _feed(tlm, prompts[101:], epoch0=77)        # mid-bit start
    assert tlm.page_count >= 10, tlm.page_count
    assert tlm.have_tow
    # page-start times resolve to 0.6 s sub-second boundaries of the cycle
    assert abs((tlm.tow_ref.tow_s - 352800.0) % 0.6) < 1e-9 or \
           abs((tlm.tow_ref.tow_s - 352800.0) % 0.6 - 0.6) < 1e-9
    dec = tlm.ephemeris()
    assert dec is not None
    assert abs(dec.sqrt_a - eph.sqrt_a) <= 2.0 ** -19
    assert dec.toe == eph.toe


def test_gps_l5_cnav_telemetry():
    """L5I: NH10 overlay sync + 100 sps CNAV (6 s messages) -> ephemeris.

    Reference analog: gps_l5_telemetry_decoder_gs.cc (NH sync + cnav decode).
    """
    from gnss_sdr_tpu import constants
    from gnss_sdr_tpu.receiver.telemetry import GpsL5ITelemetry

    eph = sample_ephemeris()
    eph.toe = eph.toc = 352800.0
    sym = gps_cnav.encode_symbol_stream(eph, 352800.0, 6, period_s=6.0)
    nh = np.array([int(b) for b in constants.GPS_L5_I.secondary_code],
                  np.float64)
    # prompts: symbol (chip conv) * NH chip (chip conv), 10 epochs per symbol
    sym_amp = 100.0 * (1.0 - 2.0 * sym.astype(np.float64))
    prompts = (np.repeat(sym_amp, 10).reshape(-1, 10)
               * (1.0 - 2.0 * nh)[None, :]).reshape(-1)
    rng = np.random.default_rng(11)
    prompts = prompts + rng.normal(0, 22.0, len(prompts))
    start = 337  # arbitrary mid-stream start, polarity flipped
    tlm = GpsL5ITelemetry(prn=9)
    _feed(tlm, -prompts[start:], epoch0=91)
    assert tlm.message_count >= 3, tlm.message_count
    assert tlm.have_tow
    dec = tlm.ephemeris()
    assert dec is not None
    assert abs(dec.sqrt_a - eph.sqrt_a) < 1e-5
    assert dec.toe == eph.toe
    # transmit-time anchor: symbol s sits at tow_start + s * 0.01; the first
    # pushed epoch (index 91) is stream epoch `start`, i.e. t = start * 1 ms
    t = tlm.transmit_time(91 + 100, 0.0)
    assert t == pytest.approx(352800.0 + (start + 100) * 1e-3, abs=1e-9)


def test_make_telemetry_l5():
    assert make_telemetry("L5", 9).__class__.__name__ == "GpsL5ITelemetry"
