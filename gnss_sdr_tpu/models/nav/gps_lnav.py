"""GPS LNAV (L1 C/A 50 bps) navigation message encoder + decoder.

Decoder fills the role of the reference's
``src/core/system_parameters/gps_navigation_message.cc`` (subframe decode,
word parity) feeding ``gps_l1_ca_telemetry_decoder_gs.cc``; the encoder is the
test oracle (the reference relies on the external gnss-sim for that).

Bit conventions: bits are numpy uint8 arrays of 0/1 in transmission order.
Word layout per IS-GPS-200 section 20.3.2/20.3.3: 10 words x 30 bits per
subframe; each word = 24 data bits (XOR'd with previous D30) + 6 parity bits.
Angles are transmitted in semicircles; decode converts to radians.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from gnss_sdr_tpu.models.ephemeris import IonoParams, KeplerEphemeris, UtcParams

PREAMBLE = np.array([1, 0, 0, 0, 1, 0, 1, 1], dtype=np.uint8)
PI = 3.1415926535898  # IS-GPS-200 fixed pi

# parity equations (IS-GPS-200 Table 20-XIV): data-bit indices (1-based)
# participating in each of D25..D30; first element tells which of
# (D29*, D30*) seeds the XOR.
_PARITY = [
    ("D29", (1, 2, 3, 5, 6, 10, 11, 12, 13, 14, 17, 18, 20, 23)),
    ("D30", (2, 3, 4, 6, 7, 11, 12, 13, 14, 15, 18, 19, 21, 24)),
    ("D29", (1, 3, 4, 5, 7, 8, 12, 13, 14, 15, 16, 19, 20, 22)),
    ("D30", (2, 4, 5, 6, 8, 9, 13, 14, 15, 16, 17, 20, 21, 23)),
    ("D30", (1, 3, 5, 6, 7, 9, 10, 14, 15, 16, 17, 18, 21, 22, 24)),
    ("D29", (3, 5, 6, 8, 9, 10, 11, 13, 15, 19, 22, 23, 24)),
]


def _parity_bits(d: np.ndarray, d29s: int, d30s: int) -> np.ndarray:
    """Compute D25..D30 from source data bits d[0..23] and previous parity."""
    out = np.zeros(6, dtype=np.uint8)
    seed = {"D29": d29s, "D30": d30s}
    for k, (s, idxs) in enumerate(_PARITY):
        v = seed[s]
        for i in idxs:
            v ^= d[i - 1]
        out[k] = v
    return out


def encode_word(source24: np.ndarray, d29s: int, d30s: int,
                solve_tail: bool = False) -> np.ndarray:
    """Encode one 30-bit word. If solve_tail, source bits 23-24 are chosen so
    that D29 = D30 = 0 (words 2 and 10)."""
    d = np.array(source24, dtype=np.uint8).copy()
    if solve_tail:
        d[23] = 0
        d[22] = 0
        p = _parity_bits(d, d29s, d30s)
        d[23] = p[4]                     # force D29 = 0 (d24 appears in D29)
        p = _parity_bits(d, d29s, d30s)
        d[22] = p[5]                     # force D30 = 0 (d23 appears in D30)
    p = _parity_bits(d, d29s, d30s)
    tx = np.concatenate([d ^ d30s, p])
    return tx


def check_and_decode_word(tx30: np.ndarray, d29s: int, d30s: int):
    """Validate parity of a transmitted word; returns (ok, source24bits)."""
    d = (tx30[:24] ^ d30s).astype(np.uint8)
    p = _parity_bits(d, d29s, d30s)
    ok = bool(np.array_equal(p, tx30[24:30]))
    return ok, d


# ---------------------------------------------------------------------------
# bit-field packing helpers
# ---------------------------------------------------------------------------


def _u2b(value: int, n: int) -> np.ndarray:
    """Unsigned int -> n bits MSB first."""
    if value < 0 or value >= (1 << n):
        raise ValueError(f"value {value} out of range for u{n}")
    return np.array([(value >> (n - 1 - i)) & 1 for i in range(n)], dtype=np.uint8)


def _s2b(value: int, n: int) -> np.ndarray:
    """Signed int -> n bits two's complement MSB first."""
    if value < -(1 << (n - 1)) or value >= (1 << (n - 1)):
        raise ValueError(f"value {value} out of range for s{n}")
    return _u2b(value & ((1 << n) - 1), n)


def _b2u(bits: np.ndarray) -> int:
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v


def _b2s(bits: np.ndarray) -> int:
    v = _b2u(bits)
    n = len(bits)
    if v >= (1 << (n - 1)):
        v -= 1 << n
    return v


def _q(value: float, scale: float, n: int, signed=True) -> np.ndarray:
    """Quantize value/scale to n bits."""
    q = int(round(value / scale))
    return _s2b(q, n) if signed else _u2b(q, n)


# ---------------------------------------------------------------------------
# Subframe encoding
# ---------------------------------------------------------------------------


def _tlm_word() -> np.ndarray:
    d = np.zeros(24, dtype=np.uint8)
    d[:8] = PREAMBLE
    return d


def _how_word(tow_next_s: float, subframe_id: int) -> np.ndarray:
    d = np.zeros(24, dtype=np.uint8)
    tow_count = int(round(tow_next_s / 6.0)) % 100800
    d[:17] = _u2b(tow_count, 17)
    d[19:22] = _u2b(subframe_id, 3)
    return d


def encode_almanac_page(sfid: int, tow_this_s: float, alm) -> np.ndarray:
    """Encode one SF4/SF5 almanac page for ``alm`` (a GpsAlmanac).

    IS-GPS-200 20.3.3.5.1.2 / Figure 20-1 sheet 4: SF5 pages 1-24 carry
    almanacs for PRN 1-24 (SV ID = PRN), SF4 pages carry PRN 25-32.
    Reference decode analog: ``Gps_Navigation_Message`` subframe 4/5
    almanac branches (gps_navigation_message.cc).
    """
    sc = PI
    words_data = [np.zeros(24, dtype=np.uint8) for _ in range(10)]
    words_data[0] = _tlm_word()
    words_data[1] = _how_word(tow_this_s + 6.0, sfid)
    w3 = words_data[2]
    w3[:2] = _u2b(1, 2)                        # data ID
    w3[2:8] = _u2b(alm.prn & 0x3F, 6)          # SV ID = PRN
    w3[8:24] = _q(alm.e, 2.0 ** -21, 16, signed=False)
    w4 = words_data[3]
    w4[:8] = _q(alm.toa, 2.0 ** 12, 8, signed=False)
    w4[8:24] = _q(alm.delta_i / sc, 2.0 ** -19, 16)
    w5 = words_data[4]
    w5[:16] = _q(alm.omega_dot / sc, 2.0 ** -38, 16)
    w5[16:24] = _u2b(alm.health & 0xFF, 8)
    words_data[5][:24] = _q(alm.sqrt_a, 2.0 ** -11, 24, signed=False)
    words_data[6][:24] = _q(alm.omega0 / sc, 2.0 ** -23, 24)
    words_data[7][:24] = _q(alm.omega / sc, 2.0 ** -23, 24)
    words_data[8][:24] = _q(alm.m0 / sc, 2.0 ** -23, 24)
    w10 = words_data[9]
    # af0 is 11 bits split MSB(8)+LSB(3) around the 11 af1 bits
    af0_bits = _q(alm.af0, 2.0 ** -20, 11)
    w10[:8] = af0_bits[:8]
    w10[8:19] = _q(alm.af1, 2.0 ** -38, 11)
    w10[19:22] = af0_bits[8:]
    return _seal_subframe(words_data)


def encode_almanac_reference_page(tow_this_s: float, toa: float,
                                  wna: int) -> np.ndarray:
    """SF5 page 25 (SV ID 51): almanac reference time toa + WNa."""
    words_data = [np.zeros(24, dtype=np.uint8) for _ in range(10)]
    words_data[0] = _tlm_word()
    words_data[1] = _how_word(tow_this_s + 6.0, 5)
    w3 = words_data[2]
    w3[:2] = _u2b(1, 2)
    w3[2:8] = _u2b(51, 6)
    w3[8:16] = _q(toa, 2.0 ** 12, 8, signed=False)
    w3[16:24] = _u2b(wna & 0xFF, 8)
    return _seal_subframe(words_data)


def _seal_subframe(words_data: list[np.ndarray]) -> np.ndarray:
    """Chain parity through 10 prepared 24-bit words into a 300-bit
    subframe (words 2 and 10 tail-solved so D29*=D30*=0)."""
    tx = np.zeros(300, dtype=np.uint8)
    d29s, d30s = 0, 0
    for wi in range(10):
        solve = wi in (1, 9)
        word = encode_word(words_data[wi], d29s, d30s, solve_tail=solve)
        tx[wi * 30:(wi + 1) * 30] = word
        d29s, d30s = int(word[28]), int(word[29])
    return tx


def encode_subframe(sfid: int, tow_this_s: float, eph: KeplerEphemeris,
                    iono: IonoParams | None = None,
                    utc: UtcParams | None = None) -> np.ndarray:
    """Encode one 300-bit subframe starting at time tow_this_s.

    Subframes 1-3 carry ``eph``; subframe 4 carries iono/UTC (page 18);
    bare subframe 5 is a parity-valid filler (use
    :func:`encode_almanac_page` for almanac-bearing SF4/5 pages).
    """
    words_data = [np.zeros(24, dtype=np.uint8) for _ in range(10)]
    words_data[0] = _tlm_word()
    words_data[1] = _how_word(tow_this_s + 6.0, sfid)
    sc = PI  # semicircle -> rad was applied at decode; encode divides by pi

    if sfid == 1:
        w = words_data[2]
        w[:10] = _u2b(eph.week % 1024, 10)
        w[10:12] = _u2b(1, 2)                  # code on L2: C/A
        w[12:16] = _u2b(eph.ura & 0xF, 4)
        w[16:22] = _u2b(eph.health & 0x3F, 6)
        w[22:24] = _u2b((eph.iodc >> 8) & 0x3, 2)
        words_data[6][16:24] = _q(eph.tgd, 2.0 ** -31, 8)
        w8 = words_data[7]
        w8[:8] = _u2b(eph.iodc & 0xFF, 8)
        w8[8:24] = _q(eph.toc, 16.0, 16, signed=False)
        w9 = words_data[8]
        w9[:8] = _q(eph.af2, 2.0 ** -55, 8)
        w9[8:24] = _q(eph.af1, 2.0 ** -43, 16)
        words_data[9][:22] = _q(eph.af0, 2.0 ** -31, 22)
    elif sfid == 2:
        w = words_data[2]
        w[:8] = _u2b(eph.iode & 0xFF, 8)
        w[8:24] = _q(eph.crs, 2.0 ** -5, 16)
        w4 = words_data[3]
        w4[:16] = _q(eph.delta_n / sc, 2.0 ** -43, 16)
        m0 = _q(eph.m0 / sc, 2.0 ** -31, 32)
        w4[16:24] = m0[:8]
        words_data[4][:24] = m0[8:]
        w6 = words_data[5]
        w6[:16] = _q(eph.cuc, 2.0 ** -29, 16)
        e_b = _q(eph.e, 2.0 ** -33, 32, signed=False)
        w6[16:24] = e_b[:8]
        words_data[6][:24] = e_b[8:]
        w8 = words_data[7]
        w8[:16] = _q(eph.cus, 2.0 ** -29, 16)
        sa = _q(eph.sqrt_a, 2.0 ** -19, 32, signed=False)
        w8[16:24] = sa[:8]
        words_data[8][:24] = sa[8:]
        words_data[9][:16] = _q(eph.toe, 16.0, 16, signed=False)
    elif sfid == 3:
        w = words_data[2]
        w[:16] = _q(eph.cic, 2.0 ** -29, 16)
        om0 = _q(eph.omega0 / sc, 2.0 ** -31, 32)
        w[16:24] = om0[:8]
        words_data[3][:24] = om0[8:]
        w5 = words_data[4]
        w5[:16] = _q(eph.cis, 2.0 ** -29, 16)
        i0 = _q(eph.i0 / sc, 2.0 ** -31, 32)
        w5[16:24] = i0[:8]
        words_data[5][:24] = i0[8:]
        w7 = words_data[6]
        w7[:16] = _q(eph.crc, 2.0 ** -5, 16)
        om = _q(eph.omega / sc, 2.0 ** -31, 32)
        w7[16:24] = om[:8]
        words_data[7][:24] = om[8:]
        words_data[8][:24] = _q(eph.omega_dot / sc, 2.0 ** -43, 24)
        w10 = words_data[9]
        w10[:8] = _u2b(eph.iode & 0xFF, 8)
        w10[8:22] = _q(eph.idot / sc, 2.0 ** -43, 14)
    elif sfid == 4:
        w = words_data[2]
        w[:2] = _u2b(1, 2)                    # data ID
        w[2:8] = _u2b(56, 6)                  # SV(page) ID 56 = page 18
        if iono is not None and iono.valid:
            w[8:16] = _q(iono.alpha[0], 2.0 ** -30, 8)
            w[16:24] = _q(iono.alpha[1], 2.0 ** -27, 8)
            w4 = words_data[3]
            w4[:8] = _q(iono.alpha[2], 2.0 ** -24, 8)
            w4[8:16] = _q(iono.alpha[3], 2.0 ** -24, 8)
            w4[16:24] = _q(iono.beta[0], 2.0 ** 11, 8)
            w5 = words_data[4]
            w5[:8] = _q(iono.beta[1], 2.0 ** 14, 8)
            w5[8:16] = _q(iono.beta[2], 2.0 ** 16, 8)
            w5[16:24] = _q(iono.beta[3], 2.0 ** 16, 8)
        if utc is not None and utc.valid:
            words_data[5][:24] = _q(utc.a1, 2.0 ** -50, 24)
            a0 = _q(utc.a0, 2.0 ** -30, 32)
            words_data[6][:24] = a0[:24]
            w8 = words_data[7]
            w8[:8] = a0[24:]
            w8[8:16] = _q(utc.tot, 2.0 ** 12, 8, signed=False)
            w8[16:24] = _u2b(utc.wnt % 256, 8)
            words_data[8][:8] = _s2b(utc.delta_t_ls, 8)
    elif sfid == 5:
        w = words_data[2]
        w[:2] = _u2b(1, 2)
        w[2:8] = _u2b(1, 6)

    return _seal_subframe(words_data)


def encode_frames(eph: KeplerEphemeris, tow_start_s: float, n_subframes: int,
                  iono: IonoParams | None = None,
                  utc: UtcParams | None = None,
                  sfid_cycle: tuple | None = None,
                  almanacs: list | None = None,
                  alm_start: int = 0) -> np.ndarray:
    """Encode a continuous LNAV bit stream of n_subframes starting at
    tow_start_s (a multiple of 6 s). By default the subframe id follows the
    standard TOW grid (1..5 over 30 s); ``sfid_cycle`` overrides the id
    sequence (e.g. (1, 2, 3) to broadcast ephemeris continuously — useful for
    short simulation runs; decoders key off the HOW sfid, not the grid).

    ``almanacs`` (GpsAlmanac list): subframe-4/5 slots then broadcast the
    constellation almanac round-robin, with the toa/WNa reference page
    (SF5 page 25) interleaved — the real SF4/5 paging role."""
    bits = []
    tow = tow_start_s
    alm_idx = alm_start        # page-sequence offset (per-SV stagger)
    for k in range(n_subframes):
        if sfid_cycle is not None:
            sfid = sfid_cycle[k % len(sfid_cycle)]
        else:
            sfid = int(tow / 6.0) % 5 + 1
        if sfid in (4, 5) and almanacs:
            cycle = len(almanacs) + 1
            if alm_idx % cycle == len(almanacs):
                bits.append(encode_almanac_reference_page(
                    tow, almanacs[0].toa, almanacs[0].wna))
            else:
                bits.append(encode_almanac_page(
                    sfid, tow, almanacs[alm_idx % cycle]))
            alm_idx += 1
        else:
            bits.append(encode_subframe(sfid, tow, eph, iono, utc))
        tow += 6.0
    return np.concatenate(bits)


# ---------------------------------------------------------------------------
# Decoding
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Subframe:
    sfid: int
    tow_s: float           # time of start of THIS subframe (s of week)
    fields: dict


def decode_subframe(tx300: np.ndarray) -> Subframe | None:
    """Decode one parity-aligned 300-bit subframe (normal polarity).

    Returns None if any word fails parity or the preamble is absent.
    """
    if not np.array_equal(tx300[:8], PREAMBLE):
        return None
    words = []
    d29s, d30s = 0, 0
    for wi in range(10):
        ok, d = check_and_decode_word(tx300[wi * 30:(wi + 1) * 30], d29s, d30s)
        if not ok:
            return None
        words.append(d)
        d29s = int(tx300[wi * 30 + 28])
        d30s = int(tx300[wi * 30 + 29])

    how = words[1]
    tow_count = _b2u(how[:17])
    sfid = _b2u(how[19:22])
    if not 1 <= sfid <= 5:
        return None
    tow_s = tow_count * 6.0 - 6.0   # HOW holds TOW of *next* subframe
    if tow_s < 0:
        tow_s += 7 * 86400
    f: dict = {}
    sc = PI

    if sfid == 1:
        w3, w7, w8, w9, w10 = words[2], words[6], words[7], words[8], words[9]
        f["week"] = _b2u(w3[:10])
        f["ura"] = _b2u(w3[12:16])
        f["health"] = _b2u(w3[16:22])
        iodc = (_b2u(w3[22:24]) << 8) | _b2u(w8[:8])
        f["iodc"] = iodc
        f["tgd"] = _b2s(w7[16:24]) * 2.0 ** -31
        f["toc"] = _b2u(w8[8:24]) * 16.0
        f["af2"] = _b2s(w9[:8]) * 2.0 ** -55
        f["af1"] = _b2s(w9[8:24]) * 2.0 ** -43
        f["af0"] = _b2s(w10[:22]) * 2.0 ** -31
    elif sfid == 2:
        w3, w4, w5, w6, w7, w8, w9, w10 = words[2:10]
        f["iode"] = _b2u(w3[:8])
        f["crs"] = _b2s(w3[8:24]) * 2.0 ** -5
        f["delta_n"] = _b2s(w4[:16]) * 2.0 ** -43 * sc
        f["m0"] = _b2s(np.concatenate([w4[16:24], w5[:24]])) * 2.0 ** -31 * sc
        f["cuc"] = _b2s(w6[:16]) * 2.0 ** -29
        f["e"] = _b2u(np.concatenate([w6[16:24], w7[:24]])) * 2.0 ** -33
        f["cus"] = _b2s(w8[:16]) * 2.0 ** -29
        f["sqrt_a"] = _b2u(np.concatenate([w8[16:24], w9[:24]])) * 2.0 ** -19
        f["toe"] = _b2u(w10[:16]) * 16.0
    elif sfid == 3:
        w3, w4, w5, w6, w7, w8, w9, w10 = words[2:10]
        f["cic"] = _b2s(w3[:16]) * 2.0 ** -29
        f["omega0"] = _b2s(np.concatenate([w3[16:24], w4[:24]])) * 2.0 ** -31 * sc
        f["cis"] = _b2s(w5[:16]) * 2.0 ** -29
        f["i0"] = _b2s(np.concatenate([w5[16:24], w6[:24]])) * 2.0 ** -31 * sc
        f["crc"] = _b2s(w7[:16]) * 2.0 ** -5
        f["omega"] = _b2s(np.concatenate([w7[16:24], w8[:24]])) * 2.0 ** -31 * sc
        f["omega_dot"] = _b2s(w9[:24]) * 2.0 ** -43 * sc
        f["iode3"] = _b2u(w10[:8])
        f["idot"] = _b2s(w10[8:22]) * 2.0 ** -43 * sc
    elif sfid in (4, 5):
        w3 = words[2]
        page_id = _b2u(w3[2:8])
        f["page_id"] = page_id
        if 1 <= page_id <= 32:
            # almanac page (IS-GPS-200 20.3.3.5.1.2): SV ID = PRN
            w4, w5 = words[3], words[4]
            w10 = words[9]
            af0 = _b2s(np.concatenate([w10[:8], w10[19:22]])) * 2.0 ** -20
            f["almanac"] = dict(
                prn=page_id,
                e=_b2u(w3[8:24]) * 2.0 ** -21,
                toa=_b2u(w4[:8]) * 2.0 ** 12,
                delta_i=_b2s(w4[8:24]) * 2.0 ** -19 * sc,
                omega_dot=_b2s(w5[:16]) * 2.0 ** -38 * sc,
                health=_b2u(w5[16:24]),
                sqrt_a=_b2u(words[5][:24]) * 2.0 ** -11,
                omega0=_b2s(words[6][:24]) * 2.0 ** -23 * sc,
                omega=_b2s(words[7][:24]) * 2.0 ** -23 * sc,
                m0=_b2s(words[8][:24]) * 2.0 ** -23 * sc,
                af0=af0,
                af1=_b2s(w10[8:19]) * 2.0 ** -38)
        elif page_id == 51:
            # SF5 page 25: toa / WNa reference
            f["alm_toa"] = _b2u(w3[8:16]) * 2.0 ** 12
            f["alm_wna"] = _b2u(w3[16:24])
        if sfid == 4 and page_id == 56:
            w4, w5 = words[3], words[4]
            f["iono_alpha"] = (
                _b2s(w3[8:16]) * 2.0 ** -30, _b2s(w3[16:24]) * 2.0 ** -27,
                _b2s(w4[:8]) * 2.0 ** -24, _b2s(w4[8:16]) * 2.0 ** -24)
            f["iono_beta"] = (
                _b2s(w4[16:24]) * 2.0 ** 11, _b2s(w5[:8]) * 2.0 ** 14,
                _b2s(w5[8:16]) * 2.0 ** 16, _b2s(w5[16:24]) * 2.0 ** 16)
            f["utc_a1"] = _b2s(words[5][:24]) * 2.0 ** -50
            f["utc_a0"] = _b2s(np.concatenate([words[6][:24], words[7][:8]])) * 2.0 ** -30
            f["utc_tot"] = _b2u(words[7][8:16]) * 2.0 ** 12
            f["utc_wnt"] = _b2u(words[7][16:24])
            f["utc_dtls"] = _b2s(words[8][:8])

    return Subframe(sfid=sfid, tow_s=tow_s, fields=f)


class LnavAssembler:
    """Accumulates decoded subframes into a KeplerEphemeris (+iono/UTC).

    Reference analog: Gps_Navigation_Message::satellite_validation — requires
    subframes 1,2,3 with consistent IODC/IODE before declaring ephemeris valid.
    """

    def __init__(self, prn: int):
        self.prn = prn
        self._sf: dict[int, Subframe] = {}
        self.iono = IonoParams()
        self.utc = UtcParams()
        # constellation almanac collected from SF4/5 pages, keyed by PRN
        # (reference Gps_Navigation_Message almanac maps + WNa/toa page)
        self.almanacs: dict[int, "GpsAlmanac"] = {}
        self.alm_toa: float | None = None
        self.alm_wna: int | None = None

    def push(self, sf: Subframe) -> None:
        self._sf[sf.sfid] = sf
        if "almanac" in sf.fields:
            from gnss_sdr_tpu.models.almanac import GpsAlmanac
            alm = GpsAlmanac(**sf.fields["almanac"])
            if self.alm_wna is not None:
                alm.wna = self.alm_wna
            self.almanacs[alm.prn] = alm
        if "alm_toa" in sf.fields:
            self.alm_toa = sf.fields["alm_toa"]
            self.alm_wna = sf.fields["alm_wna"]
            for alm in self.almanacs.values():
                alm.wna = self.alm_wna
        if sf.sfid == 4 and sf.fields.get("page_id") == 56:
            self.iono = IonoParams(alpha=sf.fields["iono_alpha"],
                                   beta=sf.fields["iono_beta"], valid=True)
            self.utc = UtcParams(a0=sf.fields["utc_a0"], a1=sf.fields["utc_a1"],
                                 tot=sf.fields["utc_tot"], wnt=sf.fields["utc_wnt"],
                                 delta_t_ls=sf.fields["utc_dtls"], valid=True)

    def ephemeris(self) -> KeplerEphemeris | None:
        if not all(k in self._sf for k in (1, 2, 3)):
            return None
        f1, f2, f3 = (self._sf[k].fields for k in (1, 2, 3))
        if f2["iode"] != f3["iode3"] or (f1["iodc"] & 0xFF) != f2["iode"]:
            return None
        return KeplerEphemeris(
            prn=self.prn, week=f1["week"], toc=f1["toc"], af0=f1["af0"],
            af1=f1["af1"], af2=f1["af2"], tgd=f1["tgd"], iodc=f1["iodc"],
            health=f1["health"], ura=f1["ura"],
            iode=f2["iode"], crs=f2["crs"], delta_n=f2["delta_n"], m0=f2["m0"],
            cuc=f2["cuc"], e=f2["e"], cus=f2["cus"], sqrt_a=f2["sqrt_a"],
            toe=f2["toe"],
            cic=f3["cic"], omega0=f3["omega0"], cis=f3["cis"], i0=f3["i0"],
            crc=f3["crc"], omega=f3["omega"], omega_dot=f3["omega_dot"],
            idot=f3["idot"],
        )
