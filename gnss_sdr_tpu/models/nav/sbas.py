"""SBAS L1 message codec (DO-229 MOPS framing).

Reference analog: ``sbas_l1_telemetry_decoder_gs.cc`` — 250 bps messages,
rate-1/2 K=7 convolutionally encoded to 500 sps (the encoder runs
continuously across messages, no per-message flush), each 1-second block:

  [8-bit preamble (cycling 0x53, 0x9A, 0xC6) | 6-bit type | 212-bit data |
   24-bit CRC-24Q over the preceding 226 bits]

Decoded messages are returned as (type, data bits); fast corrections
(types 2-5) and PRN mask (type 1) get field-level parsers.
"""

from __future__ import annotations

import numpy as np

from gnss_sdr_tpu.models.nav import fec

PREAMBLES = (0x53, 0x9A, 0xC6)
MSG_BITS = 250
MSG_SYMBOLS = 500


def _u2b(value: int, n: int) -> np.ndarray:
    return np.array([(int(value) >> (n - 1 - i)) & 1 for i in range(n)],
                    np.uint8)


def _b2u(bits) -> int:
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v


def encode_message(msg_type: int, data212: np.ndarray,
                   preamble_index: int) -> np.ndarray:
    """One 250-bit message (before FEC)."""
    data212 = np.asarray(data212, np.uint8)
    assert len(data212) == 212
    head = np.concatenate([
        _u2b(PREAMBLES[preamble_index % 3], 8),
        _u2b(msg_type, 6), data212])
    crc = fec.crc24q_bits(head)
    return np.concatenate([head, _u2b(crc, 24)])


def encode_stream(messages: list[tuple[int, np.ndarray]]) -> np.ndarray:
    """Messages -> continuous 500 sps symbol stream (no per-message flush,
    DO-229 continuous convolutional encoding)."""
    bits = np.concatenate([
        encode_message(t, d, k) for k, (t, d) in enumerate(messages)])
    return fec.conv_encode(bits, invert_g2=False, flush=False)


def decode_stream(symbols: np.ndarray, *, max_messages: int = 64
                  ) -> list[tuple[int, int, np.ndarray]]:
    """Soft 500 sps symbols (+amp == bit 1) -> [(bit_offset, type, data212)].

    Viterbi-decodes the whole window, then slides over the bit stream
    checking the preamble + CRC at every offset (handles unknown message
    phase and stream polarity; the CRC arbitrates).
    """
    out = []
    sym = np.asarray(symbols, np.float64)
    n_bits = len(sym) // 2 - 8
    if n_bits < MSG_BITS:
        return out
    for pol in (1.0, -1.0):
        bits = fec.viterbi_decode(pol * sym, n_bits, invert_g2=False)
        for off in range(0, n_bits - MSG_BITS + 1):
            if len(out) >= max_messages:
                return out
            pre = _b2u(bits[off: off + 8])
            if pre not in PREAMBLES:
                continue
            head = bits[off: off + 226]
            crc_rx = _b2u(bits[off + 226: off + 250])
            if fec.crc24q_bits(head) != crc_rx:
                continue
            mtype = _b2u(bits[off + 8: off + 14])
            out.append((off, mtype, bits[off + 14: off + 226].copy()))
        if out:
            break
    return out


# ---------------------------------------------------------------------------
# Field parsers for the PVT-relevant types
# ---------------------------------------------------------------------------


def parse_type1_mask(data212: np.ndarray) -> list[int]:
    """Type 1 PRN mask -> ordered list of PRNs covered by corrections."""
    mask = data212[:210]
    prns = []
    for i, b in enumerate(mask[:51]):          # GPS PRN 1..51 region (bits 1..51)
        if b:
            prns.append(i + 1)
    for i, b in enumerate(mask[51:210]):
        if b:
            prns.append(i + 52)
    return prns


def parse_fast_corrections(msg_type: int, data212: np.ndarray
                           ) -> tuple[int, list[float], list[int]]:
    """Types 2-5: (IODF, 13 x PRC meters, 13 x UDREI)."""
    iodf = _b2u(data212[0:2])
    # data212[2:4] = IODP
    prcs = []
    for k in range(13):
        v = _b2u(data212[4 + 12 * k: 4 + 12 * (k + 1)])
        if v >= 2048:
            v -= 4096
        prcs.append(v * 0.125)                 # 0.125 m resolution
    udrei = [
        _b2u(data212[160 + 4 * k: 160 + 4 * (k + 1)]) for k in range(13)]
    return iodf, prcs, udrei
