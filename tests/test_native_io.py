"""Native (C++) sample ingest vs numpy oracle."""

import numpy as np
import pytest

from gnss_sdr_tpu.io import native, sources


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("g++ / native lib unavailable")
    return True


def test_native_ishort_reader(tmp_path, lib_ok):
    rng = np.random.default_rng(0)
    raw = rng.integers(-1000, 1000, 4000).astype(np.int16)
    p = tmp_path / "c.ishort"
    raw.tofile(p)
    src = native.NativeFileSource(p, "ishort", 4e6)
    out = np.concatenate([src.read(700), src.read(5000)])
    expect = sources.decode_samples(raw, "ishort")
    np.testing.assert_array_equal(out, expect)
    src.close()


def test_native_reader_seek(tmp_path, lib_ok):
    data = np.arange(100, dtype=np.complex64)
    p = tmp_path / "c.dat"
    data.tofile(p)
    src = native.NativeFileSource(p, "gr_complex", 1e6)
    src.seek(40)
    out = src.read(10)
    np.testing.assert_array_equal(out, data[40:50])
    src.close()


def test_native_2bit_cpx(lib_ok):
    rng = np.random.default_rng(1)
    raw = rng.integers(0, 256, 512).astype(np.uint8)
    out = native.decode_2bit_cpx(raw)
    # numpy oracle
    lut = np.array([1.0, 3.0, -1.0, -3.0], np.float32)
    b = raw
    vals = np.stack([lut[b & 3], lut[(b >> 2) & 3],
                     lut[(b >> 4) & 3], lut[(b >> 6) & 3]], axis=1).reshape(-1)
    expect = (vals[0::2] + 1j * vals[1::2]).astype(np.complex64)
    np.testing.assert_array_equal(out, expect)


def test_native_throughput_sane(tmp_path, lib_ok):
    """Native ishort decode should stream well above real-time rates."""
    import time
    raw = np.zeros(2_000_000, np.int16)  # 1M complex samples
    p = tmp_path / "big.ishort"
    raw.tofile(p)
    src = native.NativeFileSource(p, "ishort", 4e6)
    t0 = time.perf_counter()
    total = 0
    while True:
        x = src.read(200_000)
        if len(x) == 0:
            break
        total += len(x)
    dt = time.perf_counter() - t0
    src.close()
    assert total == 1_000_000
    assert total / dt > 20e6, f"only {total/dt/1e6:.1f} Msps"


def _labsat_header(bits_per_sample: int, header_bytes: int = 64) -> bytes:
    head = bytearray(header_bytes)
    head[8:11] = b"LS3"
    head[11] = 1                                  # sub version
    head[12:16] = int(header_bytes).to_bytes(4, "little")
    head[16:18] = (2).to_bytes(2, "little")       # section id 2
    head[18:22] = (16).to_bytes(4, "little")      # section length
    head[22] = 0                                  # ref clock OCXO
    head[23] = bits_per_sample
    head[24] = 1                                  # channel A only
    head[25] = 1                                  # quantization
    head[26] = 0                                  # channel A = GPS
    head[27] = 255                                # no channel B
    return bytes(head)


def _encode_labsat_2bit(iq: np.ndarray) -> np.ndarray:
    """Oracle encoder: complex ±1 components -> 16-bit LabSat words."""
    assert len(iq) % 8 == 0
    words = np.zeros(len(iq) // 8, np.uint16)
    for w in range(len(words)):
        v = 0
        for i in range(8):
            s = iq[8 * w + i]
            ib = 1 if s.real > 0 else 0
            qb = 1 if s.imag > 0 else 0
            v |= ib << (15 - 2 * i)
            v |= qb << (14 - 2 * i)
        words[w] = v
    return words


def test_labsat3_source_roundtrip(tmp_path):
    """LabSat 3 file-sequence source: header parse + 2-bit word decode +
    transparent continuation into the next file of the sequence
    (reference labsat23_source.cc)."""
    from gnss_sdr_tpu.io.sources import LabsatSignalSource

    rng = np.random.default_rng(7)
    iq = (np.sign(rng.standard_normal(256))
          + 1j * np.sign(rng.standard_normal(256))).astype(np.complex64)
    words = _encode_labsat_2bit(iq)
    base = tmp_path / "capture"
    # first file: header + first half; second file: raw words only
    with open(f"{base}_0000.LS3", "wb") as f:
        f.write(_labsat_header(2))
        words[: len(words) // 2].astype("<u2").tofile(f)
    with open(f"{base}_0001.LS3", "wb") as f:
        words[len(words) // 2:].astype("<u2").tofile(f)

    src = LabsatSignalSource(str(base), sampling_frequency=16.368e6)
    assert src.version == 3 and src.bits_per_sample == 2
    got = src.read(256)
    np.testing.assert_array_equal(got, iq)
    assert len(src.read(64)) == 0          # sequence exhausted
    src.close()


def test_labsat3_unaligned_reads_lose_no_samples(tmp_path):
    """Reads that are not a multiple of samples-per-word (8 for 2-bit) must
    buffer the decoded remainder of the last word, not drop it: the sample
    stream has to be contiguous for any chunk size (e.g. odd chunk_ms or a
    fractional-resampler ratio)."""
    from gnss_sdr_tpu.io.sources import LabsatSignalSource

    rng = np.random.default_rng(11)
    iq = (np.sign(rng.standard_normal(512))
          + 1j * np.sign(rng.standard_normal(512))).astype(np.complex64)
    words = _encode_labsat_2bit(iq)
    base = tmp_path / "capture"
    with open(f"{base}_0000.LS3", "wb") as f:
        f.write(_labsat_header(2))
        words.astype("<u2").tofile(f)

    src = LabsatSignalSource(str(base), sampling_frequency=16.368e6)
    got = []
    for n in (100, 156, 1, 7, 200, 48):   # deliberately word-unaligned
        got.append(src.read(n))
    got = np.concatenate(got)
    np.testing.assert_array_equal(got, iq[: len(got)])
    src.close()


def test_labsat_4bit_decode_matches_reference_map():
    """4-bit sign/magnitude map: 00->+1, 01->+2, 10->-2, 11->-1 per
    component (labsat23_source.cc decode_samples_one_channel case 4)."""
    from gnss_sdr_tpu.io import native

    # craft one word holding samples (I=+1,Q=-1), (I=-2,Q=+2), x2
    def code(v):
        return {1.0: 0b00, 2.0: 0b01, -2.0: 0b10, -1.0: 0b11}[v]

    samples = [(1.0, -1.0), (-2.0, 2.0), (2.0, 1.0), (-1.0, -2.0)]
    v = 0
    for i, (si, sq) in enumerate(samples):
        ci, cq = code(si), code(sq)
        v |= (ci >> 1) << (15 - 4 * i)
        v |= (ci & 1) << (13 - 4 * i)
        v |= (cq >> 1) << (14 - 4 * i)
        v |= (cq & 1) << (12 - 4 * i)
    out = native.decode_labsat_words(np.array([v], np.uint16), 4)
    np.testing.assert_array_equal(
        out, np.array([si + 1j * sq for si, sq in samples], np.complex64))


def test_labsat_native_matches_numpy_fallback():
    from gnss_sdr_tpu.io import native
    if not native.available():
        pytest.skip("no native lib")
    rng = np.random.default_rng(3)
    words = rng.integers(0, 1 << 16, 512).astype(np.uint16)
    for bps in (2, 4):
        a = native.decode_labsat_words(words, bps)
        lib, native._lib = native._lib, None
        tried, native._tried = native._tried, True
        try:
            b = native.decode_labsat_words(words, bps)
        finally:
            native._lib, native._tried = lib, tried
        np.testing.assert_array_equal(a, b)


def test_spir_int1_decode():
    """SPIR 1-bit int32 format (unpack_intspir_1bit_samples.cc): bit
    (ch-1)*2 -> I, bit 2ch-1 -> Q, both to +/-32767."""
    from gnss_sdr_tpu.io.sources import decode_spir_int1

    vals = np.array([0b00, 0b01, 0b10, 0b11], np.int32)
    out = decode_spir_int1(vals, channel=1)
    a = 32767.0
    np.testing.assert_array_equal(
        out, np.array([-a - 1j * a, a - 1j * a, -a + 1j * a, a + 1j * a],
                      np.complex64))
    # channel 2 reads bits 2 and 3
    out2 = decode_spir_int1(np.array([0b0100], np.int32), channel=2)
    np.testing.assert_array_equal(out2, np.array([a - 1j * a], np.complex64))


def test_spir_gss6450_decode():
    """GSS6450 2/4-bit packing round-trip vs a per-word oracle encoder
    (unpack_spir_gss6450_samples.cc: LSB-first extraction, reversed
    sample order within the word, two's complement)."""
    from gnss_sdr_tpu.io.sources import decode_spir_gss6450

    rng = np.random.default_rng(5)
    for adc_bits in (2, 4):
        per = 16 // adc_bits
        half = 1 << (adc_bits - 1)
        full = 1 << adc_bits
        mask = full - 1
        samples = (rng.integers(-half, half, (3, per))
                   + 1j * rng.integers(-half, half, (3, per)))
        words = []
        for row in samples:
            v = 0
            # encoder mirror: sample k (in output order) is extracted at
            # shift position per-1-k
            for k in range(per):
                s = row[per - 1 - k]
                v |= (int(s.real) & mask) << (2 * adc_bits * k)
                v |= (int(s.imag) & mask) << (2 * adc_bits * k + adc_bits)
            words.append(v)
        out = decode_spir_gss6450(
            np.array(words, np.uint32).astype(np.int32), adc_bits)
        np.testing.assert_array_equal(
            out, samples.reshape(-1).astype(np.complex64))


def test_spir_source_reads_file(tmp_path):
    from gnss_sdr_tpu.io.sources import SpirSignalSource, decode_spir_gss6450

    rng = np.random.default_rng(11)
    words = rng.integers(0, 1 << 32, 64, dtype=np.uint64).astype(np.uint32)
    p = tmp_path / "spir.dat"
    words.astype("<u4").tofile(p)
    src = SpirSignalSource(p, fmt="gss6450", adc_bits=4,
                           sampling_frequency=80e6)
    assert src.total_samples == 64 * 4
    a = src.read(7)
    b = src.read(300)
    ref = decode_spir_gss6450(words.astype(np.int32), 4)
    np.testing.assert_array_equal(np.concatenate([a, b]), ref[:256])
    assert len(src.read(10)) == 0
