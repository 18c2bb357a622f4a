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
