"""ctypes binding for the native sample-ingest library (native/sampleio.cpp).

Builds the shared library on first use with g++ -O3 (no pybind11 in the
image; plain C ABI + ctypes). Falls back to the numpy decoders in
io/sources.py when a compiler isn't available.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_ROOT = pathlib.Path(__file__).resolve().parent.parent.parent
_SRC = _ROOT / "native" / "sampleio.cpp"
_LIB = _ROOT / "native" / "libsampleio.so"

ITEM_KINDS = {"ishort": 0, "ibyte": 1, "gr_complex": 2, "short": 3,
              "2bit_real": 4, "2bit_cpx": 5}

_lib = None
_tried = False


def build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not build():
            return None
    lib = ctypes.CDLL(str(_LIB))
    if not hasattr(lib, "decode_labsat_2bit"):
        # stale binary (mtime newer than the source, e.g. after a checkout)
        # missing newer entry points: rebuild once
        if not build():
            return None
        lib = ctypes.CDLL(str(_LIB))
    lib.reader_open.restype = ctypes.c_void_p
    lib.reader_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.reader_read.restype = ctypes.c_int64
    lib.reader_read.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                ctypes.c_void_p]
    lib.reader_seek.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.reader_close.argtypes = [ctypes.c_void_p]
    for name in ("decode_ishort", "decode_ibyte", "decode_short"):
        getattr(lib, name).argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                       ctypes.c_void_p]
    for name in ("decode_2bit_packed_real", "decode_2bit_packed_cpx",
                 "decode_labsat_2bit", "decode_labsat_4bit"):
        getattr(lib, name).argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                       ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return get_lib() is not None


class NativeFileSource:
    """High-rate streaming file source backed by the C++ reader."""

    def __init__(self, path, item_type: str = "gr_complex",
                 sampling_frequency: float = 4e6):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native sampleio library unavailable")
        self._lib = lib
        kind = ITEM_KINDS[item_type]
        self._h = lib.reader_open(str(path).encode(), kind)
        if not self._h:
            raise FileNotFoundError(path)
        self.fs = sampling_frequency
        self.item_type = item_type

    def read(self, n: int) -> np.ndarray:
        out = np.empty(n, np.complex64)
        got = self._lib.reader_read(self._h, n,
                                    out.ctypes.data_as(ctypes.c_void_p))
        return out[:got]

    def seek(self, complex_sample: int) -> None:
        self._lib.reader_seek(self._h, complex_sample)

    def close(self) -> None:
        if self._h:
            self._lib.reader_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def decode_labsat_words(raw: np.ndarray, bits_per_sample: int) -> np.ndarray:
    """Decode LabSat 2/3 16-bit sample words -> complex64 (native kernel,
    numpy fallback). 2-bit: 8 samples/word; 4-bit: 4 samples/word."""
    lib = get_lib()
    words = np.ascontiguousarray(raw, np.uint16)
    per = 8 if bits_per_sample == 2 else 4
    if lib is not None:
        out = np.empty(len(words) * per, np.complex64)
        fn = (lib.decode_labsat_2bit if bits_per_sample == 2
              else lib.decode_labsat_4bit)
        fn(words.ctypes.data_as(ctypes.c_void_p), len(words),
           out.ctypes.data_as(ctypes.c_void_p))
        return out
    w = words.astype(np.uint32)
    if bits_per_sample == 2:
        i_bits = np.stack([(w >> (15 - 2 * i)) & 1 for i in range(8)], 1)
        q_bits = np.stack([(w >> (14 - 2 * i)) & 1 for i in range(8)], 1)
        return ((2.0 * i_bits - 1.0) + 1j * (2.0 * q_bits - 1.0)
                ).reshape(-1).astype(np.complex64)
    lut = np.array([1.0, 2.0, -2.0, -1.0], np.float32)
    ic = np.stack([(((w >> (15 - 4 * i)) & 1) << 1)
                   | ((w >> (13 - 4 * i)) & 1) for i in range(4)], 1)
    qc = np.stack([(((w >> (14 - 4 * i)) & 1) << 1)
                   | ((w >> (12 - 4 * i)) & 1) for i in range(4)], 1)
    return (lut[ic] + 1j * lut[qc]).reshape(-1).astype(np.complex64)


def decode_2bit_cpx(raw: np.ndarray) -> np.ndarray:
    """Packed 2-bit complex decode via the native kernel (numpy fallback)."""
    lib = get_lib()
    n = len(raw) * 2
    if lib is not None:
        out = np.empty(n, np.complex64)
        lib.decode_2bit_packed_cpx(
            np.ascontiguousarray(raw, np.uint8).ctypes.data_as(ctypes.c_void_p),
            len(raw), out.ctypes.data_as(ctypes.c_void_p))
        return out
    lut = np.array([1.0, 3.0, -1.0, -3.0], np.float32)
    b = np.asarray(raw, np.uint8)
    vals = np.stack([lut[b & 3], lut[(b >> 2) & 3],
                     lut[(b >> 4) & 3], lut[(b >> 6) & 3]], axis=1)
    flat = vals.reshape(-1)
    return (flat[0::2] + 1j * flat[1::2]).astype(np.complex64)
