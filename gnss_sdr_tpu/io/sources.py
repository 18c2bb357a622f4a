"""Signal sources: sample-format decoding and chunked file/array streaming.

Reference analogs: ``File_Signal_Source`` + the data-type adapters
(``src/algorithms/signal_source/adapters/file_signal_source.cc``,
``src/algorithms/data_type_adapter/adapters/*``) and the sample-count valve
(``gnss_sdr_valve``). One streaming class handles all item types; conversion
to complex64 happens on host at ingest (numpy vectorized), conditioning
happens on device.
"""

from __future__ import annotations

import pathlib

import numpy as np

ITEM_TYPES = {
    # name: (numpy dtype, components per complex sample)
    "gr_complex": (np.complex64, 1),
    "ishort": (np.int16, 2),
    "ibyte": (np.int8, 2),
    "cshort": (np.int16, 2),
    "cbyte": (np.int8, 2),
    "short": (np.int16, 1),
    "byte": (np.int8, 1),
    "float": (np.float32, 1),
}


def decode_samples(raw: np.ndarray, item_type: str) -> np.ndarray:
    """Convert raw file samples to complex64 baseband."""
    if item_type == "gr_complex":
        return raw.astype(np.complex64)
    dtype, comps = ITEM_TYPES[item_type]
    if comps == 2:
        f = raw.astype(np.float32)
        return (f[0::2] + 1j * f[1::2]).astype(np.complex64)
    return raw.astype(np.float32).astype(np.complex64)


class FileSignalSource:
    """Chunked reader for raw IQ capture files (all reference item types)."""

    def __init__(self, path: str | pathlib.Path, item_type: str = "gr_complex",
                 sampling_frequency: float = 4e6, samples: int = 0,
                 repeat: bool = False):
        if item_type not in ITEM_TYPES:
            raise ValueError(f"unknown item_type {item_type!r}")
        self.path = pathlib.Path(path)
        self.item_type = item_type
        self.fs = sampling_frequency
        self.repeat = repeat
        dtype, comps = ITEM_TYPES[item_type]
        self._dtype, self._comps = dtype, comps
        n_raw = self.path.stat().st_size // np.dtype(dtype).itemsize
        self.total_samples = n_raw // comps
        if samples > 0:
            self.total_samples = min(self.total_samples, samples)  # valve
        self._pos = 0

    def read(self, n: int) -> np.ndarray:
        """Read up to n complex samples (fewer at EOF unless repeating)."""
        out = []
        remaining = n
        while remaining > 0:
            avail = self.total_samples - self._pos
            if avail <= 0:
                if not self.repeat:
                    break
                self._pos = 0
                avail = self.total_samples
            take = min(remaining, avail)
            raw = np.fromfile(self.path, dtype=self._dtype,
                              count=take * self._comps,
                              offset=self._pos * self._comps
                              * np.dtype(self._dtype).itemsize)
            out.append(decode_samples(raw, self.item_type))
            self._pos += take
            remaining -= take
        if not out:
            return np.zeros(0, np.complex64)
        return np.concatenate(out) if len(out) > 1 else out[0]


class ArraySignalSource:
    """In-memory source (tests / signal generator)."""

    def __init__(self, samples: np.ndarray, sampling_frequency: float):
        self.samples = np.asarray(samples, np.complex64)
        self.fs = sampling_frequency
        self.total_samples = len(self.samples)
        self._pos = 0

    def read(self, n: int) -> np.ndarray:
        take = self.samples[self._pos: self._pos + n]
        self._pos += len(take)
        return take
