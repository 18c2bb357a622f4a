"""Hash-keyed cache for generated IQ scenarios (test/bench fixtures).

The e2e system tests synthesize tens of seconds of multi-satellite IQ with
:mod:`gnss_sdr_tpu.utils.generator` — deterministic but expensive. This cache
stores the generated arrays as npz keyed by a content hash of the scenario
parameters, so repeated test runs (and bench.py) skip regeneration.

Reference analog: the reference's system tests keep the gnss-sim output file
on disk and reuse it between runs (position_test.cc:106-145 spawns the
generator only when the configured file is absent).

The key includes GENERATOR_VERSION — bump it whenever utils/generator.py or
utils/scenario.py change their output for identical parameters.
"""

from __future__ import annotations

import hashlib
import json
import os
import pathlib

import numpy as np

# bump when generator/scenario output changes for identical parameters
GENERATOR_VERSION = 1

_DEFAULT_DIR = pathlib.Path(__file__).resolve().parents[2] / ".fixture_cache"


def cache_dir() -> pathlib.Path:
    d = pathlib.Path(os.environ.get("GNSS_SDR_TPU_CACHE", _DEFAULT_DIR))
    d.mkdir(parents=True, exist_ok=True)
    return d


def _key_hash(name: str, params: dict) -> str:
    blob = json.dumps({"name": name, "version": GENERATOR_VERSION,
                       **params}, sort_keys=True, default=repr)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def cached_arrays(name: str, params: dict, builder) -> dict[str, np.ndarray]:
    """Return ``builder()``'s dict of arrays, cached under (name, params).

    ``builder`` must return a dict of numpy arrays; it runs only on a cache
    miss. Corrupt/partial cache files are regenerated transparently.
    """
    path = cache_dir() / f"{name}-{_key_hash(name, params)}.npz"
    if path.exists():
        try:
            with np.load(path) as z:
                return {k: z[k] for k in z.files}
        except Exception:
            path.unlink(missing_ok=True)
    arrays = builder()
    tmp = path.with_suffix(".tmp.npz")
    np.savez(tmp, **arrays)
    os.replace(tmp, path)
    return arrays


def cached_iq(name: str, params: dict, builder) -> np.ndarray:
    """Cache a single complex IQ array (the common case)."""
    return cached_arrays(name, params, lambda: {"iq": builder()})["iq"]
