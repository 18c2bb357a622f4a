"""Test configuration: force an 8-virtual-device CPU platform.

The axon TPU plugin (sitecustomize) force-selects the TPU backend via
``jax.config.update('jax_platforms', 'axon,cpu')``; tests must undo that
*before* any backend is initialized, and expose 8 host devices so the
multi-chip sharding paths are exercised without TPU hardware.
"""

import os
import sys
import pathlib

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# persistent XLA cache: the e2e tests recompile the same scan/acquisition
# programs on every suite run; the on-disk cache cuts re-runs massively
from gnss_sdr_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(str(pathlib.Path(__file__).parent / ".jaxcache"))

REFERENCE_SAMPLES = pathlib.Path("/root/reference/src/tests/signal_samples")
