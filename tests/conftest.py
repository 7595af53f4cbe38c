"""Test configuration: force CPU with 8 virtual devices for sharding tests.

Must run before jax initializes its backends.  The host environment points
JAX at the single real TPU (JAX_PLATFORMS=axon via a sitecustomize that
dials a tunnel per process); tests run on a virtual 8-device CPU mesh
instead, per the multi-chip validation strategy.
"""

import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""  # skip axon PJRT registration
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment ships a sitecustomize that imports jax and registers the
# axon (TPU) PJRT plugin at interpreter startup - BEFORE this conftest runs.
# Setting env vars above is then too late: jax would resolve to the single
# tunneled TPU and the whole suite would crawl through a ~30ms-RTT link
# (observed: 31 min for a suite that takes ~4 min on CPU) while holding the
# chip hostage.  Force the platform choice and drop any already-created
# backends so the next lookup initializes the 8-device CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:  # clear any backend sitecustomize already instantiated
    jax.clear_backends()
except Exception:
    pass

# Persistent XLA compilation cache: the suite's cost is dominated by CPU
# compiles of the circuit shapes (hundreds of distinct degree-class shapes
# on a 2-vCPU runner).  Caching them across runs turns re-runs from ~45 min
# into minutes.  The cache dir is repo-local and gitignored.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
