"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices so the multi-chip
sharding paths can be validated without TPU hardware (the driver separately
dry-runs the multichip path via __graft_entry__.dryrun_multichip). This must
happen before JAX initializes any backend.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# The axon harness pins JAX_PLATFORMS=axon (the tunneled TPU); tests run on
# CPU for speed and true-f64 semantics.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the XLA:CPU softfloat (e64) mega-graphs
# take tens of minutes to compile (a CPU-backend pathology — CLAUDE.md);
# caching makes repeated RUN_SLOW runs pay that once per code change.
# Shared location (NBODY_JAX_CACHE override) with __graft_entry__.py.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from nbody_tpu.backend import enable_persistent_compile_cache  # noqa: E402

enable_persistent_compile_cache()

sys.path.insert(0, os.path.dirname(__file__))

TESTCASE_DIR = "/root/reference/testcases"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "golden: full-length golden testcase runs (slow; opt in "
        "with RUN_GOLDEN=1)")
