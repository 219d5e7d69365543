"""Test harness config: run all tests on CPU with 8 virtual devices.

This is the TPU-native substitute for multi-node test clusters: sharding and
collective behavior is validated on a fake 8-device mesh (SURVEY.md §4).
Must set env vars before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

# The axon TPU plugin in this image overrides JAX_PLATFORMS; force via config.
jax.config.update("jax_platforms", "cpu")

# The suite is compile-dominated (~30 min cold); persist compiled executables
# so repeat runs amortize the jit cost.
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("SYNTHSR_TEST_CACHE_DIR",
                                     "/tmp/jax_test_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

# Compile at minimal XLA optimization unless opted out: the suite executes
# tiny shapes (16-32 cubed) where optimized codegen saves microseconds but
# its compile passes cost the suite minutes; correctness semantics are
# unchanged (measured A/B in STATUS.md round 5).  SYNTHSR_TEST_FULL_OPT=1
# restores default codegen (used to re-validate the equivalence).
if os.environ.get("SYNTHSR_TEST_FULL_OPT", "0") != "1":
    jax.config.update("jax_disable_most_optimizations", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
