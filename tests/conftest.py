"""Test harness: force an 8-device CPU platform so multi-chip sharding paths run
hermetically (SURVEY §4: 'jax.sharding tests on CPU devices for the parallel
path')."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Hermetic tests have no pretrained VGG19 checkpoint; opt into the
# deterministic random-filter fallback (training CLIs hard-fail without it).
os.environ.setdefault("SHINEON_ALLOW_RANDOM_VGG", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin force-prepends itself to jax_platforms regardless of the
# JAX_PLATFORMS env var; pin the config explicitly so tests run on the
# 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the heavy 8-virtual-device compile tests
# (test_train_e2e, test_sams_conversion, test_flownet_golden) dominate suite
# wall-clock; caching their executables makes re-runs start in seconds.
from shineon_tpu.utils.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(420)
