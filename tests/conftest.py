"""Test harness: force an 8-device virtual CPU mesh before JAX loads.

This substitutes for a real TPU pod the same way distributed frameworks
fake multi-node (SURVEY.md §4): multi-chip sharding tests run on
``--xla_force_host_platform_device_count=8``.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# persistent XLA compilation cache: repeat test runs skip recompiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fire_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
import jax  # noqa: E402  (after env setup above)

# Force the CPU backend: in this environment the axon TPU plugin wins
# over the JAX_PLATFORMS env var, so select it via config (and give it
# 8 virtual devices for the multi-chip sharding tests).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# this CPU backend computes default-precision f32 matmuls at reduced
# (bf16-class) precision; tests compare against float64 oracles, so pin
# true-f32 matmuls.  Production code sets precision explicitly where it
# matters (KF/UKF, exact gallery match) and uses bf16 deliberately in CNNs.
jax.config.update("jax_default_matmul_precision", "highest")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
