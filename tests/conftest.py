"""Test harness config: run everything on a virtual 8-device CPU mesh.

Must set flags before jax initializes a backend, hence module-level os.environ.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: env presets JAX_PLATFORMS=axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The container's sitecustomize imports jax at interpreter startup (to register
# the axon TPU backend), so the env vars above are read too late. Re-point the
# already-imported jax at CPU before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_num_cpu_devices", 8
)  # virtual 8-device mesh for sharding tests

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
