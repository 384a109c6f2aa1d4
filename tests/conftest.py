"""Test config: force an 8-device virtual CPU mesh so sharding tests run anywhere.

Must set XLA flags before jax initializes (SURVEY.md §4: mesh tests on CPU via
xla_force_host_platform_device_count).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # deterministic fp32 parity; override axon/TPU
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU platform; the config update
# below wins as long as no backend has initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

import pathlib  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDENS = pathlib.Path(__file__).parent / "goldens"


@pytest.fixture(scope="session")
def goldens():
    def load(name):
        path = GOLDENS / f"{name}.npz"
        if not path.exists():
            pytest.skip(f"golden file {path} missing — run tools/gen_goldens_*.py")
        return np.load(path, allow_pickle=True)

    return load
