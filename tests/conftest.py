"""Test environment: 8-device virtual CPU mesh.

The axon harness pins JAX_PLATFORMS to the remote TPU tunnel, so the env var
alone is not enough — we also force the platform through jax.config before
any computation happens.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_root(tmp_path_factory):
    """A small on-disk synthetic dataset shared by pipeline tests."""
    from dr4sr_tpu.data.synthetic import write_synthetic_dataset

    root = str(tmp_path_factory.mktemp("data"))
    write_synthetic_dataset(root, num_users=200, num_items=120, seed=0)
    return root


@pytest.fixture(scope="session")
def synthetic_config():
    from dr4sr_tpu.data.synthetic import synthetic_config as cfg

    return cfg()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
