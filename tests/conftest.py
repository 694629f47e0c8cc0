"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the TPU-world "multi-node without
a cluster" mechanism). The axon TPU plugin in this image overrides the
JAX_PLATFORMS environment variable, so the CPU backend must be forced via
jax.config before any device is touched; the host-device-count XLA flag
still must be set before jax import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def synthetic_root(tmp_path_factory):
    """A small synthetic SESYD-style dataset shared across the session."""
    from yolat_tpu.data.synthetic import write_dataset

    root = tmp_path_factory.mktemp("sesyd_syn")
    write_dataset(str(root), n_train=3, n_test=2, seed=0, width=800.0, height=600.0,
                  n_rooms=4, symbols_per_room=(1, 2))
    return str(root)
