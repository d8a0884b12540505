"""Test configuration: force JAX onto a virtual 8-device CPU platform.

Multi-chip TPU hardware is not available in CI, so all sharding/collective tests
run on a virtual CPU mesh (`--xla_force_host_platform_device_count=8`), mirroring
how the driver dry-runs the multi-chip path.  This must happen before jax is
imported anywhere.
"""

import os

# The execution environment pre-exports JAX_PLATFORMS=axon (real TPU) and a
# sitecustomize that registers the axon PJRT plugin at interpreter start, so a
# plain env-var setdefault is NOT enough — override the config explicitly.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def synthetic_root(tmp_path_factory):
    """A tiny synthetic dataset tree with train/val/test splits and stats."""
    from generative_turbulence_tpu.data.synthetic import generate_synthetic_dataset

    root = tmp_path_factory.mktemp("synth")
    generate_synthetic_dataset(
        root,
        n_train_cases=2,
        n_val_cases=1,
        n_test_cases=1,
        n_frames=12,
        cell_counts=(24, 10, 10),
        seed=0,
    )
    return root
