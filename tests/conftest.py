"""Test harness: force an 8-virtual-device CPU platform BEFORE jax import so
multi-chip sharding paths are exercised hermetically (SURVEY.md §4 plan)."""

import os

# The container preloads jax with JAX_PLATFORMS=axon (TPU tunnel) via
# sitecustomize, so env vars alone are too late — switch the platform through
# jax.config BEFORE any backend initialization. Tests run hermetically on a
# virtual 8-device CPU mesh.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
# Persistent compile cache: repeated test runs skip XLA recompilation.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    assert jax.device_count() == 8
    return jax.devices()


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="session")
def tiny_cfg():
    from carla_imitation_learning_tpu import compose

    return compose("config", overrides=[
        "model=imitation", "BATCH_SIZE=4", "NUM_EPOCHS=2",
        "image_height=64", "image_width=64",
        "trainer.max_epochs=2", "trainer.num_sanity_val_steps=1",
        "compute_dtype=float32",
    ])


@pytest.fixture(scope="session")
def synthetic_store():
    from carla_imitation_learning_tpu.data.pipeline import FrameStore

    return FrameStore.synthetic(n=40, height=64, width=64, seed=0)
