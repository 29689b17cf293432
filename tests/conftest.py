"""Test harness: run everything on CPU jax with 8 virtual devices so
multi-chip sharding logic (shard_map/psum) is exercised without a TPU pod.

Note: in some environments (e.g. the axon TPU tunnel) jax is already
imported at interpreter startup, so JAX_PLATFORMS in os.environ is too late;
``jax.config.update`` works regardless, and XLA_FLAGS still takes effect
because the CPU client is created lazily on first use.
"""

import os

# Default: CPU jax with 8 virtual devices. Set SFVP_TEST_PLATFORM=tpu to run
# the same suite unmodified on real hardware (e.g. a v5e-8 pod slice),
# per SURVEY.md §4 item 4.
_platform = os.environ.get("SFVP_TEST_PLATFORM", "cpu")
if _platform == "cpu":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if _platform == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# persistent XLA compilation cache: the suite compiles hundreds of small
# jits plus several interpret-mode Pallas oracles; repeat runs hit disk
# (first run pays full compile cost). SFVP_CACHE_DIR=off disables.
from sfvp_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


@pytest.fixture(scope="session")
def cornell():
    from sfvp_tpu import load_obj

    return load_obj()


@pytest.fixture(scope="session")
def cornell_buffers(cornell):
    from sfvp_tpu import upload

    return upload(cornell)


@pytest.fixture()
def rng_np():
    return np.random.default_rng(1234)
