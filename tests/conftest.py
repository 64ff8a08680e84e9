"""Test configuration: run JAX on a simulated 8-device CPU mesh.

Multi-device code paths (shard_map / collectives for the distributed Schur
BA) are exercised in CI without TPU hardware via XLA's host-platform device
virtualization, per SURVEY.md §4 ("Distributed without a cluster").
"""

import os

# Must be set before jax is imported anywhere. Force-set (the harness env
# pins JAX_PLATFORMS=axon for the real chip; tests always run on CPU).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Persistent compilation cache: compiles in this environment are expensive
# (remote compile service), so cache every executable across test runs.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
