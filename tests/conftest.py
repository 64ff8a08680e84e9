"""Test configuration: run JAX on a simulated 8-device CPU mesh.

Multi-device code paths (shard_map / collectives for the distributed Schur
BA) are exercised in CI without TPU hardware via XLA's host-platform device
virtualization, per SURVEY.md §4 ("Distributed without a cluster").

NOTE: the harness environment registers a TPU ("axon") PJRT plugin from
sitecustomize and force-selects it regardless of the JAX_PLATFORMS env var,
so the platform must be overridden in-process via jax.config *before* any
backend is initialized. Tests then compile locally on CPU (the TPU path
compiles remotely and is benchmarked separately by bench.py).
"""

import os

# Silence XLA's CPU AOT cache-loader ERROR spam: its machine-feature check
# compares the compile target's feature string (which includes pseudo-
# features like +prefer-no-scatter) against host CPU detection (which never
# reports them), so EVERY persistent-cache load "mismatches" — even an
# entry compiled seconds earlier on this very machine (verified r4). The
# warning is benign; at one block per cache hit it drowned CI stderr.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

# Read by the CPU client at (lazy) initialization — must be set before the
# first jax.devices() / computation, which this is.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: first-compile cost is amortized across runs.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.device_count() == 8, "expected 8 virtual CPU devices for tests"


@pytest.fixture
def rng():
    return np.random.default_rng(42)
