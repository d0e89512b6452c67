"""Test harness: run everything on a fake 8-device CPU backend so multi-chip
sharding tests work without TPUs (JAX's standard trick — see SURVEY.md §4)."""

import os

# Must be set before jax is imported anywhere. Force CPU even if the session
# env points at a TPU platform (e.g. JAX_PLATFORMS=axon).
os.environ["JAX_PLATFORMS"] = "cpu"
# Drop the axon TPU plugin's gate var so any python SUBPROCESS a test spawns
# (multihost smoke tests, self-respawning mesh benches) never registers the
# tunnel client. For THIS process the sitecustomize already ran at startup —
# run pytest under `env -u PALLAS_AXON_POOL_IPS` when a TPU job is live
# (a concurrent bench.py once aborted the suite with a bare "Fatal Python
# error" mid-run; see CLAUDE.md).
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# The axon TPU sitecustomize force-selects its platform via
# jax.config.update("jax_platforms", "axon,cpu"); override it back to CPU
# before any backend initializes so tests run on the fake 8-device host.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.key(0)
