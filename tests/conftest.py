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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# 8 virtual devices timeshare this host's ONE core, so an in-process
# all-reduce rendezvous can miss XLA:CPU's default 20s-warn/40s-TERMINATE
# timeouts whenever another process loads the core (a concurrent TPU bench's
# compile client did exactly that: 5/8 participant threads arrived and XLA
# aborted the whole pytest run). Collectives here are correctness tests, not
# latency tests — give them room instead of a SIGABRT.
if "collective_call_warn_stuck" not in flags:
    flags += " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
if "collective_call_terminate" not in flags:
    flags += " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
os.environ["XLA_FLAGS"] = flags

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# The axon TPU sitecustomize force-selects its platform via
# jax.config.update("jax_platforms", "axon,cpu"); override it back to CPU
# before any backend initializes so tests run on the fake 8-device host.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
# NOTE: do NOT disable jax_cpu_enable_async_dispatch here — serializing
# dispatch slowed the 8-virtual-device CLI tests by >10x (each shard_map
# chunk render waits for the previous one). The raised collective timeouts
# above are the abort fix; transient rendezvous warnings under load are
# expected and harmless.

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.key(0)
