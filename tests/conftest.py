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

# ---------------------------------------------------------------------------
# Subprocess isolation for the collective-heavy e2e CLI tests.
#
# Root cause (round-3 judge repro + round-4 analysis): test.py builds its
# trainer over the FULL 8-virtual-device mesh, so its chunked renders are
# 8-participant shard_map programs. On this 1-core host with async dispatch
# (deliberately kept on — serializing it is >10x slower), a full-suite run
# accumulates enough queued per-device work by test 12 that one rendezvous
# participant never gets scheduled inside even a 1200 s terminate timeout —
# the suite dies with a bare "Fatal Python error: Aborted" at
# test_testpy_occupancy_dispatch, deterministically, while the same test
# passes in isolation (58 s) and at file scope (107 s).
#
# Fix: run each test of the marked files in a FRESH python subprocess
# (spawn, not fork — forking a process with live XLA threads is undefined).
# The child starts with an empty dispatch queue, which is exactly the state
# in which these tests are measured to pass; the JAX persistent compile
# cache (set above) keeps the per-child recompile cost low. This is the
# pytest-forked pattern without the fork (pytest-forked isn't in this
# image; pytest-xdist's --forked needs it).
# ---------------------------------------------------------------------------

_ISOLATE_FILES = {"test_cli_vis.py"}
_ISOLATED_CHILD_ENV = "MOCO_TEST_ISOLATED_CHILD"


@pytest.hookimpl(tryfirst=True)
def pytest_runtest_protocol(item, nextitem):
    if os.environ.get(_ISOLATED_CHILD_ENV):
        return None  # in the child: run normally
    if item.fspath.basename not in _ISOLATE_FILES:
        return None
    import subprocess
    import sys
    import time as _time
    from _pytest.reports import TestReport

    env = dict(os.environ, **{_ISOLATED_CHILD_ENV: "1"})
    env.pop("PALLAS_AXON_POOL_IPS", None)
    item.ihook.pytest_runtest_logstart(nodeid=item.nodeid,
                                       location=item.location)
    t0 = _time.perf_counter()
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-x", "-q", "--no-header",
         "-p", "no:cacheprovider", item.nodeid],
        env=env, capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=3600)
    dt = _time.perf_counter() - t0
    ok = r.returncode == 0
    rep = TestReport(
        nodeid=item.nodeid, location=item.location, keywords={},
        outcome="passed" if ok else "failed",
        longrepr=None if ok else
        f"isolated subprocess rc={r.returncode}\n--- stdout ---\n"
        f"{r.stdout[-6000:]}\n--- stderr ---\n{r.stderr[-3000:]}",
        when="call", duration=dt)
    item.ihook.pytest_runtest_logreport(report=rep)
    item.ihook.pytest_runtest_logfinish(nodeid=item.nodeid,
                                        location=item.location)
    return True


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.key(0)
