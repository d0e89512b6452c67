"""Multi-host (multi-process) smoke test on the CPU backend.

Launches TWO real processes that form a JAX multi-controller job over
localhost (parallel/multihost.py — the analog of the reference's
torch.distributed.launch path, README.md:127-145), builds the 1-D data mesh
over the union of both processes' devices, runs a psum through the
``dp_jit`` wrapper, and checks process-0 gating.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")

from moco_flow_tpu.parallel.multihost import (
    is_main, maybe_init_distributed, process_count)

rank = int(sys.argv[1])
assert maybe_init_distributed("localhost:{port}", 2, rank)
assert process_count() == 2
assert jax.device_count() == 2, jax.devices()
assert jax.local_device_count() == 1
assert is_main() == (rank == 0)

import jax.numpy as jnp
from moco_flow_tpu.parallel.mesh import (
    dp_jit, fold_key_if, make_mesh, pmean_if)

mesh = make_mesh()  # spans BOTH processes' devices
assert int(mesh.devices.size) == 2


def make_step(axis_name):
    def step(params, opt_state, key):
        # distinct per-chip stream -> different grads per chip; pmean must
        # agree across processes (it rides the cross-process collective)
        k = fold_key_if(axis_name, key)
        g = jnp.mean(jax.random.uniform(k, (8,)))
        g = pmean_if(axis_name, g)
        params = params - 0.1 * g
        return params, opt_state, {{"g": g}}
    return step


step = dp_jit(make_step, mesh, donate_argnums=())
params, _, metrics = step(jnp.float32(1.0), None, jax.random.key(0))
print(f"RANK{{rank}} g={{float(metrics['g']):.6f}} p={{float(params):.6f}}",
      flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh(tmp_path):
    port = _free_port()
    code = _WORKER.format(repo=REPO, port=port)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # axon sitecustomize re-registers
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=1"])
    procs = [subprocess.Popen([sys.executable, "-c", code, str(rank)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for rank in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
    # the psum-averaged quantity must be IDENTICAL across processes
    lines = {o.strip().splitlines()[-1] for o in outs}
    vals = {l.split("g=")[1] for l in lines}
    assert len(vals) == 1, f"cross-process pmean disagreed: {lines}"


def test_dist_without_coordinator_fails_loudly(monkeypatch):
    """--dist (require=True) with no coordinator configured and failing
    auto-detection must RAISE — N hosts silently training N independent
    jobs was the failure mode (each would think it is process 0)."""
    import pytest

    from moco_flow_tpu.parallel.multihost import maybe_init_distributed

    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)

    import jax
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda *a, **k: (_ for _ in ()).throw(ValueError("no cluster")))
    # non-require (plain single-process run): silently skips, returns False
    assert maybe_init_distributed() is False
    # require=True (the --dist path): auto-detect fails -> loud error
    with pytest.raises(RuntimeError, match="--dist"):
        maybe_init_distributed(require=True)
