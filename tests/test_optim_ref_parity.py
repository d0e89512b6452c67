"""Optimizer trajectory parity vs the ACTUAL reference implementations.

Drives /root/reference/utils/optimizers.py (RAdam :6-95, AdamW-with-warmup
:173-244, Ranger=RAdam+Lookahead :266-405) and the optax-based rebuilds
(train/optim.py) with IDENTICAL initial weights and gradient sequences for
50 steps and asserts the parameter trajectories agree.

Known, accepted numeric difference: optax's scale_by_radam adds eps to
sqrt(nu_hat) (bias-corrected) where the reference adds it to sqrt(nu);
for non-degenerate gradients this is ~eps-level and covered by the
tolerances here.
"""

from __future__ import annotations

import importlib.util

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from moco_flow_tpu.train.optim import make_optimizer  # noqa: E402


def _load_ref_optimizers():
    spec = importlib.util.spec_from_file_location(
        "ref_optimizers", "/root/reference/utils/optimizers.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


REF = _load_ref_optimizers()
N_STEPS = 50


def _make_problem(seed=0):
    rng = np.random.default_rng(seed)
    params = {"w": rng.standard_normal((16, 8)).astype(np.float32),
              "b": rng.standard_normal((8,)).astype(np.float32)}
    grads = [{"w": rng.standard_normal((16, 8)).astype(np.float32) * 0.5,
              "b": rng.standard_normal((8,)).astype(np.float32) * 0.5}
             for _ in range(N_STEPS)]
    return params, grads


def _run_torch(opt_ctor, params, grads):
    tp = {k: torch.nn.Parameter(torch.tensor(v)) for k, v in params.items()}
    opt = opt_ctor(list(tp.values()))
    traj = []
    for g in grads:
        for k in tp:
            tp[k].grad = torch.tensor(g[k])
        opt.step()
        traj.append({k: v.detach().numpy().copy() for k, v in tp.items()})
    return traj


def _run_jax(transform, params, grads):
    p = {k: jnp.asarray(v) for k, v in params.items()}
    state = transform.init(p)

    @jax.jit
    def step(p, state, g):
        upd, state = transform.update(g, state, p)
        return jax.tree.map(lambda a, u: a + u, p, upd), state

    traj = []
    for g in grads:
        p, state = step(p, state, {k: jnp.asarray(v) for k, v in g.items()})
        traj.append({k: np.asarray(v) for k, v in p.items()})
    return traj


def _assert_traj_close(ref, ours, atol, checkpoints=(0, 5, 6, 11, 25, 49)):
    for i in checkpoints:
        for k in ref[i]:
            np.testing.assert_allclose(
                ours[i][k], ref[i][k], atol=atol,
                err_msg=f"step {i + 1}, param {k}")


@pytest.mark.parametrize("wd", [0.0, 0.01])
def test_radam_parity(wd):
    params, grads = _make_problem(1)
    ref = _run_torch(lambda ps: REF.RAdam(ps, lr=1e-3, weight_decay=wd),
                     params, grads)
    ours = _run_jax(make_optimizer({"type": "radam", "lr": 1e-3,
                                    "weight_decay": wd}), params, grads)
    # fp32 accumulation noise in the decoupled-decay term is ~2e-7/step
    _assert_traj_close(ref, ours, atol=2e-5)


@pytest.mark.parametrize("wd", [0.0, 0.01])
def test_ranger_parity(wd):
    """Ranger = RAdam(b1=0.95, eps=1e-5) + Lookahead(k=6, alpha=0.5); the
    lookahead sync at steps 6, 12, ... is the part that silently drifts if
    either side counts differently — checkpoints straddle the syncs."""
    params, grads = _make_problem(2)
    ref = _run_torch(lambda ps: REF.Ranger(ps, lr=1e-3, weight_decay=wd),
                     params, grads)
    ours = _run_jax(make_optimizer({"type": "ranger", "lr": 1e-3,
                                    "weight_decay": wd}), params, grads)
    _assert_traj_close(ref, ours, atol=5e-6)


@pytest.mark.parametrize("warmup", [0, 10])
def test_adamw_warmup_parity(warmup):
    params, grads = _make_problem(3)
    ref = _run_torch(
        lambda ps: REF.AdamW(ps, lr=1e-3, weight_decay=0.01, warmup=warmup),
        params, grads)
    ours = _run_jax(make_optimizer({"type": "adamw", "lr": 1e-3,
                                    "weight_decay": 0.01,
                                    "warmup": warmup}), params, grads)
    _assert_traj_close(ref, ours, atol=2e-5)
