import jax
import jax.numpy as jnp
import numpy as np
import optax

from moco_flow_tpu.train.optim import (
    lookahead,
    make_optimizer,
    make_schedule,
    zero_grads_where,
)


def test_steplr_schedule():
    s = make_schedule({"type": "steplr", "decay_step": [100, 200],
                       "decay_gamma": 0.5}, 1e-3)
    np.testing.assert_allclose(float(s(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(s(150)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(250)), 2.5e-4, rtol=1e-6)


def test_steplr_world_size_division():
    s = make_schedule({"type": "steplr", "decay_step": [100],
                       "decay_gamma": 0.5}, 1.0, world_size=4)
    assert float(s(24)) == 1.0
    assert float(s(26)) == 0.5  # milestone 100/4=25


def test_other_schedules():
    e = make_schedule({"type": "explr", "lr_decay": 0.9}, 1.0)
    np.testing.assert_allclose(float(e(2)), 0.81, rtol=1e-6)
    c = make_schedule({"type": "cosine", "num_epochs": 100}, 1.0)
    assert float(c(0)) > 0.99 and float(c(100)) < 1e-6
    p = make_schedule({"type": "poly", "num_epochs": 100, "poly_exp": 2}, 1.0)
    np.testing.assert_allclose(float(p(50)), 0.25, rtol=1e-6)


def test_make_optimizer_all_types_step():
    params = {"w": jnp.ones((4, 4))}
    grads = {"w": jnp.full((4, 4), 0.1)}
    for kind in ["sgd", "adam", "radam", "ranger"]:
        opt = make_optimizer({"type": kind, "lr": 0.01, "weight_decay": 0,
                              "momentum": 0.9})
        state = opt.init(params)
        for _ in range(3):
            upd, state = opt.update(grads, state, params)
            params2 = optax.apply_updates(params, upd)
        assert np.all(np.isfinite(np.asarray(params2["w"]))), kind


def test_lookahead_sync():
    """After sync_period steps the fast weights land on the interpolated slow
    weights."""
    opt = lookahead(optax.sgd(0.1), sync_period=2, slow_step_size=0.5)
    params = {"w": jnp.zeros(())}
    state = opt.init(params)
    grads = {"w": jnp.ones(())}
    # step 1: plain sgd -> -0.1 ; step 2 (sync): fast would be -0.2,
    # slow = 0 + 0.5*(-0.2 - 0) = -0.1 -> params = -0.1
    for _ in range(2):
        upd, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, upd)
    np.testing.assert_allclose(float(params["w"]), -0.1, atol=1e-6)


def test_zero_grads_where():
    grads = {"coarse_NeRF": {"trunk": [{"w": jnp.ones(3)}],
                             "sigma": {"w": jnp.ones(3)},
                             "rgb": {"w": jnp.ones(3)}},
             "bw_NoF": {"head": {"w": jnp.ones(3)}}}
    from moco_flow_tpu.train.stage_mocoflow import _freeze_density
    out = zero_grads_where(grads, _freeze_density)
    assert np.all(np.asarray(out["coarse_NeRF"]["trunk"][0]["w"]) == 0)
    assert np.all(np.asarray(out["coarse_NeRF"]["sigma"]["w"]) == 0)
    assert np.all(np.asarray(out["coarse_NeRF"]["rgb"]["w"]) == 1)
    assert np.all(np.asarray(out["bw_NoF"]["head"]["w"]) == 1)
