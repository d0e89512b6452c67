import jax
import pytest
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


def test_trainers_wire_world_size_into_schedule(monkeypatch):
    """Every trainer passes its world_size to make_optimizer so steplr decay
    lands at the same GLOBAL step under DP (ADVICE.md r1; ref base.py:147)."""
    from moco_flow_tpu.train import optim as optim_mod
    from moco_flow_tpu.train import stage_mocoflow, stage_nerf, stage_nof
    seen = {}
    real = optim_mod.make_optimizer

    def spy(cfg, sched=None, world_size=1):
        seen["world_size"] = world_size
        return real(cfg, sched, world_size)

    for mod in (stage_nerf, stage_nof, stage_mocoflow):
        monkeypatch.setattr(mod, "make_optimizer", spy)

    class Fake:
        world_size = 8
        params = {"w": jnp.zeros((2,))}
    for cls, ocfg in ((stage_nerf.NeRFTrainer, {"type": "adam", "lr": 1e-3}),
                      (stage_nof.NoFTrainer, {"type": "adam", "lr": 1e-3})):
        fake = Fake()
        seen.clear()
        cls.configure_optimizers(fake, ocfg, None)
        assert seen["world_size"] == 8, cls
    fake = Fake()
    fake._nof_subtree = lambda p: p
    seen.clear()
    stage_mocoflow.MoCoFlowTrainer.configure_optimizers(
        fake, {"moco": {"type": "adam", "lr": 1e-3},
               "nof": {"type": "adam", "lr": 1e-3}}, None)
    assert seen["world_size"] == 8


def test_adamw_warmup_matches_reference_torch():
    """The adamw optimizer reproduces the reference's custom AdamW-with-warmup
    (utils/optimizers.py:173-244) step for step, including the decoupled
    weight decay scaled by the warmed-up LR."""
    import numpy as np
    torch = pytest.importorskip("torch")
    import importlib.util as ilu
    spec = ilu.spec_from_file_location(
        "ref_optimizers", "/root/reference/utils/optimizers.py")
    ref_opt = ilu.module_from_spec(spec)
    spec.loader.exec_module(ref_opt)

    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    grads_seq = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(8)]

    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = ref_opt.AdamW([p], lr=1e-2, weight_decay=0.01, warmup=5)
    for g in grads_seq:
        p.grad = torch.from_numpy(g)
        topt.step()
    want = p.detach().numpy()

    from moco_flow_tpu.train.optim import adamw_warmup
    opt = adamw_warmup(1e-2, weight_decay=0.01, warmup=5)
    params = {"w": jnp.asarray(w0)}
    state = opt.init(params)
    for g in grads_seq:
        upd, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, upd)
    np.testing.assert_allclose(np.asarray(params["w"]), want,
                               atol=1e-6, rtol=1e-5)


def test_make_optimizer_adamw():
    from moco_flow_tpu.train.optim import make_optimizer
    opt = make_optimizer({"type": "adamw", "lr": 1e-3, "weight_decay": 0.01,
                          "warmup": 10})
    params = {"w": jnp.ones((3,))}
    state = opt.init(params)
    upd, state = opt.update({"w": jnp.ones((3,))}, state, params)
    assert jnp.all(jnp.isfinite(upd["w"]))
