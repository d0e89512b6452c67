"""Stage 2: NoF (motion flow) pretraining trainer.

Capability parity with the reference ``trainer/trainer_nof.py``: pretrain the
backward and forward NoF MLPs on SMPL frame correspondences with bidirectional
L1 (both inside and outside points contribute, ref trainer_nof.py:115-125),
100k points/step.

TPU-native: the reference calls SMPL FK + CUDA KNN synchronously per step; here
the correspondence table is precomputed once and the whole step (sampling, KNN
matmul, two MLP evals, grads, adam) is one jitted function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..data.correspondence import sample_correspondences
from ..data.dataset import get_dataset
from ..nn.losses import l1
from ..parallel.mesh import (
    FRAME_SAMPLING_POLICIES, dp_jit, fold_key_if, pmean_if, sample_frame)
from ..render.volume import RenderConfig, nof_warp
from .base import BaseTrainer
from .checkpoint import load_checkpoint, merge_into
from .factory import build_statics, init_params
from .optim import make_optimizer


def nof_points(params_nof, statics, anneal, pts: jnp.ndarray,
               norm_idx: jnp.ndarray, rcfg: RenderConfig) -> jnp.ndarray:
    """Warp a flat (N, 3) point set for one frame index — the trainer-level
    forward_nof (ref trainer_nof.py:85-113 / trainer_moco_flow.py:159-187)."""
    out = nof_warp(params_nof, statics, anneal, pts[None],
                   norm_idx.reshape(1, 1), rcfg)
    return out[0]


class NoFTrainer(BaseTrainer):

    def prepare_dataloader(self, data_config):
        self.train_dataset = get_dataset(data_config, "train",
                                         smpl_data=self.smpl_data)
        self.val_dataset = self.train_dataset  # same meta; val draws fresh pts
        self.num_frames = self.train_dataset.num_frames

    def build_model(self, model_config):
        self.statics = build_statics(model_config)
        key = jax.random.key(self.config.seed or 0)
        self.params = init_params(key, model_config, self.statics,
                                  with_nerf=False, with_nof=True,
                                  with_fw_nof=True)
        self.rcfg = RenderConfig(use_nof=True)
        if model_config.get("pretrained_nof"):
            tree, _ = load_checkpoint(model_config["pretrained_nof"])
            self.params = merge_into(self.params, tree.get("params", tree))
        if model_config.get("pretrained_path"):
            tree, _ = load_checkpoint(model_config["pretrained_path"])
            self.params = merge_into(self.params, tree.get("params", tree))

    def configure_optimizers(self, optimizer_config, scheduler_config):
        self.optimizer = make_optimizer(optimizer_config, scheduler_config,
                                        world_size=self.world_size)
        self.opt_state = self.optimizer.init(self.params)

    # ------------------------------------------------------------------

    def _loss(self, params, corr, norm_idx):
        """Bidirectional L1 over all sampled points
        (ref trainer_nof.py:115-125)."""
        statics, rcfg = self.statics, self.rcfg
        anneal = {}
        query, cano = corr["query"], corr["cano"]
        bw = nof_points(params["bw_NoF"], statics, anneal, query, norm_idx, rcfg)
        fw = nof_points(params["fw_NoF"], statics, anneal, cano, norm_idx, rcfg)
        return {"nof_bw": l1(bw, cano), "nof_fw": l1(fw, query)}

    def build_steps(self):
        ds = self.train_dataset
        n_sampled = self.config["model"]["N_sampled"]
        num_frames = self.num_frames
        optimizer = self.optimizer
        corr_table = ds.correspondence_table
        trainer = self

        seed = self.config.seed or 0
        # frame visitation policy (PARITY.md NoF-gap study; see
        # parallel/mesh.py::sample_frame for the three policies)
        frame_sampling = self.config["model"].get("frame_sampling", "uniform")
        if frame_sampling not in FRAME_SAMPLING_POLICIES:
            raise ValueError("model.frame_sampling must be one of "
                             f"{FRAME_SAMPLING_POLICIES}, "
                             f"got {frame_sampling!r}")

        def make_step(axis):
            def step(params, opt_state, step_idx, table_verts, table_chain,
                     norm_table):
                from ..data.correspondence import CorrespondenceTable
                table = CorrespondenceTable(table_verts, table_chain)
                key = jax.random.fold_in(jax.random.key(seed), step_idx)
                key = fold_key_if(axis, key)
                k_f, k_c = jax.random.split(key)
                frame = sample_frame(frame_sampling, seed, axis, step_idx,
                                     num_frames, k_f)
                corr = sample_correspondences(table, frame, k_c,
                                              num_sampled=n_sampled,
                                              thickness=0.1)
                norm_idx = norm_table[frame]

                def loss_fn(p):
                    losses = trainer._loss(p, corr, norm_idx)
                    return sum(losses.values()), losses

                (_, losses), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                grads = pmean_if(axis, grads)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, pmean_if(axis, losses)
            return step

        self._train_step = dp_jit(make_step, self.mesh, donate_argnums=(0, 1))
        self._corr = corr_table

    def train_step(self):
        step_idx = jnp.asarray(self.clock.step, jnp.int32)
        self.params, self.opt_state, metrics = self._train_step(
            self.params, self.opt_state, step_idx, self._corr.verts,
            self._corr.src_to_cano, self.train_dataset.table.norm_idx)
        return metrics

    def val_step(self):
        """Fresh 10k-point sample, loss only (ref trainer_nof.py:135-140)."""
        ds = self.val_dataset
        key = jax.random.fold_in(jax.random.key(777), self.clock.step)
        k_f, k_c = jax.random.split(key)
        frame = int(jax.random.randint(k_f, (), 0, self.num_frames))
        corr = ds.get_frame_correspondence(frame, k_c, num_sampled=10000)
        losses = self._loss(self.params, corr,
                            ds.table.norm_idx[frame])
        return {f"val_{k}": float(v) for k, v in losses.items()}

    def visualize_batch(self, save_path=None):
        pass  # parity: the reference NoF trainer has no visualization
