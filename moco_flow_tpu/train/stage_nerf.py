"""Stage 1: canonical NeRF initialization trainer.

Capability parity with the reference ``trainer/trainer_nerf.py``: train a
coarse+fine dir-conditioned NeRF to overfit the multi-view renders of the
frame-0 posed SMPL (the ``init_nerf`` data), with masked random-ray batches,
PSNR/SSIM validation, and frame/mesh/spherical-video visualization.

TPU-native: the whole step — frame pick, ray sampling, rendering, loss, grads,
optimizer — is ONE jitted function; under a mesh it runs in shard_map with each
chip drawing its own rays and a psum-mean over gradients.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..data.dataset import get_dataset, sample_train_rays
from ..nn.losses import image_loss
from ..nn.metrics import dssim, psnr
from ..parallel.mesh import dp_jit, fold_key_if, pmean_if
from ..render.volume import render_rays
from .base import BaseTrainer
from .checkpoint import load_checkpoint
from .factory import build_statics, init_params, render_config
from .optim import make_optimizer


class NeRFTrainer(BaseTrainer):

    def prepare_dataloader(self, data_config):
        self.train_dataset = get_dataset(data_config, "train",
                                         smpl_data=self.smpl_data)
        self.val_dataset = get_dataset(data_config, "val",
                                       smpl_data=self.smpl_data)
        self.num_frames = self.train_dataset.num_frames

    def build_model(self, model_config):
        self.statics = build_statics(model_config)
        key = jax.random.key(self.config.seed or 0)
        self.params = init_params(key, model_config, self.statics)
        self.loss_kind = self.config["loss"].get("type", "MSE") \
            if isinstance(self.config["loss"], dict) else "MSE"
        self.rcfg_train = render_config(model_config)
        # deterministic validation sampling (perturb=0) so val PSNR is not
        # noised by stratified jitter — stage 3 already does this
        self.rcfg_val = render_config(model_config, perturb=0.0)
        self.rcfg_test = render_config(model_config, test_time=True, perturb=0.0)
        if model_config.get("pretrained_path"):
            tree, _ = load_checkpoint(model_config["pretrained_path"])
            from .checkpoint import merge_into
            self.params = merge_into(self.params, tree.get("params", tree))

    def configure_optimizers(self, optimizer_config, scheduler_config):
        self.optimizer = make_optimizer(optimizer_config, scheduler_config,
                                        world_size=self.world_size)
        self.opt_state = self.optimizer.init(self.params)

    # ------------------------------------------------------------------

    def build_steps(self):
        ds = self.train_dataset
        statics, rcfg = self.statics, self.rcfg_train
        n_rand = self.config["model"]["N_rand"]
        num_frames = self.num_frames
        loss_kind = self.loss_kind
        optimizer = self.optimizer
        rand_bkgd, has_alpha = ds.rand_bkgd, ds.has_alpha

        seed = self.config.seed or 0

        def make_step(axis):
            def step(params, opt_state, step_idx, table, directions, images,
                     bkgd):
                # key derived in-graph: a host-side fold_in would dispatch
                # 3 extra tiny programs per step over the TPU tunnel
                key = jax.random.fold_in(jax.random.key(seed), step_idx)
                key = fold_key_if(axis, key)
                k_f, k_r, k_render = jax.random.split(key, 3)
                frame = jax.random.randint(k_f, (), 0, num_frames)
                rays, rgbs, bg = sample_train_rays(
                    table, directions, images, bkgd, frame, k_r, n_rand,
                    rand_bkgd, has_alpha)

                def loss_fn(p):
                    # per-MLP remat via rcfg.remat (model.remat)
                    res = render_rays(p, statics, {}, rays, bg, k_render, rcfg)
                    loss = image_loss(res, rgbs, loss_kind)
                    typ = "rgb_fine" if "rgb_fine" in res else "rgb_coarse"
                    return loss, psnr(res[typ], rgbs)

                (loss, train_psnr), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                grads = pmean_if(axis, grads)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                metrics = pmean_if(axis, {"img_loss": loss,
                                          "train_psnr": train_psnr})
                return params, opt_state, metrics
            return step

        self._train_step = dp_jit(make_step, self.mesh)

    def train_step(self):
        ds = self.train_dataset
        step_idx = jnp.asarray(self.clock.step, jnp.int32)
        self.params, self.opt_state, metrics = self._train_step(
            self.params, self.opt_state, step_idx, ds.table,
            ds.directions_flat, ds.images, ds.bkgd_img)
        return metrics

    # ------------------------------------------------------------------

    def val_step(self):
        ds = self.val_dataset
        idx = int(self.val_rng().integers(ds.num_frames))
        rays, _ = ds.frame_rays(idx)
        rgbs = ds.frame_rgbs(idx)
        if rgbs is None:
            return {}
        bg = ds.bkgd_img
        res = self.render_rays_chunked(rays, bg, self.rcfg_val,
                                       anneal=self.anneal())
        typ = "rgb_fine" if "rgb_fine" in res else "rgb_coarse"
        h, w = ds.size
        pred = res[typ].reshape(h, w, 3)
        gt = rgbs.reshape(h, w, 3)
        return {
            "val_psnr": float(psnr(res[typ], rgbs)),
            "ssim": float(dssim(pred.transpose(2, 0, 1)[None],
                                gt.transpose(2, 0, 1)[None])),
        }

    def anneal(self):
        return {}

    # ------------------------------------------------------------------

    def visualize_batch(self, save_path=None):
        from .vis import visualize_frame, visualize_mesh, visualize_spherical
        tcfg = self.config["trainer"]
        n_val = self.clock.step // max(tcfg.get("val_every_n_step", 1), 1)
        if n_val % tcfg.get("vis_img_every_n_val", 1) == 0:
            idx = int(self.val_rng().integers(self.val_dataset.num_frames))
            visualize_frame(self, idx, use_nof=False, save_path=save_path)
        if n_val % tcfg.get("vis_mesh_video_every_n_val", 5) == 0:
            visualize_mesh(self, frame_idx=-1, save_path=save_path)
            visualize_spherical(self, frame_idx=-1, use_nof=False,
                                save_path=save_path)
