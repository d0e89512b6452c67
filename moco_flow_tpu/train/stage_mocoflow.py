"""Stage 3: joint MoCo-Flow coarse-to-fine trainer.

Capability parity with the reference ``trainer/trainer_moco_flow.py`` — the
stage that matters most:

  - pretrained-weight surgery: fine-NeRF sigma branch into BOTH NeRFs, rgb
    branch re-initialized (ref :54-62); pretrained NoFs (ref :66-70).
  - windowed PE annealing between coarse2fine_start/end_iter (ref :270-305),
    computed *in-graph* as a pure function of the step (no recompiles).
  - density-branch freeze before c2f start (ref :390-404) via gradient
    masking (state-shape-stable; see optim.zero_grads_where).
  - three-phase NoF-supervision schedule keyed on the step (ref :419-438),
    realized as a small set of compiled step variants.
  - dual optimizer: 'moco' over everything + 'nof' over the NoFs, both
    stepping on the same gradients — NoF params receive two updates during
    phase 1; the reference then deletes the nof optimizer at the first
    no-NoF-data step (ref :121-139, :374-377, base.py:188-197). Reproduced
    exactly, including the deletion.
  - losses: MSE image, local/global motion-consensus, L1 NoF supervision on
    inside points, BCE alpha-mask on NoF-warped outside points with the
    softplus trick (ref :141-144, :146-157, :307-379).

Each phase variant is ONE jitted function: frame pick, ray sampling with
random background, chained-frame index, megabatch render, correspondence
sampling + KNN, all losses, grads, both optimizers.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..data.correspondence import CorrespondenceTable, sample_correspondences
from ..data.dataset import get_dataset, sample_train_rays
from ..nn.embedding import anneal_weights
from ..nn.losses import image_loss, masked_bce, masked_loss
from ..nn.metrics import dssim, psnr
from ..nn.nerf import nerf_sigma
from ..parallel.mesh import (
    FRAME_SAMPLING_POLICIES, dp_jit, fold_key_if, pmean_if, sample_frame)
from ..render.volume import embed_padded, encode_nerf_xyz, render_rays
from .base import BaseTrainer
from .checkpoint import (
    load_checkpoint,
    merge_into,
    transfer_pretrained_nerf,
    transfer_pretrained_nof,
)
from .factory import build_statics, init_params, render_config
from .optim import make_optimizer, zero_grads_where
from .stage_nof import nof_points


def _freeze_density(path_key: str) -> bool:
    """Frozen subtrees before c2f start: NeRF trunk + sigma head; the rgb
    branch (final/extra/rgb) stays trainable (ref :390-404)."""
    parts = path_key.split("/")
    return len(parts) >= 2 and parts[0].endswith("NeRF") and \
        parts[1] in ("trunk", "sigma")


class MoCoFlowTrainer(BaseTrainer):

    def prepare_dataloader(self, data_config):
        self.train_dataset = get_dataset(data_config, "train",
                                         smpl_data=self.smpl_data)
        self.val_dataset = get_dataset(data_config, "val",
                                       smpl_data=self.smpl_data)
        self.num_frames = self.train_dataset.num_frames

    def build_model(self, model_config):
        loss_cfg = self.config["loss"]
        self.chain_local = bool(loss_cfg.get("chain_local", False))
        self.chain_global = bool(loss_cfg.get("chain_global", False))
        with_fw = self.chain_local or self.chain_global

        self.statics = build_statics(model_config)
        key = jax.random.key(self.config.seed or 0)
        self.params = init_params(key, model_config, self.statics,
                                  with_nerf=True, with_nof=True,
                                  with_fw_nof=with_fw)

        if model_config.get("pretrained_nerf"):
            tree, _ = load_checkpoint(model_config["pretrained_nerf"])
            self.params = transfer_pretrained_nerf(self.params, tree)
            self.record_str("loaded pretrained NeRF sigma branch (fine->both)")
        else:
            self.record_str("NOT loading pretrained NeRF !!!")
        if model_config.get("pretrained_nof"):
            tree, _ = load_checkpoint(model_config["pretrained_nof"])
            self.params = transfer_pretrained_nof(self.params, tree)
            self.record_str("loaded pretrained NoFs")
        else:
            self.record_str("NOT loading pretrained NoF !!!")
        if model_config.get("pretrained_path"):
            tree, _ = load_checkpoint(model_config["pretrained_path"])
            self.params = merge_into(self.params, tree.get("params", tree))

        self.c2f = bool(model_config.get("coarse_to_fine", False))
        tcfg = self.config["trainer"]
        self.c2f_start = int(tcfg.get("coarse2fine_start_iter", 0))
        self.c2f_end = int(tcfg.get("coarse2fine_end_iter", 1))

        self.rcfg_train = render_config(
            model_config, use_nof=True, chain_local=self.chain_local,
            chain_global=self.chain_global)
        # val only consumes rgb/psnr/ssim: chain losses off (frame rays carry
        # no chained-index column, and the consensus scalars would be wasted
        # NoF passes on a bogus frame index)
        self.rcfg_val = render_config(
            model_config, use_nof=True, chain_local=False,
            chain_global=False, perturb=0.0)
        self.rcfg_test = render_config(model_config, use_nof=True,
                                       test_time=True, perturb=0.0)
        self.rcfg_test_cano = render_config(model_config, use_nof=False,
                                            test_time=True, perturb=0.0)

        self.w = {
            "img": loss_cfg["img_loss"].get("weight", 1.0),
            "local": loss_cfg.get("nof_local_weight", 0.0),
            "global": loss_cfg.get("nof_global_weight", 0.0),
            "nof": loss_cfg["nof_loss"].get("weight", 0.0),
            "msk": loss_cfg["msk_loss"].get("weight", 0.0),
        }
        self.img_loss_kind = loss_cfg["img_loss"].get("type", "MSE")
        self.nof_loss_kind = loss_cfg["nof_loss"].get("type", "L1")

    def configure_optimizers(self, optimizer_config, scheduler_config):
        # milestones are divided by world_size so LR decay lands at the same
        # *global* step under DP (ref trainer/base.py:147: optax counts
        # optimizer updates while the clock ticks by world_size)
        self.opt_moco = make_optimizer(optimizer_config["moco"],
                                       scheduler_config,
                                       world_size=self.world_size)
        self.opt_nof = make_optimizer(optimizer_config["nof"],
                                      scheduler_config,
                                      world_size=self.world_size)
        nof_sub = self._nof_subtree(self.params)
        self.opt_state = {
            "moco": self.opt_moco.init(self.params),
            "nof": self.opt_nof.init(nof_sub),
        }
        # the reference deletes the nof optimizer at the first step where the
        # NoF-data schedule yields None (ref :374-377); persisted in ckpt extra
        self.nof_opt_deleted = False

    @staticmethod
    def _nof_subtree(params):
        return {k: params[k] for k in ("bw_NoF", "fw_NoF") if k in params}

    # ------------------------------------------------------------------

    def anneal(self, step=None):
        """In-graph PE annealing weights (ref :270-305 + zero init :112-114)."""
        step = self.clock.step if step is None else step
        out = {}
        if self.statics.nerf_xyz.n_freqs > 0:
            out["nerf_xyz"] = (
                anneal_weights(jnp.asarray(step), self.statics.nerf_xyz.n_freqs,
                               self.c2f_start, self.c2f_end)
                if self.c2f else jnp.ones(self.statics.nerf_xyz.n_freqs))
        if self.statics.nof_xyz and self.statics.nof_xyz.n_freqs > 0:
            out["nof_xyz"] = (
                anneal_weights(jnp.asarray(step), self.statics.nof_xyz.n_freqs,
                               self.c2f_start, self.c2f_end)
                if self.c2f else jnp.ones(self.statics.nof_xyz.n_freqs))
        return out

    def phase(self, step: int):
        """(nof_mode, freeze_density) for a global step (ref :390-404,
        :419-438)."""
        freeze = step <= self.c2f_start
        if step < self.c2f_start:
            nof_mode = "full"
        elif step < self.c2f_end:
            nof_mode = "msk" if (step // 1000) % 10 == 0 else "none"
        else:
            nof_mode = "msk"
        return nof_mode, freeze

    # ------------------------------------------------------------------

    def _losses(self, params, anneal, rays, rgbs, bg, corr, norm_idx, key,
                nof_mode: str):
        """All stage-3 losses for one ray/correspondence batch
        (ref _shared_step :307-379)."""
        statics, rcfg, w = self.statics, self.rcfg_train, self.w
        losses = {}
        # per-MLP rematerialization is governed by rcfg.remat (model.remat)
        res = render_rays(params, statics, anneal, rays, bg, key, rcfg)
        losses["img_loss"] = image_loss(res, rgbs, self.img_loss_kind) * w["img"]
        if self.chain_local:
            v = res["nof_local_disp_coarse"]
            if "nof_local_disp_fine" in res:
                v = v + res["nof_local_disp_fine"]
            losses["nof_local"] = v * w["local"]
        if self.chain_global:
            v = res["nof_global_disp_coarse"]
            if "nof_global_disp_fine" in res:
                v = v + res["nof_global_disp_fine"]
            losses["nof_global"] = v * w["global"]

        if nof_mode != "none" and corr is not None:
            query, cano, inside = corr["query"], corr["cano"], corr["inside"]
            bw = nof_points(params["bw_NoF"], statics, anneal, query,
                            norm_idx, rcfg)
            if nof_mode == "full":
                losses["nof_bw"] = masked_loss(
                    bw, cano, inside, self.nof_loss_kind) * w["nof"]
                if "fw_NoF" in params:
                    fw = nof_points(params["fw_NoF"], statics, anneal, cano,
                                    norm_idx, rcfg)
                    losses["nof_fw"] = masked_loss(
                        fw, query, inside, self.nof_loss_kind) * w["nof"]
            if w["msk"] > 0:
                # alpha-mask loss: NoF-warped outside points must be empty in
                # the canonical field; softplus trick (ref :146-157, :348-363)
                outside = ~inside
                x_emb = encode_nerf_xyz(params["coarse_NeRF"], statics.coarse,
                                        statics, bw, anneal)
                d_c = 1.0 / rcfg.n_samples
                sig_c = nerf_sigma(params["coarse_NeRF"], x_emb, statics.coarse)
                a_c = 1.0 - jnp.exp(-d_c * jax.nn.softplus(sig_c[:, 0]))
                msk = masked_bce(a_c, outside, 0.0)
                if "fine_NeRF" in params and rcfg.n_importance > 0:
                    d_f = 1.0 / (rcfg.n_samples + rcfg.n_importance)
                    x_emb_f = encode_nerf_xyz(params["fine_NeRF"],
                                              statics.fine, statics, bw,
                                              anneal)
                    sig_f = nerf_sigma(params["fine_NeRF"], x_emb_f,
                                       statics.fine)
                    a_f = 1.0 - jnp.exp(-d_f * jax.nn.softplus(sig_f[:, 0]))
                    msk = 0.5 * (msk + masked_bce(a_f, outside, 0.0))
                losses["alphas_mask"] = msk * w["msk"]
        typ = "rgb_fine" if "rgb_fine" in res else "rgb_coarse"
        return losses, psnr(jax.lax.stop_gradient(res[typ]), rgbs)

    def _make_step_variant(self, nof_mode: str, freeze: bool,
                           nof_opt_active: bool):
        ds = self.train_dataset
        n_rand = self.config["model"]["N_rand"]
        n_sampled = self.config["model"].get("N_sampled", 1000)
        num_frames = self.num_frames
        rand_bkgd, has_alpha = ds.rand_bkgd, ds.has_alpha
        chain_global = self.chain_global
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
            def step(params, opt_state, step_idx, table, directions,
                     images, bkgd, corr_verts, corr_chain):
                # key derived in-graph from the step index (a host-side
                # fold_in costs 3 extra tiny program dispatches per step)
                key = jax.random.fold_in(jax.random.key(seed), step_idx)
                key = fold_key_if(axis, key)
                k_f, k_r, k_chain, k_corr, k_render = jax.random.split(key, 5)
                frame = sample_frame(frame_sampling, seed, axis, step_idx,
                                     num_frames, k_f)
                rays, rgbs, bg = sample_train_rays(
                    table, directions, images, bkgd, frame, k_r, n_rand,
                    rand_bkgd, has_alpha)
                if chain_global:
                    cf = jax.random.randint(k_chain, (), 0, num_frames)
                    cidx = cf.astype(jnp.float32) * 2.0 / num_frames - 1.0
                    rays = jnp.concatenate(
                        [rays, jnp.full((n_rand, 1), 0.0) + cidx], axis=1)

                corr = None
                if nof_mode != "none":
                    ctable = CorrespondenceTable(corr_verts, corr_chain)
                    corr = sample_correspondences(
                        ctable, frame, k_corr, num_sampled=n_sampled,
                        thickness=0.2)
                anneal = trainer.anneal(step_idx)
                norm_idx = table.norm_idx[frame]

                def loss_fn(p):
                    losses, tp = trainer._losses(
                        p, anneal, rays, rgbs, bg, corr, norm_idx, k_render,
                        nof_mode)
                    return sum(losses.values()), (losses, tp)

                (_, (losses, train_psnr)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                if freeze:
                    grads = zero_grads_where(grads, _freeze_density)
                grads = pmean_if(axis, grads)

                upd, moco_state = trainer.opt_moco.update(
                    grads, opt_state["moco"], params)
                params = optax.apply_updates(params, upd)
                nof_state = opt_state["nof"]
                if nof_opt_active:
                    nof_grads = trainer._nof_subtree(grads)
                    nof_sub = trainer._nof_subtree(params)
                    nupd, nof_state = trainer.opt_nof.update(
                        nof_grads, nof_state, nof_sub)
                    nof_sub = optax.apply_updates(nof_sub, nupd)
                    params = {**params, **nof_sub}

                metrics = dict(losses)
                metrics["train_psnr"] = train_psnr
                return params, {"moco": moco_state, "nof": nof_state}, \
                    pmean_if(axis, metrics)
            return step

        return dp_jit(make_step, self.mesh, donate_argnums=(0, 1))

    def build_steps(self):
        self._step_variants = {}
        self._corr = self.train_dataset.correspondence_table

    def train_step(self):
        step = self.clock.step
        nof_mode, freeze = self.phase(step)
        if nof_mode == "none":
            self.nof_opt_deleted = True  # ref :374-377
        nof_opt_active = (not self.nof_opt_deleted)
        variant = (nof_mode, freeze, nof_opt_active)
        if variant not in self._step_variants:
            self._step_variants[variant] = self._make_step_variant(*variant)
        ds = self.train_dataset
        self.params, self.opt_state, metrics = self._step_variants[variant](
            self.params, self.opt_state, jnp.asarray(step, jnp.int32),
            ds.table, ds.directions_flat, ds.images, ds.bkgd_img,
            self._corr.verts, self._corr.src_to_cano)
        metrics["state/nerf"] = 0.0 if freeze else 1.0
        if self.logger is not None and \
                step % self.config["trainer"].get("log_freq", 100) == 0:
            # PE-annealing weight histograms (ref trainer_moco_flow.py:384-388)
            for name, w in self.anneal(step).items():
                self.logger.histogram(f"weights/{name}", w, step)
        return metrics

    # ------------------------------------------------------------------

    def val_step(self):
        ds = self.val_dataset
        idx = int(self.val_rng().integers(ds.num_frames))
        rays, _ = ds.frame_rays(idx)
        rgbs = ds.frame_rgbs(idx)
        if rgbs is None:
            return {}
        res = self.render_rays_chunked(rays, ds.bkgd_img, self.rcfg_val,
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

    # ------------------------------------------------------------------

    def extra_state(self):
        return {"nof_opt_deleted": self.nof_opt_deleted}

    def load_extra_state(self, extra):
        self.nof_opt_deleted = bool(extra.get("nof_opt_deleted", False))

    def visualize_batch(self, save_path=None):
        from .vis import visualize_frame, visualize_mesh, visualize_spherical
        tcfg = self.config["trainer"]
        n_val = self.clock.step // max(tcfg.get("val_every_n_step", 1), 1)
        if n_val % tcfg.get("vis_img_every_n_val", 1) == 0:
            visualize_frame(self, -1, use_nof=False, save_path=save_path)
        if n_val % tcfg.get("vis_mesh_video_every_n_val", 5) == 0:
            visualize_spherical(self, -1, use_nof=False, save_path=save_path)
            visualize_mesh(self, -1, save_path=save_path)
