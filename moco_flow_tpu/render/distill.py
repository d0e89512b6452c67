"""Student-trunk render distillation: shrink the test-time FLOP floor with
dense matmuls instead of table gathers.

The reference renders through the full 8x256 canonical NeRF forever
(models/nerf.py:27-37 is the FLOP floor of models/rendering.py:195-375).
The instant-ngp-style hash encoding was built as the floor-shrinker, but on
TPU it is measured DEAD: XLA gathers run at ~2 GB/s effective, so the hash
encode's forward alone costs 40x the trunk it replaces (PERF.md round-4,
scripts/probe_hash_gather.py). The TPU-native alternative is knowledge
distillation of the trained canonical field into a NARROWER trunk for
test-time rendering only:

  - a 4x128 student is 8x fewer trunk FLOPs per sample, all MXU matmuls;
  - it drops into the EXISTING machinery unchanged — same PE embeddings,
    same fused Pallas megakernels (width/depth-parameterized), same
    fine_budget / coarse_probe knobs, same occupancy skipping, same NoF
    warps (motion is untouched — only the canonical radiance field is
    approximated);
  - its error is measurable on the same axis as the sampling/occupancy
    knobs: dB vs the teacher's exact render (bench.py --student_axis).

Training only ever sees the teacher; the student is a render-time artifact
(like a baked/compressed model) produced in seconds on the TPU.

Distillation objective: on mixed uniform + self-mined near-surface points
(a hot-point buffer keeps resampling where the teacher has density),
  L = mean w * |rgb_s - rgb_t|^2 + sigma_w * mean (soft(s_s) - soft(s_t))^2
with soft = log1p(activated sigma) (compresses the +-1e2 sigma range so
empty space cannot drown the surface) and w = 1 - exp(-act(sigma_t) * dt)
(rgb only matters where the renderer would composite it).
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp


def _activate(s, activation: str):
    return jax.nn.softplus(s) if activation == "softplus" else jax.nn.relu(s)


def student_config(teacher_cfg, depth: int = 4, width: int = 128):
    """Student NeRFConfig: narrower/shallower, same I/O contract."""
    skips = tuple(s for s in (depth // 2,) if 0 < s < depth) \
        if depth >= 4 else ()
    return dataclasses.replace(teacher_cfg, depth=depth, width=width,
                               skips=skips, encoding="pe", hash=None)


def distill_student(trainer, depth: int = 4, width: int = 128,
                    steps: int = 3000, batch: int = 16384, lr: float = 3e-3,
                    extent: float = 1.5, sigma_weight: float = 1.0,
                    seed: int = 0, swap: bool = True,
                    lr_decay: float = 0.1):
    """Distill the trainer's FINE NeRF into a (depth x width) student and
    (by default) swap it in as the trainer's render-time NeRF (both coarse
    and fine — the same both-from-fine convention the reference's stage-3
    surgery uses, trainer_moco_flow.py:54-62).

    Returns ``(student_params, student_cfg, final_loss)``. With
    ``swap=False`` the trainer is left untouched (pure artifact build).
    """
    import optax
    from ..nn.nerf import NeRFConfig, init_nerf, nerf_apply
    from ..render.volume import embed_padded

    statics = trainer.statics
    t_cfg: NeRFConfig = statics.fine or statics.coarse
    t_params = trainer.params.get("fine_NeRF") or trainer.params["coarse_NeRF"]
    s_cfg = student_config(t_cfg, depth, width)
    activation = trainer.rcfg_test.activation

    key = jax.random.key(seed)
    s_params = init_nerf(jax.random.fold_in(key, 1), s_cfg)
    # cosine decay to lr*lr_decay + global-norm clipping: the constant-lr
    # unclipped distillation had large run-to-run spread (26-37.5 dB vs
    # teacher for identical configs) and one measured full collapse (9 dB,
    # loss 3.9 at seed 1) — the sharp +-150-sigma relu target is an
    # unforgiving objective (PERF.md round-4 student-arm table). Callers
    # should treat a final loss >> ~0.05 as a diverged draw and restart
    # with a new seed (bench.py does).
    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adam(optax.cosine_decay_schedule(lr, max(steps, 1),
                                               alpha=lr_decay)))
    opt_state = opt.init(s_params)

    n_extra = t_cfg.extra_feat_dim if t_cfg.extra_feat_type != "none" else 0
    half = batch // 2
    # composite weight scale: one typical probe step (~a 64^3 grid cell)
    dt = 2.0 * extent / 64.0

    def eval_nerf(p, cfg, x, extra):
        x_emb = embed_padded(x, statics.nerf_xyz, cfg.in_channels_xyz)
        return nerf_apply(p, x_emb, extra, cfg)

    def make_extra(k, n):
        if t_cfg.extra_feat_type == "ind":
            ind = jax.random.uniform(k, (n, 1), minval=-1.0, maxval=1.0)
            return embed_padded(ind, statics.nerf_ind, t_cfg.extra_feat_dim)
        if t_cfg.extra_feat_type == "dir":
            d = jax.random.normal(k, (n, 3))
            d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-9)
            return embed_padded(d, statics.nerf_dir, t_cfg.extra_feat_dim)
        return None

    def loss_fn(sp, x, extra, t_rgb, t_sig):
        out = eval_nerf(sp, s_cfg, x, extra)
        act_t = _activate(t_sig, activation)
        w = 1.0 - jnp.exp(-act_t * dt)
        soft_s = jnp.log1p(_activate(out[:, 3], activation))
        soft_t = jnp.log1p(act_t)
        rgb_l = jnp.mean(w[:, None] * (out[:, :3] - t_rgb) ** 2)
        sig_l = jnp.mean((soft_s - soft_t) ** 2)
        if activation == "relu":
            # dead-relu rescue: if the student's raw sigma goes negative
            # where the teacher is occupied, log1p(relu(s)) has ZERO
            # gradient and the draw collapses permanently (measured:
            # seed-1 run stuck at loss 3.9169 under two different
            # optimizers = no grad signal at all; PERF.md round 4). A
            # hinge on raw sigma restores the pull across 0 and vanishes
            # once s >= 0, so the converged objective is unchanged.
            sig_l = sig_l + 0.05 * jnp.mean(
                jnp.where(soft_t > 0.0, jnp.maximum(-out[:, 3], 0.0), 0.0))
        return rgb_l + sigma_weight * sig_l

    @jax.jit
    def step(sp, os_, hot, k):
        ku, kj, ke = jax.random.split(k, 3)
        x_u = jax.random.uniform(ku, (half, 3), minval=-extent,
                                 maxval=extent)
        # hot-point buffer: jittered resamples of the highest-density points
        # seen so far — keeps the surface supervised even though it fills a
        # tiny fraction of the box
        x_h = hot + jax.random.normal(kj, hot.shape) * (0.05 * extent)
        x = jnp.concatenate([x_u, x_h], axis=0)
        extra = make_extra(ke, x.shape[0]) if n_extra else None
        t_out = jax.lax.stop_gradient(eval_nerf(t_params, t_cfg, x, extra))
        t_rgb, t_sig = t_out[:, :3], t_out[:, 3]
        l, g = jax.value_and_grad(loss_fn)(sp, x, extra, t_rgb, t_sig)
        upd, os_ = opt.update(g, os_, sp)
        sp = optax.apply_updates(sp, upd)
        # refresh the buffer with this batch's hottest points
        idx = jnp.argsort(-t_sig)[:half]
        return sp, os_, jnp.take(x, idx, axis=0), l

    hot = jax.random.uniform(jax.random.fold_in(key, 2), (half, 3),
                             minval=-extent, maxval=extent)
    l = jnp.float32(0)
    for i in range(steps):
        s_params, opt_state, hot, l = step(
            s_params, opt_state, hot, jax.random.fold_in(key, 100 + i))
    l = float(l)

    if swap:
        swap_render_nerf(trainer, s_cfg, s_params)
    return s_params, s_cfg, l


def swap_render_nerf(trainer, nerf_cfg, nerf_params) -> None:
    """Install a replacement canonical NeRF (e.g. a distilled student) as
    BOTH render-time NeRFs. Test-time rendering only: the trainer's compiled
    train step still closes over the old statics, so training after a swap
    is refused loudly."""
    trainer.statics = dataclasses.replace(trainer.statics, coarse=nerf_cfg,
                                          fine=nerf_cfg)
    trainer.params = dict(trainer.params,
                          coarse_NeRF=jax.tree.map(lambda a: a, nerf_params),
                          fine_NeRF=nerf_params)
    trainer._render_fns.clear()
    trainer._occ_grids.clear()
    getattr(trainer, "_sigma_eval_fns", {}).clear()
    trainer._render_only = True

    def _refuse():
        raise RuntimeError(
            "train_step after swap_render_nerf: the distilled student is a "
            "render-time artifact; rebuild the trainer to keep training")
    trainer.train_step = _refuse


def render_psnr_vs_teacher(img_student: np.ndarray,
                           img_teacher: np.ndarray) -> float:
    mse = float(np.mean((np.asarray(img_student, np.float32)
                         - np.asarray(img_teacher, np.float32)) ** 2))
    return round(-10.0 * float(np.log10(mse + 1e-12)), 1)
