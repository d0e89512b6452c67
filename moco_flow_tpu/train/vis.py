"""Visualization: rendered frames, free-viewpoint videos, mesh extraction.

Capability parity with the reference visualizers
(trainer/trainer_moco_flow.py:484-683, trainer/trainer_nerf.py:199-333,
utils/vis_utils.py:28-43): GT|pred|depth frame strips, spherical-orbit videos,
and sigma-grid marching-cubes meshes (canonical or NoF-warped per-frame).
Rendering is the trainers' chunked jitted path; only PNG/mp4/OBJ encoding is
host-side.
"""

from __future__ import annotations

import os
import os.path as osp

import numpy as np

import jax
import jax.numpy as jnp

from ..nn.nerf import nerf_sigma
from ..render.volume import RenderConfig, embed_padded, encode_nerf_xyz
from .stage_nof import nof_points


def colorize_depth(depth: np.ndarray) -> np.ndarray:
    """(H, W) depth -> (H, W, 3) JET colormap in [0,1]
    (ref vis_utils.py:28-43)."""
    import cv2
    x = np.nan_to_num(np.asarray(depth))
    mi, ma = x.min(), x.max()
    x = (x - mi) / (ma - mi + 1e-8)
    x = (255 * x).astype(np.uint8)
    bgr = cv2.applyColorMap(x, cv2.COLORMAP_JET)
    return bgr[..., ::-1].astype(np.float32) / 255.0


def save_image(path: str, img: np.ndarray):
    # multi-host: every process COMPUTES the render (global-mesh programs
    # must run on all controllers), only process 0 touches the filesystem
    from ..parallel.multihost import is_main
    if not is_main():
        return
    import imageio
    os.makedirs(osp.dirname(path), exist_ok=True)
    imageio.imwrite(path, (np.clip(img, 0, 1) * 255).astype(np.uint8))


def save_video(path: str, frames: list, fps: int = 16):
    from ..parallel.multihost import is_main
    if not is_main():
        return
    import imageio
    try:
        imageio.mimwrite(path, frames, fps=fps, quality=8)
    except Exception:  # no ffmpeg backend: leave the PNGs
        pass


def decode_results(res: dict, img_size):
    h, w = img_size
    typ = "fine" if "rgb_fine" in res else "coarse"
    img = np.asarray(res[f"rgb_{typ}"]).reshape(h, w, 3)
    depth = colorize_depth(np.asarray(res[f"depth_{typ}"]).reshape(h, w))
    return img, depth


def _test_rcfg(trainer, use_nof: bool):
    if not use_nof and hasattr(trainer, "rcfg_test_cano"):
        return trainer.rcfg_test_cano
    return trainer.rcfg_test


def _render_view(trainer, dataset, idx, c2w4=None, white_bkgd=False,
                 use_nof=True):
    rays, mask = dataset.frame_rays(idx, c2w4=c2w4)
    # occupancy-grid depth tightening (off unless model.occ_res > 0); the
    # grid is per-frame (canonical when the NoF warp is off) so novel views
    # of the same frame reuse it. The keep mask drops rays whose occupancy
    # probes provably hit nothing (they composite to background anyway).
    bg = jnp.ones_like(dataset.bkgd_img) if white_bkgd else dataset.bkgd_img
    handle = trainer.prepare_view(rays, idx if use_nof else -1,
                                  extra_mask=mask, size=dataset.size)
    res = trainer.commit_view(handle, bg, _test_rcfg(trainer, use_nof),
                              anneal=trainer.anneal())
    return decode_results(res, dataset.size)


def _render_views(trainer, dataset, views, use_nof=True):
    """Render ``views`` = [(idx, c2w4, white_bkgd), ...] through the
    pipelined path (train/base.py::render_views_pipelined): view i+1's
    occupancy programs are dispatched before view i's mask readback, and
    the decode (image fetch) lags one view behind the render dispatch, so
    every host round trip overlaps device work. Yields (img, depth)."""
    def jobs():
        for idx, c2w4, white in views:
            rays, mask = dataset.frame_rays(idx, c2w4=c2w4)
            bg = (jnp.ones_like(dataset.bkgd_img) if white
                  else dataset.bkgd_img)
            yield (rays, idx if use_nof else -1, bg, mask)

    rcfg = _test_rcfg(trainer, use_nof)
    anneal = trainer.anneal()
    prev = None
    for out in trainer.render_views_pipelined(jobs(), rcfg, anneal=anneal):
        if prev is not None:
            yield decode_results(prev, dataset.size)
        prev = out
    if prev is not None:
        yield decode_results(prev, dataset.size)


def visualize_frame(trainer, frame_idx: int, use_nof=True,
                    vis_novel_view=True, save_path=None, save_tb=True):
    """GT | pred | depth (| novel | novel depth) strip for one frame; frame -1
    renders the canonical space (ref trainer_moco_flow.py:629-661)."""
    ds = trainer.val_dataset
    idx = frame_idx if frame_idx != -1 else 0
    nof = use_nof and frame_idx != -1
    img, depth = _render_view(trainer, ds, idx, use_nof=nof)
    panels = []
    gt = ds.frame_rgbs(idx)
    if gt is not None:
        panels.append(np.asarray(gt).reshape(*ds.size, 3))
    panels += [img, depth]
    if vis_novel_view and hasattr(ds, "spherical_poses"):
        pose = ds.spherical_poses[int(trainer.val_rng().integers(
            len(ds.spherical_poses)))]
        nimg, ndepth = _render_view(trainer, ds, idx, c2w4=pose,
                                    white_bkgd=True, use_nof=nof)
        panels += [nimg, ndepth]
    strip = np.concatenate(panels, axis=1)
    save_path = save_path or trainer.config.log_dir
    name = f"frame_{frame_idx}" if frame_idx != -1 else "canonical"
    out = osp.join(save_path,
                   f"images_epoch_{trainer.clock.epoch}_step_{trainer.clock.step}",
                   f"{name}.png")
    save_image(out, strip)
    if save_tb and trainer.logger is not None:
        trainer.logger.image(name, strip, trainer.clock.step)
    return strip


def visualize_spherical(trainer, frame_idx: int, use_nof=True, save_path=None):
    """Orbit video of one frame (or canonical for -1)
    (ref trainer_moco_flow.py:550-586)."""
    ds = trainer.val_dataset
    idx = frame_idx if frame_idx != -1 else 0
    nof = use_nof and frame_idx != -1
    save_path = save_path or trainer.config.log_dir
    name = f"frame_{frame_idx}" if frame_idx != -1 else "canonical"
    img_dir = osp.join(
        save_path,
        f"spherical_videos_epoch_{trainer.clock.epoch}_step_{trainer.clock.step}",
        f"{name}_images")
    # no makedirs here: save_image creates directories itself and is
    # process-0-gated — non-main hosts must not touch the filesystem
    frames = []
    views = [(idx, pose, True) for pose in ds.spherical_poses]
    for i, (img, depth) in enumerate(_render_views(trainer, ds, views,
                                                   use_nof=nof)):
        strip = np.concatenate([img, depth], axis=1)
        save_image(osp.join(img_dir, f"{i:04d}.png"), strip)
        frames.append((np.clip(strip, 0, 1) * 255).astype(np.uint8))
    save_video(img_dir.replace("_images", "_video.mp4"), frames)


def visualize_video(trainer, vis_novel_view=True, save_path=None):
    """Per-frame reconstruction video over the whole sequence
    (ref trainer_moco_flow.py:589-626)."""
    ds = trainer.val_dataset
    save_path = save_path or trainer.config.log_dir
    img_dir = osp.join(
        save_path,
        f"videos_epoch_{trainer.clock.epoch}_step_{trainer.clock.step}", "images")
    # no makedirs here: save_image creates directories itself and is
    # process-0-gated — non-main hosts must not touch the filesystem
    # interleave (recon view, novel view) per frame through ONE pipelined
    # stream so every view's mask readback hides under the previous render
    novel = vis_novel_view and hasattr(ds, "spherical_poses")
    views = []
    for idx in range(ds.num_frames):
        views.append((idx, None, False))
        if novel:
            views.append((idx, ds.spherical_poses[idx % len(
                ds.spherical_poses)], True))
    rendered = _render_views(trainer, ds, views, use_nof=True)
    frames = []
    for idx in range(ds.num_frames):
        img, depth = next(rendered)
        panels = []
        gt = ds.frame_rgbs(idx)
        if gt is not None:
            panels.append(np.asarray(gt).reshape(*ds.size, 3))
        panels += [img, depth]
        if novel:
            nimg, ndepth = next(rendered)
            panels += [nimg, ndepth]
        strip = np.concatenate(panels, axis=1)
        save_image(osp.join(img_dir, f"{idx:04d}.png"), strip)
        frames.append((np.clip(strip, 0, 1) * 255).astype(np.uint8))
    save_video(osp.join(osp.dirname(img_dir), "video.mp4"), frames)


def visualize_bullet_time(trainer, frame_idx: int, save_path=None,
                          radius: float | None = None,
                          move_dist: float = 0.5):
    """Bullet-time track around one frozen frame: orbit, zoom in, zoom out
    (poses from geometry.poses.create_bullet_effect_poses — the reference
    ships the pose util, vis_utils.py:121-130, without a CLI)."""
    from ..geometry.poses import create_bullet_effect_poses
    ds = trainer.val_dataset
    idx = frame_idx if frame_idx != -1 else 0
    nof = frame_idx != -1
    if radius is None:
        c2w = ds.frame_c2w4(idx)
        radius = float(np.linalg.norm(c2w[:3, 3]))
    poses = create_bullet_effect_poses(radius=radius, move_dist=move_dist)
    save_path = save_path or trainer.config.log_dir
    name = f"frame_{frame_idx}" if frame_idx != -1 else "canonical"
    img_dir = osp.join(
        save_path,
        f"bullet_epoch_{trainer.clock.epoch}_step_{trainer.clock.step}",
        f"{name}_images")
    # no makedirs here: save_image creates directories itself and is
    # process-0-gated — non-main hosts must not touch the filesystem
    frames = []
    views = [(idx, pose, True) for pose in poses]
    for i, (img, depth) in enumerate(_render_views(trainer, ds, views,
                                                   use_nof=nof)):
        strip = np.concatenate([img, depth], axis=1)
        save_image(osp.join(img_dir, f"{i:04d}.png"), strip)
        frames.append((np.clip(strip, 0, 1) * 255).astype(np.uint8))
    save_video(img_dir.replace("_images", "_video.mp4"), frames)


# ---------------------------------------------------------------------------
# Mesh extraction
# ---------------------------------------------------------------------------

def sigma_grid(trainer, frame_idx: int, n_grid: int = 256,
               extent: float = 1.5, chunk: int = 65536,
               clip_negative: bool = True) -> np.ndarray:
    """Evaluate sigma on an n_grid^3 lattice (NoF-warped for frame != -1),
    batched on device (ref trainer_moco_flow.py:484-531).

    ``clip_negative=False`` returns RAW sigma — needed by consumers that
    apply the renderer's own activation (softplus keeps negative raw sigma
    contributing; clipping at 0 would misstate the integrated density)."""
    params, statics = trainer.params, trainer.statics
    anneal = trainer.anneal()
    use_fine = "fine_NeRF" in params
    nerf_name = "fine_NeRF" if use_fine else "coarse_NeRF"
    nerf_cfg = statics.fine if use_fine and statics.fine else statics.coarse
    warp = frame_idx != -1 and "bw_NoF" in params
    norm_idx = jnp.asarray(
        frame_idx * 2.0 / max(getattr(trainer, "num_frames", 1), 1) - 1.0)

    # params/anneal are explicit args: closure-captured device arrays would be
    # fetched to host at lowering time (slow on tunneled backends). The
    # jitted fn is cached on the trainer — a per-call @jax.jit would
    # recompile on EVERY grid build (occupancy grids rebuild after each
    # train step; compiles cost minutes on the remote-compile service)
    cache = getattr(trainer, "_sigma_eval_fns", None)
    if cache is None:
        cache = trainer._sigma_eval_fns = {}
    # statics is part of the key: a render-NeRF swap (render/distill.py)
    # changes the closed-over configs and a (warp, name)-only key would
    # serve the old architecture's jitted closure against new params
    eval_tiles = cache.get((warp, nerf_name, statics))
    if eval_tiles is None:
        def _eval_tiles(params, anneal, norm_idx, tiles):
            def one(pts):
                if warp:
                    pts = nof_points(params["bw_NoF"], statics, anneal, pts,
                                     norm_idx, RenderConfig(use_nof=True))
                emb = encode_nerf_xyz(params[nerf_name], nerf_cfg, statics,
                                      pts, anneal)
                return nerf_sigma(params[nerf_name], emb, nerf_cfg)[:, 0]
            return jax.lax.map(one, tiles)
        eval_tiles = cache[(warp, nerf_name, statics)] = jax.jit(_eval_tiles)

    lin = np.linspace(-extent, extent, n_grid, dtype=np.float32)
    xyz = np.stack(np.meshgrid(lin, lin, lin), -1).reshape(-1, 3)
    pad = (-len(xyz)) % chunk
    xyz = np.concatenate([xyz, np.zeros((pad, 3), np.float32)])
    sig = np.asarray(eval_tiles(params, anneal, norm_idx,
                                jnp.asarray(xyz.reshape(-1, chunk, 3))))
    sig = sig.reshape(-1)[:n_grid ** 3]
    if clip_negative:
        sig = np.maximum(sig, 0)
    return sig.reshape(n_grid, n_grid, n_grid)


def _grid_builders(trainer, frame_idx: int, resolution: int,
                   supersample: int, activation: str, dilate: int,
                   chunk: int):
    """Cached jitted builders for the occupancy grid's sigma lattice,
    computed ENTIRELY on device. ``sigma_grid`` uploads the full lattice
    (n^3 x 3 f32 = 679 MB at 384^3) and fetches raw sigma (226 MB) — over
    the tunneled backend that transfer alone cost ~25 s per grid build
    (PERF.md round 4). Here the lattice is generated in-graph from the
    flat cell index, and max-pool / activation / 3^3-max dilation run
    in-graph too, so the inner build fetches only the pooled
    resolution^3 f32 (28 MB at 192^3) and the outer bound fetches ONE
    scalar.

    Returns ``(grid_fn, outer_fn)``:
      grid_fn(params, anneal, norm_idx, extent) -> (r, r, r) f32, index
        order (x, y, z) — the pooled+activated+dilated sigma UPPER BOUND
        (bit-equal in structure to the round-4 host pipeline; tested).
      outer_fn(params, anneal, norm_idx, extent, outer_extent) -> scalar
        max activated+dilated sigma outside [-extent, extent]^3 on a
        resolution^3 lattice over the outer cube (supersample 1, dilate
        1 — the same guard lattice the host path measured).
    """
    params, statics = trainer.params, trainer.statics
    use_fine = "fine_NeRF" in params
    nerf_name = "fine_NeRF" if use_fine else "coarse_NeRF"
    nerf_cfg = statics.fine if use_fine and statics.fine else statics.coarse
    warp = frame_idx != -1 and "bw_NoF" in params

    cache = getattr(trainer, "_sigma_eval_fns", None)
    if cache is None:
        cache = trainer._sigma_eval_fns = {}
    key = ("occgrid", warp, nerf_name, statics, resolution, supersample,
           activation, dilate, chunk)
    fns = cache.get(key)
    if fns is not None:
        return fns

    def _raw_lattice(params, anneal, norm_idx, extent, n):
        """(n, n, n) RAW sigma, (x, y, z) order, lattice built in-graph."""
        n_tiles = -(-n ** 3 // chunk)
        step = 2.0 * extent / (n - 1)

        def one(t):
            f = jnp.minimum(t * chunk + jnp.arange(chunk), n ** 3 - 1)
            ijk = jnp.stack([f // (n * n), (f // n) % n, f % n], axis=-1)
            pts = ijk.astype(jnp.float32) * step - extent
            if warp:
                pts = nof_points(params["bw_NoF"], statics, anneal, pts,
                                 norm_idx, RenderConfig(use_nof=True))
            emb = encode_nerf_xyz(params[nerf_name], nerf_cfg, statics,
                                  pts, anneal)
            return nerf_sigma(params[nerf_name], emb, nerf_cfg)[:, 0]

        sig = jax.lax.map(one, jnp.arange(n_tiles))
        return sig.reshape(-1)[:n ** 3].reshape(n, n, n)

    def _activate_dilate(sig, n_dilate):
        sig = (jnp.logaddexp(sig, 0.0) if activation == "softplus"
               else jnp.maximum(sig, 0.0))
        for _ in range(n_dilate):
            sig = jax.lax.reduce_window(sig, -jnp.inf, jax.lax.max,
                                        (3, 3, 3), (1, 1, 1), "SAME")
        return sig

    def _grid(params, anneal, norm_idx, extent):
        n = resolution * supersample
        sig = _raw_lattice(params, anneal, norm_idx, extent, n)
        if supersample > 1:
            r, s = resolution, supersample
            sig = sig.reshape(r, s, r, s, r, s).max(axis=(1, 3, 5))
        return _activate_dilate(sig, dilate)

    def _outer(params, anneal, norm_idx, extent, outer_extent):
        sig = _activate_dilate(
            _raw_lattice(params, anneal, norm_idx, outer_extent,
                         resolution), 1)
        c = jnp.linspace(-outer_extent, outer_extent, resolution)
        inside = ((jnp.abs(c)[:, None, None] <= extent)
                  & (jnp.abs(c)[None, :, None] <= extent)
                  & (jnp.abs(c)[None, None, :] <= extent))
        return jnp.max(jnp.where(inside, -jnp.inf, sig))

    fns = cache[key] = (jax.jit(_grid), jax.jit(_outer))
    return fns


def _warp_grid_builders(trainer, resolution: int, supersample: int,
                        dilate: int, chunk: int):
    """Cached jitted builders for the WARP-PULLBACK occupancy grid
    (``occ_builder: warp``): per-frame observation-space occupancy is the
    CANONICAL grid's bound pulled back through the frame's bw warp —
    ``sig_obs(x) = C_sig[cell(bw(x, frame))]`` — instead of re-evaluating
    the full NeRF trunk at every lattice point. One NoF eval + one gather
    per point replaces NoF + 8-layer trunk, so a training-pose video's
    per-frame build drops ~4-5x while staying exactly as lattice-empirical
    as the direct build: ``C_sig`` is itself the pooled+dilated canonical
    upper bound (the same quantity frame -1 renders skip against), the obs
    lattice is supersampled and max-pooled identically, and points warping
    OUTSIDE the canonical cube read its measured outer bound (its shell)
    or +inf (beyond) — degrading to "cannot skip", never to a dropped ray.

    Returns ``(grid_fn, outer_fn)``:
      grid_fn(params, anneal, norm_idx, extent, c_sig, c_extent,
              c_outer_sig, c_outer_extent) -> (r, r, r) f32
      outer_fn(... , outer_extent) -> scalar max outside [-extent,extent]^3
    """
    statics = trainer.statics
    cache = getattr(trainer, "_sigma_eval_fns", None)
    if cache is None:
        cache = trainer._sigma_eval_fns = {}
    key = ("warpgrid", statics, resolution, supersample, dilate, chunk)
    fns = cache.get(key)
    if fns is not None:
        return fns

    def _lookup_cano(y, c_sig, c_extent, c_outer_sig, c_outer_extent):
        """Three-zone canonical bound (same zones as the tighten kernel,
        render/occupancy.py::_tighten_kernel)."""
        c_r = c_sig.shape[0]
        cell = 2.0 * c_extent / c_r
        ids = jnp.floor((y + c_extent) / cell).astype(jnp.int32)
        inb = jnp.all((ids >= 0) & (ids < c_r), axis=-1)
        ids = jnp.clip(ids, 0, c_r - 1)
        flat = (ids[..., 0] * c_r + ids[..., 1]) * c_r + ids[..., 2]
        vals = jnp.take(c_sig.reshape(-1), flat)
        in_shell = jnp.all(jnp.abs(y) <= c_outer_extent, axis=-1)
        return jnp.where(inb, vals,
                         jnp.where(in_shell, c_outer_sig, jnp.inf))

    def _pullback_lattice(params, anneal, norm_idx, extent, n, c_sig,
                          c_extent, c_outer_sig, c_outer_extent):
        n_tiles = -(-n ** 3 // chunk)
        step = 2.0 * extent / (n - 1)

        def one(t):
            f = jnp.minimum(t * chunk + jnp.arange(chunk), n ** 3 - 1)
            ijk = jnp.stack([f // (n * n), (f // n) % n, f % n], axis=-1)
            pts = ijk.astype(jnp.float32) * step - extent
            y = nof_points(params["bw_NoF"], statics, anneal, pts,
                           norm_idx, RenderConfig(use_nof=True))
            return _lookup_cano(y, c_sig, c_extent, c_outer_sig,
                                c_outer_extent)

        sig = jax.lax.map(one, jnp.arange(n_tiles))
        return sig.reshape(-1)[:n ** 3].reshape(n, n, n)

    def _dilate_max(sig, n_dilate):
        for _ in range(n_dilate):
            sig = jax.lax.reduce_window(sig, -jnp.inf, jax.lax.max,
                                        (3, 3, 3), (1, 1, 1), "SAME")
        return sig

    def _grid(params, anneal, norm_idx, extent, c_sig, c_extent,
              c_outer_sig, c_outer_extent):
        n = resolution * supersample
        sig = _pullback_lattice(params, anneal, norm_idx, extent, n, c_sig,
                                c_extent, c_outer_sig, c_outer_extent)
        if supersample > 1:
            r, s = resolution, supersample
            sig = sig.reshape(r, s, r, s, r, s).max(axis=(1, 3, 5))
        return _dilate_max(sig, dilate)  # c_sig is already activated

    def _outer(params, anneal, norm_idx, extent, outer_extent, c_sig,
               c_extent, c_outer_sig, c_outer_extent):
        sig = _dilate_max(
            _pullback_lattice(params, anneal, norm_idx, outer_extent,
                              resolution, c_sig, c_extent, c_outer_sig,
                              c_outer_extent), 1)
        c = jnp.linspace(-outer_extent, outer_extent, resolution)
        inside = ((jnp.abs(c)[:, None, None] <= extent)
                  & (jnp.abs(c)[None, :, None] <= extent)
                  & (jnp.abs(c)[None, None, :] <= extent))
        return jnp.max(jnp.where(inside, -jnp.inf, sig))

    fns = cache[key] = (jax.jit(_grid), jax.jit(_outer))
    return fns


def warp_grid_device(trainer, frame_idx: int, resolution: int, cano_grid,
                     supersample: int = 2, extent: float = 1.5,
                     dilate: int = 1, chunk: int = 131072,
                     outer_extent: float | None = None):
    """Warp-pullback per-frame grid (see :func:`_warp_grid_builders`):
    returns device ``(sig (r,r,r), outer_sig 0-d | None)`` without syncing.
    ``cano_grid`` is the trainer's canonical DeviceOccupancyGrid."""
    grid_fn, outer_fn = _warp_grid_builders(trainer, resolution, supersample,
                                            dilate, chunk)
    norm_idx = jnp.asarray(
        frame_idx * 2.0 / max(getattr(trainer, "num_frames", 1), 1) - 1.0)
    c_sig = getattr(cano_grid, "sig_dev", None)
    if c_sig is None:
        c_sig = jnp.asarray(cano_grid.sig)
    c_outer = getattr(cano_grid, "outer_sig_dev", None)
    if c_outer is None:
        c_outer = jnp.float32(cano_grid.outer_sig)
    args = (trainer.params, trainer.anneal(), norm_idx, jnp.float32(extent),
            c_sig, jnp.float32(cano_grid.extent), c_outer,
            jnp.float32(cano_grid.outer_extent))
    sig = grid_fn(*args)
    outer_sig = None
    if outer_extent is not None:
        outer_sig = outer_fn(args[0], args[1], args[2], args[3],
                             jnp.float32(outer_extent), *args[4:])
    return sig, outer_sig


def grid_sig_device(trainer, frame_idx: int, resolution: int,
                    supersample: int = 2, extent: float = 1.5,
                    activation: str = "relu", dilate: int = 1,
                    chunk: int = 131072, fetch: bool = True):
    """On-device occupancy sigma lattice (see :func:`_grid_builders`).
    ``fetch=False`` returns the (r, r, r) DEVICE array without syncing —
    the dispatch is async, so a caller that builds frame i+1's grid while
    frame i renders pays zero host time (render/occupancy.py
    DeviceOccupancyGrid)."""
    grid_fn, _ = _grid_builders(trainer, frame_idx, resolution, supersample,
                                activation, dilate, chunk)
    norm_idx = jnp.asarray(
        frame_idx * 2.0 / max(getattr(trainer, "num_frames", 1), 1) - 1.0)
    sig = grid_fn(trainer.params, trainer.anneal(), norm_idx,
                  jnp.float32(extent))
    if not fetch:
        return sig
    return np.asarray(sig, np.float32)


def outer_bound_device(trainer, frame_idx: int, resolution: int,
                       extent: float, outer_extent: float,
                       activation: str = "relu",
                       chunk: int = 131072, fetch: bool = True):
    """Max activated density OUTSIDE the grid cube — one scalar (device
    0-d array with ``fetch=False``, no sync; see :func:`_grid_builders`)."""
    _, outer_fn = _grid_builders(trainer, frame_idx, resolution,
                                 supersample=1, activation=activation,
                                 dilate=1, chunk=chunk)
    norm_idx = jnp.asarray(
        frame_idx * 2.0 / max(getattr(trainer, "num_frames", 1), 1) - 1.0)
    out = outer_fn(trainer.params, trainer.anneal(), norm_idx,
                   jnp.float32(extent), jnp.float32(outer_extent))
    if not fetch:
        return out
    return float(out)


def visualize_mesh(trainer, frame_idx: int, n_grid: int = 256,
                   sigma_threshold: float = 10.0, save_path=None,
                   extent: float = 1.5):
    """Sigma grid -> marching cubes -> OBJ (ref trainer_moco_flow.py:484-548;
    includes the reference's xy swap and winding flip + rescale :536-538)."""
    from ..ops.mcubes import marching_cubes, export_obj
    sigma = sigma_grid(trainer, frame_idx, n_grid=n_grid, extent=extent)
    verts, tris = marching_cubes(sigma, sigma_threshold)
    if len(verts) == 0:
        trainer.record_str("visualize_mesh: empty sigma field, skipping")
        return None
    verts = verts[:, [1, 0, 2]]
    tris = tris[:, [0, 2, 1]]
    verts = verts / n_grid * (2 * extent) - extent
    save_path = save_path or trainer.config.log_dir
    name = f"{frame_idx}" if frame_idx != -1 else "canonical"
    out = osp.join(save_path,
                   f"mesh_epoch_{trainer.clock.epoch}_step_{trainer.clock.step}",
                   f"{name}.obj")
    if trainer.is_main:  # sigma grid is a global-mesh compute; write on 0
        os.makedirs(osp.dirname(out), exist_ok=True)
        export_obj(verts, tris, out)
    return out
