"""Device-resident datasets.

TPU-native re-design of the reference data layer
(datasets/moco_flow_dataset.py, datasets/nof_dataset.py). The reference runs a
torch DataLoader with CPU worker processes that build full-image ray tensors
(H*W x 9 floats, ~40 MB/frame at 1080p) and ships them over PCIe every step.
Here the *entire* dataset lives in HBM once:

  - images as uint8 RGBA ``(F, H*W, 4)`` (decoded once at init),
  - per-frame camera poses / near-far / normalized index (tiny),
  - a padded valid-pixel index table (from the projected-AABB convex hull
    mask, ref camera.py:119-132),

and each training step runs a *jitted sampler* that picks ``N_rand`` valid
pixels, reconstructs their rays from the shared direction grid + per-frame
pose, gathers + composites the rgb targets, all on device. Host->device
traffic per step: one scalar frame index.

Background semantics follow the reference (moco_flow_dataset.py:40-47,
166-176): float gray, an image, or ``'rand'``. For ``'rand'`` we draw a fresh
color per step; the reference draws one per first access and then caches the
composited image (moco_flow_dataset.py:162-163,198-199), which freezes the
color after epoch 1 — per-step resampling is the stated intent (random
backgrounds regularize opacity) and is what we implement.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import os.path as osp

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from ..geometry.camera import (
    Camera,
    aabb_corners,
    near_far_from_aabb,
    rescale_aabb,
)
from ..geometry.poses import create_spheric_poses
from ..geometry.smpl import SMPLData, load_smpl_data, smpl_forward
from .correspondence import (
    CorrespondenceTable,
    build_correspondence_table,
    sample_correspondences,
)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["c2w", "near", "far", "norm_idx", "valid_idx", "valid_count"],
    meta_fields=[])
@dataclasses.dataclass
class FrameTable:
    """Per-frame camera/sampling state, device-resident (a pytree)."""
    c2w: jnp.ndarray          # (F, 3, 4)
    near: jnp.ndarray         # (F,)
    far: jnp.ndarray          # (F,)
    norm_idx: jnp.ndarray     # (F,) frame index normalized to [-1, 1)
    valid_idx: jnp.ndarray    # (F, MAXV) int32 valid-pixel ids (padded, wraps)
    valid_count: jnp.ndarray  # (F,) int32


def _load_meta(root_dir: str, mode: str, interval: int) -> dict:
    with open(osp.join(root_dir, mode + ".json")) as f:
        meta = json.load(f)
    meta["frames"] = meta["frames"][::interval]
    return meta


def _intrinsics(meta: dict, size) -> np.ndarray:
    """Rescale intrinsics from the capture resolution to the target size
    (ref moco_flow_dataset.py:71-78)."""
    h_ori, w_ori = meta["image_height"], meta["image_width"]
    sy, sx = size[0] / h_ori, size[1] / w_ori
    f = meta["camera_focal"]
    cx, cy = meta["camera_c"]
    return np.array([[f * sy, 0, cx * sy], [0, f * sx, cy * sx], [0, 0, 1]])


@functools.partial(jax.jit, static_argnames=("n_rand", "rand_bkgd", "has_alpha"))
def sample_train_rays(table: FrameTable, directions: jnp.ndarray,
                      images: jnp.ndarray, bkgd_img: jnp.ndarray,
                      frame: jnp.ndarray, key: jax.Array, n_rand: int,
                      rand_bkgd: bool, has_alpha: bool):
    """Jitted per-step ray sampler.

    Args:
      directions: (H*W, 3) camera-space direction grid.
      images: (F, H*W, C) uint8, C in {3, 4}.
      bkgd_img: (H*W, 3) float background (ignored when rand_bkgd).
      frame: scalar frame id.
      n_rand: rays per step (static).

    Returns (rays (N, 9), rgbs (N, 3), background (N, 3)).
    """
    k_pix, k_bg = jax.random.split(key)
    count = table.valid_count[frame]
    j = jax.random.randint(k_pix, (n_rand,), 0, count)
    pix = table.valid_idx[frame, j]  # (N,)

    c2w = table.c2w[frame]
    dirs = directions[pix] @ c2w[:, :3].T
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origin = jnp.broadcast_to(c2w[:, 3], dirs.shape)
    ones = jnp.ones((n_rand, 1), jnp.float32)
    rays = jnp.concatenate(
        [origin, dirs, table.near[frame] * ones, table.far[frame] * ones,
         table.norm_idx[frame] * ones], axis=1)

    raw = images[frame, pix].astype(jnp.float32) / 255.0  # (N, C)
    if rand_bkgd:
        bg = jnp.broadcast_to(jax.random.uniform(k_bg, (1, 3)), (n_rand, 3))
    else:
        bg = bkgd_img[pix]
    if has_alpha:
        alpha = raw[:, 3:4]
        rgbs = raw[:, :3] * alpha + bg * (1.0 - alpha)
    else:
        rgbs = raw[:, :3]
    return rays, rgbs, bg


class MoCoFlowDataset:
    """Host-side container + device arrays for one video sequence.

    Parity surface with the reference dataset (moco_flow_dataset.py:19-221):
    JSON meta with interval subsampling, SMPL-derived per-frame AABBs rescaled
    by the config factors, camera recentered by ``-transl`` (person at the
    origin), valid-ray convex-hull masks, normalized frame indices, spherical
    novel-view poses for validation.
    """

    def __init__(self, root_dir: str, imgs_dir: str, size, aabb, bkgd,
                 interval: int = 1, mode: str = "train",
                 smpl_data: SMPLData | None = None,
                 load_images: bool = True):
        self.root_dir = root_dir
        self.imgs_dir = imgs_dir
        self.size = tuple(size)
        self.aabb_cfg = np.asarray(aabb, dtype=object)
        self.bkgd = bkgd
        self.mode = mode.split("/")[0]
        self.vis_mode = mode.split("/")[1] if "/" in mode else None

        self.meta = _load_meta(root_dir, self.mode, interval)
        self.num_frames = len(self.meta["frames"])
        self.smpl = smpl_data if smpl_data is not None else load_smpl_data(
            self.meta.get("gender", "neutral"))

        k = _intrinsics(self.meta, self.size)
        self.camera = Camera(self.size, k, np.asarray(self.meta.get("D", np.zeros(5))))

        self._build_frames(load_images)
        self._build_background()
        self._corr_table: CorrespondenceTable | None = None

        if self.mode == "val":
            c2w0 = np.asarray(self.meta["frames"][0]["camera_pose"])
            transl0 = np.asarray(self.meta["frames"][0]["transl"])
            radius = float(np.sqrt(((c2w0[:3, 3] - transl0) ** 2).sum()))
            self.spherical_poses = create_spheric_poses(
                radius=radius, center=[0, 0, 0], vec_up=[0, -1, 0])

    # -- init helpers -----------------------------------------------------

    def _frame_smpl_arrays(self):
        poses = np.stack([np.asarray(fr["pose"], np.float32).reshape(-1)
                          for fr in self.meta["frames"]])
        betas = np.stack([np.asarray(fr["betas"], np.float32)
                          for fr in self.meta["frames"]])
        return jnp.asarray(poses), jnp.asarray(betas)

    def _build_frames(self, load_images: bool):
        h, w = self.size
        frames = self.meta["frames"]
        poses, betas = self._frame_smpl_arrays()

        # batched SMPL FK for all frames -> per-frame AABBs (jitted: the FK is
        # hundreds of small ops, pathological to dispatch eagerly)
        verts = np.asarray(jax.jit(
            lambda p, b: smpl_forward(self.smpl, p, b))(poses, betas))
        scale, offset = self.aabb_cfg[0], self.aabb_cfg[1]

        c2ws, nears, fars, masks = [], [], [], []
        for i, fr in enumerate(frames):
            aabb = np.stack([verts[i].min(0), verts[i].max(0)])
            corners = aabb_corners(rescale_aabb(aabb, scale, offset))
            c2w4 = np.asarray(fr["camera_pose"], np.float64).copy()
            c2w4[:3, 3] -= np.asarray(fr["transl"])  # recenter person at origin
            near, far = near_far_from_aabb(corners, c2w4[:3, 3])
            c2ws.append(c2w4[:3, :4])
            nears.append(near)
            fars.append(far)
            masks.append(self.camera.valid_rays_mask(corners, c2w4))
        self._frame_aabb_verts = None  # recomputed on demand for novel views
        self._verts = verts
        self._poses, self._betas = poses, betas

        masks = np.stack(masks)  # (F, H*W) bool
        counts = masks.sum(axis=1).astype(np.int32)
        maxv = int(counts.max())
        valid_idx = np.zeros((len(frames), maxv), np.int32)
        for i in range(len(frames)):
            idx = np.flatnonzero(masks[i])
            valid_idx[i, :len(idx)] = idx
            if len(idx) and len(idx) < maxv:  # pad by wrapping
                valid_idx[i, len(idx):] = idx[np.arange(maxv - len(idx)) % len(idx)]
        self.masks = masks

        self.table = FrameTable(
            c2w=jnp.asarray(np.stack(c2ws), jnp.float32),
            near=jnp.asarray(np.asarray(nears), jnp.float32),
            far=jnp.asarray(np.asarray(fars), jnp.float32),
            norm_idx=jnp.asarray(
                np.arange(len(frames)) * 2.0 / len(frames) - 1.0, jnp.float32),
            valid_idx=jnp.asarray(valid_idx),
            valid_count=jnp.asarray(counts),
        )

        self.images = None
        self.has_alpha = False
        if load_images:
            imgs = []
            for fr in frames:
                path = osp.join(self.root_dir, self.imgs_dir, fr["file_path"])
                if not osp.exists(path):
                    imgs = []
                    break
                im = Image.open(path)
                if im.size != (w, h):
                    im = im.resize((w, h), Image.BILINEAR)
                imgs.append(np.asarray(im))
            if imgs:
                arr = np.stack(imgs)  # (F, H, W, C)
                self.has_alpha = arr.shape[-1] == 4
                self.images = jnp.asarray(arr.reshape(len(frames), h * w, -1))

    def _build_background(self):
        h, w = self.size
        self.rand_bkgd = self.bkgd == "rand"
        if isinstance(self.bkgd, (int, float)):
            self.bkgd_img = jnp.full((h * w, 3), float(self.bkgd), jnp.float32)
        elif self.rand_bkgd:
            self.bkgd_img = jnp.ones((h * w, 3), jnp.float32)
        elif isinstance(self.bkgd, str):
            im = Image.open(self.bkgd).resize((w, h), Image.BILINEAR)
            arr = np.asarray(im, np.float32)[..., :3] / 255.0
            self.bkgd_img = jnp.asarray(arr.reshape(h * w, 3))
        else:
            raise ValueError(f"background must be float, path or 'rand': {self.bkgd}")

    # -- device-side step sampling ---------------------------------------

    @property
    def directions_flat(self) -> jnp.ndarray:
        return self.camera.directions.reshape(-1, 3)

    def sample_rays(self, frame, key, n_rand: int):
        """Jitted random-ray batch for one frame -> (rays, rgbs, background)."""
        return sample_train_rays(self.table, self.directions_flat, self.images,
                                 self.bkgd_img, frame, key, n_rand,
                                 self.rand_bkgd, self.has_alpha)

    # -- correspondence (stage 2/3 NoF supervision) -----------------------

    @property
    def correspondence_table(self) -> CorrespondenceTable:
        if self._corr_table is None:
            self._corr_table = build_correspondence_table(
                self.smpl, self._poses, self._betas, tgt_frame=0)
        return self._corr_table

    def get_frame_correspondence(self, frame, key, num_sampled: int = 10000,
                                 thickness: float = 0.2) -> dict:
        """Device-side replacement for moco_flow_dataset.py:87-142."""
        return sample_correspondences(self.correspondence_table,
                                      jnp.asarray(frame), key,
                                      num_sampled=num_sampled,
                                      thickness=thickness)

    # -- full-frame access (val / vis) ------------------------------------

    def frame_aabb_corners(self, idx: int) -> np.ndarray:
        aabb = np.stack([self._verts[idx].min(0), self._verts[idx].max(0)])
        return aabb_corners(rescale_aabb(aabb, self.aabb_cfg[0], self.aabb_cfg[1]))

    def frame_c2w4(self, idx: int) -> np.ndarray:
        c2w4 = np.asarray(self.meta["frames"][idx]["camera_pose"], np.float64).copy()
        c2w4[:3, 3] -= np.asarray(self.meta["frames"][idx]["transl"])
        return c2w4

    def frame_rays(self, idx: int, c2w4: np.ndarray | None = None):
        """All rays of one frame (H*W, 9) + mask, for full-image rendering.

        With ``c2w4`` given (e.g. a spherical pose) renders a novel view of
        that frame (ref moco_flow_dataset.py:200-216)."""
        corners = self.frame_aabb_corners(idx)
        pose = self.frame_c2w4(idx) if c2w4 is None else np.asarray(c2w4)
        norm_idx = idx * 2.0 / self.num_frames - 1.0
        rays = self.camera.make_rays(corners, pose, norm_idx)
        mask = self.camera.valid_rays_mask(corners, pose)
        return rays, mask

    def frame_rays_scaled(self, idx: int, scale: int,
                          c2w4: np.ndarray | None = None):
        """:meth:`frame_rays` at ``scale`` x the dataset resolution — the
        production frame sizes (People-Snapshot renders 1080^2; the bench
        scene stores 256^2) without re-decoding images. Same camera model,
        intrinsics scaled; no GT pairing (video/throughput use)."""
        from ..geometry.camera import Camera
        cams = getattr(self, "_scaled_cams", None)
        if cams is None:
            cams = self._scaled_cams = {}
        cam = cams.get(scale)
        if cam is None:
            k = np.asarray(self.camera.K, np.float64).copy()
            k[0, :] *= scale
            k[1, :] *= scale
            cam = cams[scale] = Camera(
                (self.size[0] * scale, self.size[1] * scale), k)
        corners = self.frame_aabb_corners(idx)
        pose = self.frame_c2w4(idx) if c2w4 is None else np.asarray(c2w4)
        norm_idx = idx * 2.0 / self.num_frames - 1.0
        return cam.make_rays(corners, pose, norm_idx), \
            cam.valid_rays_mask(corners, pose)

    def frame_rgbs(self, idx: int, bkgd: jnp.ndarray | None = None):
        """Composited (H*W, 3) target image for one frame."""
        if self.images is None:
            return None
        raw = self.images[idx].astype(jnp.float32) / 255.0
        bg = self.bkgd_img if bkgd is None else bkgd
        if self.has_alpha:
            a = raw[:, 3:4]
            return raw[:, :3] * a + bg * (1.0 - a)
        return raw[:, :3]


class NoFDataset(MoCoFlowDataset):
    """Image-free variant for stage-2 NoF pretraining
    (ref datasets/nof_dataset.py: only meta + correspondences; default
    thickness 0.1, nof_dataset.py:46)."""

    def __init__(self, root_dir: str, interval: int = 1, mode: str = "train",
                 smpl_data: SMPLData | None = None):
        super().__init__(root_dir, imgs_dir="", size=(8, 8),
                         aabb=[[1.2, 1.2, 1.2], [0, 0, 0]], bkgd=1.0,
                         interval=interval, mode=mode, smpl_data=smpl_data,
                         load_images=False)

    def get_frame_correspondence(self, frame, key, num_sampled: int = 10000,
                                 thickness: float = 0.1) -> dict:
        return super().get_frame_correspondence(frame, key, num_sampled,
                                                thickness)


def get_dataset(data_config: dict, mode: str,
                smpl_data: SMPLData | None = None):
    """Dataset factory (ref datasets/__init__.py:4-22)."""
    kind = data_config["type"]
    if kind == "nof":
        return NoFDataset(data_config["root_dir"],
                          interval=data_config.get("interval", 1),
                          mode=mode, smpl_data=smpl_data)
    if kind == "moco_flow":
        size = data_config["val_size"] if mode.startswith("val") and \
            "val_size" in data_config else data_config["size"]
        return MoCoFlowDataset(
            data_config["root_dir"], data_config.get("imgs_dir", "images"),
            size, data_config["aabb"], data_config.get("bkgd", 1.0),
            interval=data_config.get("interval", 1), mode=mode,
            smpl_data=smpl_data)
    raise ValueError(f"dataset type {kind!r} not valid")
