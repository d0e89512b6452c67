"""Synthetic test scene generator.

Writes a tiny on-disk dataset in the exact JSON schema of the reference
preprocessing output (scripts/data_utils.py:203-270: ``train.json``/``val.json``
with gender/image size/focal/camera_c/D and per-frame
file_path/camera_pose/pose/betas/transl), plus procedurally rendered RGBA
frames, so the full 3-stage pipeline and its tests run without People-Snapshot
data or the SMPL pickle (pair with ``synthetic_smpl_data``).

The images are a soft-shaded sphere tracking the synthetic body's root — not
photorealistic, but geometrically consistent with the cameras, which is what
overfit/convergence tests need.
"""

from __future__ import annotations

import json
import os
import os.path as osp

import numpy as np
from PIL import Image

from ..geometry.smpl import SMPLData, smpl_forward, synthetic_smpl_data


class _NumpyEncoder(json.JSONEncoder):
    def default(self, o):
        if isinstance(o, np.ndarray):
            return o.tolist()
        if isinstance(o, (np.floating, np.integer)):
            return o.item()
        return super().default(o)


def make_synthetic_scene(root_dir: str, n_frames: int = 4, size: int = 64,
                         focal: float = 80.0, cam_dist: float = 4.0,
                         seed: int = 0, smpl: SMPLData | None = None,
                         pose_scale: float = 0.15,
                         blob_sigma2: float = 18.0) -> SMPLData:
    """Create ``root_dir`` with train.json / val.json / images/ and return the
    synthetic SMPL body used for it."""
    rng = np.random.default_rng(seed)
    smpl = smpl or synthetic_smpl_data(256, seed=seed)
    os.makedirs(osp.join(root_dir, "images"), exist_ok=True)

    h = w = size
    cx = cy = size / 2.0
    # reference camera convention (data_utils.py:245-246): fixed
    # diag(1,-1,-1,1) pose; transl moves the *person*, camera recenters by it.
    camera_pose = np.diag([1.0, -1.0, -1.0, 1.0])

    frames = []
    poses = np.zeros((n_frames, 72), np.float32)
    poses[:, 3:] = rng.normal(scale=pose_scale, size=(n_frames, 69))
    betas = np.zeros((n_frames, 10), np.float32)
    import jax
    import jax.numpy as jnp
    # jit the FK: eagerly it is hundreds of tiny ops (slow on remote backends)
    verts = np.asarray(jax.jit(
        lambda p, b: smpl_forward(smpl, p, b))(
        jnp.asarray(poses), jnp.asarray(betas)))

    for i in range(n_frames):
        transl = np.array([0.0, 0.0, cam_dist], np.float32)
        # render: project vertices through the recentered camera and splat a
        # soft disk per vertex
        c2w = camera_pose.copy()
        c2w[:3, 3] -= transl
        w2c = np.linalg.inv(c2w)
        pts = verts[i]
        cam = (w2c[:3, :3] @ pts.T + w2c[:3, 3:4])
        cam[1:] *= -1  # projective flip (ref camera.py:97)
        u = focal * cam[0] / cam[2] + cx
        v = focal * cam[1] / cam[2] + cy

        yy, xx = np.mgrid[0:h, 0:w]
        sel = np.arange(0, len(pts), 4)
        d2 = ((xx[None] - u[sel, None, None]) ** 2
              + (yy[None] - v[sel, None, None]) ** 2)  # (K, H, W)
        # blob_sigma2 sets the splat footprint in px^2: the default 3-px
        # dots are body-like at 64-128px frames but cover <2% of a 256px
        # frame — too sparse for a NeRF to fit in a short benchmark run
        blobs = np.exp(-d2 / blob_sigma2)
        colors = 0.25 + 0.75 * (pts[sel] - pts.min(0)) / (
            np.ptp(pts, axis=0) + 1e-6)  # (K, 3)
        img = np.zeros((h, w, 4), np.float32)
        img[..., :3] = np.max(blobs[..., None] * colors[:, None, None, :],
                              axis=0)
        img[..., 3] = blobs.max(axis=0)
        img = np.clip(img, 0, 1)
        Image.fromarray((img * 255).astype(np.uint8), "RGBA").save(
            osp.join(root_dir, "images", f"{i:04d}.png"))

        frames.append({
            "file_path": f"{i:04d}.png",
            "camera_pose": camera_pose,
            "pose": poses[i],
            "betas": betas[i],
            "transl": transl,
        })

    meta = {
        "gender": "neutral",
        "image_height": h,
        "image_width": w,
        "camera_focal": focal,
        "camera_c": np.array([cx, cy]),
        "D": np.zeros(5),
        "frames": frames,
    }
    for name in ("train.json", "val.json"):
        with open(osp.join(root_dir, name), "w") as f:
            json.dump(meta, f, cls=_NumpyEncoder)
    return smpl
