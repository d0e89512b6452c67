"""Preprocessing utilities: video -> images/masks/background/meta JSON.

Capability parity with the reference ``scripts/data_utils.py``: video clipping,
RobustVideoMatting-based matting (torch-hub, gated on availability), largest-
region mask cleanup, per-pixel median background, Fibonacci-sphere viewpoint
sampling, look-at poses, VIBE-pkl -> ``train.json``/``val.json`` conversion
(the reference camera convention: ``transl = [cx_w, cy_w, 2f/(s*W)]`` and a
fixed ``diag(1,-1,-1,1)`` camera pose), and init_nerf multi-view renders of the
frame-0 posed SMPL with a position colormap — rendered by the in-repo software
rasterizer instead of pyrender/OSMesa.
"""

from __future__ import annotations

import json
import os
import os.path as osp

import numpy as np


class NumpyEncoder(json.JSONEncoder):
    def default(self, o):
        if isinstance(o, np.ndarray):
            return o.tolist()
        if isinstance(o, (np.floating, np.integer)):
            return o.item()
        return super().default(o)


# -- video / mask -----------------------------------------------------------

def clip_video(video_path: str, out_dir: str, start: int = 0,
               end: int | None = None, size=None) -> int:
    """Decode a video to PNG frames (cv2; the reference shells out to ffmpeg)."""
    import cv2
    os.makedirs(out_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    i = n = 0
    while True:
        ok, frame = cap.read()
        if not ok or (end is not None and i >= end):
            break
        if i >= start:
            if size is not None:
                frame = cv2.resize(frame, (size[1], size[0]))
            cv2.imwrite(osp.join(out_dir, f"{n:04d}.png"), frame)
            n += 1
        i += 1
    cap.release()
    return n


def keep_largest_region(mask: np.ndarray) -> np.ndarray:
    """Retain only the largest connected foreground component
    (ref data_utils.py:102-114)."""
    import cv2
    m = (mask > 0).astype(np.uint8)
    num, labels, stats, _ = cv2.connectedComponentsWithStats(m)
    if num <= 1:
        return m
    largest = 1 + int(np.argmax(stats[1:, cv2.CC_STAT_AREA]))
    return (labels == largest).astype(np.uint8)


def run_matting(imgs_dir: str, out_dir: str, threshold: float = 0.4):
    """Alpha-matte every frame with RobustVideoMatting (torch-hub). Requires
    network access / a cached hub checkpoint; raises a clear error otherwise
    (ref data_utils.py:117-147)."""
    try:
        import torch
        model = torch.hub.load("PeterL1n/RobustVideoMatting", "mobilenetv3")
    except Exception as e:  # zero-egress environments
        raise RuntimeError(
            "RobustVideoMatting unavailable (torch.hub needs network or a "
            "cached checkpoint). Provide precomputed alpha masks instead.") from e
    import torch
    from PIL import Image
    os.makedirs(out_dir, exist_ok=True)
    model = model.eval()
    rec = [None] * 4
    with torch.no_grad():
        for name in sorted(os.listdir(imgs_dir)):
            img = np.asarray(Image.open(osp.join(imgs_dir, name)))[..., :3]
            src = torch.from_numpy(img).permute(2, 0, 1)[None].float() / 255
            fgr, pha, *rec = model(src, *rec, downsample_ratio=0.25)
            alpha = (pha[0, 0].numpy() > threshold).astype(np.uint8)
            alpha = keep_largest_region(alpha)
            rgba = np.dstack([img, alpha[..., None] * 255]).astype(np.uint8)
            Image.fromarray(rgba, "RGBA").save(osp.join(out_dir, name))


def median_background(imgs_dir: str, masks_dir: str | None, out_path: str):
    """Per-pixel median over the stack -> static background estimate
    (ref data_utils.py:150-163)."""
    from PIL import Image
    stack = []
    for name in sorted(os.listdir(imgs_dir)):
        stack.append(np.asarray(Image.open(osp.join(imgs_dir, name)))[..., :3])
    bg = np.median(np.stack(stack), axis=0).astype(np.uint8)
    Image.fromarray(bg).save(out_path)
    return bg


# -- viewpoints -------------------------------------------------------------

def sample_on_sphere(num: int, radius: float) -> np.ndarray:
    """Fibonacci-spiral points on a sphere (ref data_utils.py:166-181)."""
    i = np.arange(num) + 0.5
    phi = np.arccos(1 - 2 * i / num)
    theta = np.pi * (1 + 5 ** 0.5) * i
    return radius * np.stack([np.cos(theta) * np.sin(phi),
                              np.sin(theta) * np.sin(phi),
                              np.cos(phi)], axis=-1)


def look_at_pose(eye: np.ndarray, target: np.ndarray,
                 up=(0.0, 1.0, 0.0)) -> np.ndarray:
    """Camera-to-world looking from eye at target, -z forward
    (ref data_utils.py:184-200)."""
    eye = np.asarray(eye, np.float64)
    fwd = eye - np.asarray(target, np.float64)  # camera z points away
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(np.asarray(up, np.float64), fwd)
    if np.linalg.norm(right) < 1e-8:
        right = np.array([1.0, 0.0, 0.0])
    right = right / np.linalg.norm(right)
    true_up = np.cross(fwd, right)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, true_up, fwd, eye
    return c2w


# -- VIBE pkl -> MoCo-Flow JSON --------------------------------------------

def _load_vibe(pkl_path: str) -> dict:
    try:
        import joblib
        out = joblib.load(open(pkl_path, "rb"))
    except ImportError:
        import pickle
        with open(pkl_path, "rb") as f:
            out = pickle.load(f)
    assert len(out) == 1, "expected a single-person VIBE output"
    return out[list(out.keys())[0]]

def _vibe_transl(person: dict, frame_id: int, focal: float, w: int):
    if "orig_cam" in person:
        cam = person["orig_cam"][frame_id]
        return np.array([cam[2], cam[3], 2 * focal / (cam[0] * w)])
    return np.asarray(person["transls"][frame_id])


def create_moco_flow_data(pkl_path: str, size, focal: float = 2000.0,
                          c=None, gender: str = "neutral"):
    """VIBE output -> train.json/val.json next to the pkl
    (ref data_utils.py:203-270)."""
    person = _load_vibe(pkl_path)
    save_folder = osp.dirname(pkl_path)
    h, w = size
    cam_c = np.array([w / 2, h / 2] if c is None else c)
    camera_pose = np.diag([1.0, -1.0, -1.0, 1.0])
    meta = {"gender": gender, "image_height": h, "image_width": w,
            "camera_focal": focal, "camera_c": cam_c, "D": np.zeros(5),
            "frames": []}
    for frame_id in person["frame_ids"]:
        meta["frames"].append({
            "file_path": f"{frame_id:04d}.png",
            "camera_pose": camera_pose,
            "pose": np.asarray(person["pose"][frame_id]),
            "betas": np.asarray(person["betas"][frame_id]),
            "transl": _vibe_transl(person, frame_id, focal, w),
        })
    for name in ("train.json", "val.json"):
        with open(osp.join(save_folder, name), "w") as f:
            json.dump(meta, f, indent=4, cls=NumpyEncoder)
    return meta


def create_init_nerf_data(pkl_path: str, size, focal: float = 2000.0,
                          c=None, gender: str = "neutral",
                          num_images: int = 120, smpl_data=None):
    """Render ``num_images`` views of the frame-0 posed SMPL with a position
    colormap -> ``init_nerf/{images,train.json,val.json}``
    (ref data_utils.py:273-336), using the in-repo software rasterizer."""
    import jax.numpy as jnp
    from PIL import Image
    from moco_flow_tpu.geometry.smpl import load_smpl_data, smpl_forward
    from scripts.rasterizer import rasterize_mesh

    person = _load_vibe(pkl_path)
    save_folder = osp.dirname(pkl_path)
    h, w = size
    cam_c = [w / 2, h / 2] if c is None else list(c)
    pose0 = np.asarray(person["pose"][0], np.float32)
    betas0 = np.asarray(person["betas"][0], np.float32)
    transl0 = _vibe_transl(person, 0, focal, w).astype(np.float32)

    smpl = smpl_data if smpl_data is not None else load_smpl_data(gender)
    verts = np.asarray(smpl_forward(smpl, jnp.asarray(pose0)[None],
                                    jnp.asarray(betas0)[None]))[0] + transl0
    lo, hi = verts.min(0), verts.max(0)
    colors = (verts - lo) / (hi - lo + 1e-8)

    meta = {"gender": gender, "image_height": h, "image_width": w,
            "camera_focal": focal, "camera_c": np.asarray(cam_c),
            "D": np.zeros(5), "frames": []}
    out_imgs = osp.join(save_folder, "init_nerf", "images")
    os.makedirs(out_imgs, exist_ok=True)
    radius = float(np.sqrt((transl0 ** 2).sum()))
    for frame_id, pos in enumerate(sample_on_sphere(num_images, radius)):
        c2w = look_at_pose(pos + transl0, transl0)
        rgba = rasterize_mesh(verts, smpl.faces, colors, c2w, focal, cam_c,
                              (h, w), bkgd=1.0)
        Image.fromarray((rgba * 255).astype(np.uint8), "RGBA").save(
            osp.join(out_imgs, f"{frame_id:04d}.png"))
        meta["frames"].append({
            "file_path": f"{frame_id:04d}.png",
            "camera_pose": c2w,
            "pose": pose0, "betas": betas0, "transl": transl0,
        })
    for name in ("train.json", "val.json"):
        with open(osp.join(save_folder, "init_nerf", name), "w") as f:
            json.dump(meta, f, indent=4, cls=NumpyEncoder)
    return meta
