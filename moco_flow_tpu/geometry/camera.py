"""Cameras, rays, and AABB utilities.

Vectorized jnp/numpy equivalents of the reference ``utils/camera.py``, matching
its conventions exactly: pinhole directions with OpenGL-style y/z sign flips and
*no* half-pixel offset (camera.py:41-49), normalized world-space directions
(camera.py:74-75), near/far from camera<->AABB-corner distances
(camera.py:138-139), and a valid-ray mask from the filled convex hull of the
projected AABB corners (camera.py:119-132).

TPU-native split:
  - ``ray_directions``/``rays_from_pose`` are pure jnp and run *inside jit* —
    rays are generated on device from tiny per-frame camera parameters instead
    of being precomputed host-side and shipped over PCIe per step.
  - the convex-hull valid mask is host-side numpy/cv2 (computed once per frame
    at dataset init, cached).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# AABB utils (ref utils/camera.py:6-26)
# ---------------------------------------------------------------------------

def rescale_aabb(aabb: np.ndarray, scale=(1, 1, 1), offset=(0, 0, 0)) -> np.ndarray:
    """Scale an AABB about its center, then pad by ``offset``."""
    aabb = np.asarray(aabb, np.float64).copy()
    center = (aabb[1] + aabb[0]) / 2
    aabb = (aabb - center) * np.asarray(scale) + center
    aabb[0] -= np.asarray(offset)
    aabb[1] += np.asarray(offset)
    return aabb


def aabb_corners(aabb: np.ndarray) -> np.ndarray:
    """(2, 3) min/max -> (8, 3) corner vertices."""
    lo, hi = np.asarray(aabb)[0], np.asarray(aabb)[1]
    return np.array([[x, y, z] for x in (lo[0], hi[0])
                     for y in (lo[1], hi[1]) for z in (lo[2], hi[2])],
                    dtype=np.float64)


# ---------------------------------------------------------------------------
# Ray generation (device-side)
# ---------------------------------------------------------------------------

def ray_directions(h: int, w: int, focal, center) -> jnp.ndarray:
    """Per-pixel ray directions in camera coordinates, (H, W, 3).

    Matches camera.py:41-49: ``[(i-cx)/fx, -(j-cy)/fx, -1]`` — note the
    reference uses fx for both axes and omits the +0.5 pixel center.
    """
    fx = focal[0] if hasattr(focal, "__len__") else focal
    i = jnp.arange(w, dtype=jnp.float32)[None, :].repeat(h, axis=0)
    j = jnp.arange(h, dtype=jnp.float32)[:, None].repeat(w, axis=1)
    return jnp.stack([(i - center[0]) / fx, -(j - center[1]) / fx,
                      -jnp.ones_like(i)], axis=-1)


def rays_from_pose(directions: jnp.ndarray, c2w: jnp.ndarray):
    """World-space (rays_o, rays_d) from camera-space directions and a (3, 4)
    camera-to-world matrix; directions normalized (camera.py:73-77)."""
    rays_d = directions @ c2w[:, :3].T
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(c2w[:, 3], rays_d.shape)
    return rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)


def near_far_from_aabb(corners: np.ndarray, cam_origin: np.ndarray):
    """near/far = min/max camera-to-corner distance (camera.py:138-139)."""
    d = np.sqrt(np.sum((corners - cam_origin) ** 2, axis=-1))
    return float(d.min()), float(d.max())


def make_rays(directions: jnp.ndarray, c2w: jnp.ndarray, near: float,
              far: float, idx: float) -> jnp.ndarray:
    """Packed per-pixel rays (H*W, 9): [o, d, near, far, normalized idx]
    (camera.py:134-148)."""
    rays_o, rays_d = rays_from_pose(directions, c2w)
    ones = jnp.ones_like(rays_o[:, :1])
    return jnp.concatenate(
        [rays_o, rays_d, near * ones, far * ones, idx * ones], axis=1)


# ---------------------------------------------------------------------------
# Projection + valid-ray mask (host-side, per-frame precompute)
# ---------------------------------------------------------------------------

def project_points(pts_world: np.ndarray, c2w4: np.ndarray,
                   intrinsics: np.ndarray) -> np.ndarray:
    """World points -> integer pixel coords (camera.py:84-104), including the
    reference's y/z sign flip into the projective frame."""
    pts = np.asarray(pts_world, np.float64).T  # (3, N)
    homo = np.vstack([pts, np.ones((1, pts.shape[1]))])
    cam = np.linalg.inv(np.asarray(c2w4, np.float64)) @ homo
    cam = cam[:3] / cam[3]
    cam[1:] *= -1
    pix = np.asarray(intrinsics, np.float64) @ cam
    pix = pix[:2] / pix[2]
    return pix.T.astype(np.int32)


def valid_rays_mask(size, aabb_verts: np.ndarray, c2w4: np.ndarray,
                    intrinsics: np.ndarray) -> np.ndarray:
    """Boolean (H*W,) mask of pixels inside the convex hull of the projected
    AABB corners (camera.py:119-132)."""
    import cv2
    pix = project_points(aabb_verts, c2w4, intrinsics)
    mask = np.zeros(tuple(size), np.uint8)
    hull = cv2.convexHull(pix.astype(np.int32))
    cv2.fillConvexPoly(mask, hull, 255)
    return (mask > 0).reshape(-1)


class Camera:
    """Pinhole camera with precomputed per-pixel directions.

    Parity with the reference ``Camera`` class (camera.py:107-148); the
    direction grid is computed once and kept as a device array so per-frame ray
    construction is jit-side math.
    """

    def __init__(self, size, intrinsics: np.ndarray, distortion=None):
        self.size = tuple(size)
        self.K = np.asarray(intrinsics, np.float64)
        self.D = np.zeros(5) if distortion is None else np.asarray(distortion)
        focal = [self.K[0][0], self.K[1][1]]
        center = [self.K[0][2], self.K[1][2]]
        self.directions = ray_directions(self.size[0], self.size[1], focal, center)

    def valid_rays_mask(self, aabb_verts: np.ndarray, c2w4: np.ndarray) -> np.ndarray:
        return valid_rays_mask(self.size, aabb_verts, c2w4, self.K)

    def make_rays(self, aabb_verts: np.ndarray, c2w4: np.ndarray,
                  idx: float) -> jnp.ndarray:
        near, far = near_far_from_aabb(aabb_verts, np.asarray(c2w4)[:3, 3])
        c2w = jnp.asarray(np.asarray(c2w4)[:3, :4], jnp.float32)
        return make_rays(self.directions, c2w, near, far, idx)
