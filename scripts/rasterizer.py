"""Minimal software mesh rasterizer (numpy, host-side).

Replaces the reference's pyrender + OSMesa offscreen renderer
(scripts/data_utils.py:23-86) for the init_nerf data generation: renders a
posed SMPL mesh with per-vertex colors (position colormap) into RGBA images.
Z-buffered barycentric rasterization; no GPU/GL dependency, so the
preprocessing pipeline runs anywhere the training runs.
"""

from __future__ import annotations

import numpy as np


def rasterize_mesh(verts: np.ndarray, faces: np.ndarray, colors: np.ndarray,
                   c2w4: np.ndarray, focal: float, center, size,
                   bkgd: float = 1.0) -> np.ndarray:
    """Render a triangle mesh.

    Args:
      verts: (V, 3) world-space vertices.
      faces: (F, 3) int triangle indices.
      colors: (V, 3) per-vertex colors in [0, 1].
      c2w4: (4, 4) camera-to-world (reference convention: camera looks along
        its -z, projective y/z flip as camera.py:97).
      focal, center, size: pinhole intrinsics and (H, W).

    Returns (H, W, 4) float RGBA in [0, 1] (alpha = coverage).
    """
    h, w = size
    cx, cy = center
    w2c = np.linalg.inv(c2w4)
    cam = (w2c[:3, :3] @ verts.T + w2c[:3, 3:4]).T  # (V, 3)
    cam[:, 1:] *= -1
    z = cam[:, 2]
    valid_z = z > 1e-6
    u = focal * cam[:, 0] / np.maximum(z, 1e-6) + cx
    v = focal * cam[:, 1] / np.maximum(z, 1e-6) + cy

    img = np.full((h, w, 3), bkgd, np.float32)
    alpha = np.zeros((h, w), np.float32)
    zbuf = np.full((h, w), np.inf, np.float32)

    tri_uv = np.stack([u[faces], v[faces]], axis=-1)  # (F, 3, 2)
    tri_z = z[faces]
    tri_col = colors[faces]
    keep = valid_z[faces].all(axis=1)

    for f in np.flatnonzero(keep):
        uv = tri_uv[f]
        x0 = max(int(np.floor(uv[:, 0].min())), 0)
        x1 = min(int(np.ceil(uv[:, 0].max())) + 1, w)
        y0 = max(int(np.floor(uv[:, 1].min())), 0)
        y1 = min(int(np.ceil(uv[:, 1].max())) + 1, h)
        if x0 >= x1 or y0 >= y1:
            continue
        xs, ys = np.meshgrid(np.arange(x0, x1) + 0.5,
                             np.arange(y0, y1) + 0.5)
        a, b, c = uv[0], uv[1], uv[2]
        det = (b[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (b[1] - a[1])
        if abs(det) < 1e-12:
            continue
        l1 = ((xs - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (ys - a[1])) / det
        l2 = ((b[0] - a[0]) * (ys - a[1]) - (xs - a[0]) * (b[1] - a[1])) / det
        l0 = 1.0 - l1 - l2
        inside = (l0 >= 0) & (l1 >= 0) & (l2 >= 0)
        if not inside.any():
            continue
        # perspective-correct interpolation
        iz = l0 / tri_z[f, 0] + l1 / tri_z[f, 1] + l2 / tri_z[f, 2]
        zi = 1.0 / np.maximum(iz, 1e-12)
        yy, xx = np.nonzero(inside)
        py, px = yy + y0, xx + x0
        zi_in = zi[yy, xx]
        closer = zi_in < zbuf[py, px]
        if not closer.any():
            continue
        py, px = py[closer], px[closer]
        yy, xx = yy[closer], xx[closer]
        zbuf[py, px] = zi[yy, xx]
        wgt = np.stack([l0[yy, xx] / tri_z[f, 0], l1[yy, xx] / tri_z[f, 1],
                        l2[yy, xx] / tri_z[f, 2]], axis=-1)
        wgt /= wgt.sum(-1, keepdims=True)
        img[py, px] = wgt @ tri_col[f]
        alpha[py, px] = 1.0

    return np.concatenate([img, alpha[..., None]], axis=-1)
