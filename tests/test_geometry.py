import jax
import jax.numpy as jnp
import numpy as np

from moco_flow_tpu.geometry.camera import (
    Camera,
    aabb_corners,
    near_far_from_aabb,
    project_points,
    ray_directions,
    rays_from_pose,
    rescale_aabb,
)
from moco_flow_tpu.geometry.poses import create_spheric_poses, pose_spherical


def test_rescale_aabb():
    aabb = np.array([[-1.0, -2.0, -3.0], [1.0, 2.0, 3.0]])
    out = rescale_aabb(aabb, scale=[2, 1, 1], offset=[0, 0, 0.5])
    np.testing.assert_allclose(out[0], [-2.0, -2.0, -3.5])
    np.testing.assert_allclose(out[1], [2.0, 2.0, 3.5])


def test_aabb_corners():
    c = aabb_corners([[0, 0, 0], [1, 2, 3]])
    assert c.shape == (8, 3)
    assert {tuple(x) for x in c} == {(x, y, z) for x in (0, 1)
                                    for y in (0, 2) for z in (0, 3)}


def test_ray_directions_convention():
    """Center pixel looks down -z; +x to the right, -y down (OpenGL-ish,
    no half-pixel offset)."""
    h = w = 5
    focal, center = [2.0], [2.0, 2.0]
    d = np.asarray(ray_directions(h, w, focal, center))
    np.testing.assert_allclose(d[2, 2], [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(d[2, 4], [1.0, 0, -1], atol=1e-6)  # right
    np.testing.assert_allclose(d[4, 2], [0, -1.0, -1], atol=1e-6)  # bottom


def test_rays_from_pose_identity():
    d = ray_directions(3, 3, [1.0], [1.0, 1.0])
    c2w = jnp.asarray(np.hstack([np.eye(3), [[1], [2], [3]]]), jnp.float32)
    o, dirs = rays_from_pose(d, c2w)
    np.testing.assert_allclose(np.asarray(o), np.tile([1, 2, 3], (9, 1)),
                               atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(dirs), axis=-1), 1.0,
                               rtol=1e-5)
    # center ray points along -z
    np.testing.assert_allclose(np.asarray(dirs)[4], [0, 0, -1], atol=1e-6)


def test_near_far():
    corners = aabb_corners([[-1, -1, -1], [1, 1, 1]])
    near, far = near_far_from_aabb(corners, np.array([0, 0, 5.0]))
    np.testing.assert_allclose(near, np.sqrt(1 + 1 + 16), rtol=1e-6)
    np.testing.assert_allclose(far, np.sqrt(1 + 1 + 36), rtol=1e-6)


def _look_down_z_pose(dist=4.0):
    """Camera at +z looking toward origin in the reference convention
    (camera z maps to world +z, so view direction -z)."""
    c2w = np.eye(4)
    c2w[2, 3] = dist
    return c2w


def test_project_points_center():
    k = np.array([[10.0, 0, 8.0], [0, 10.0, 8.0], [0, 0, 1]])
    c2w = _look_down_z_pose(4.0)
    pix = project_points(np.array([[0.0, 0.0, 0.0]]), c2w, k)
    np.testing.assert_array_equal(pix[0], [8, 8])


def test_camera_make_rays_and_mask():
    k = np.array([[20.0, 0, 8.0], [0, 20.0, 8.0], [0, 0, 1]])
    cam = Camera((16, 16), k)
    c2w = _look_down_z_pose(4.0)
    corners = aabb_corners([[-0.5, -0.5, -0.5], [0.5, 0.5, 0.5]])
    rays = np.asarray(cam.make_rays(corners, c2w, idx=0.5))
    assert rays.shape == (256, 9)
    assert np.all(rays[:, 6] < rays[:, 7])  # near < far
    np.testing.assert_allclose(rays[:, 8], 0.5)
    np.testing.assert_allclose(rays[:, 0:3], np.tile([0, 0, 4.0], (256, 1)),
                               atol=1e-5)
    mask = cam.valid_rays_mask(corners, c2w)
    assert mask.shape == (256,)
    assert 0 < mask.sum() < 256  # box covers part of the image
    m = mask.reshape(16, 16)
    assert m[8, 8]  # center is inside
    assert not m[0, 0]


def test_pose_spherical_orbit():
    poses = create_spheric_poses(num=30, radius=2.0)
    assert poses.shape == (90, 4, 4)
    for p in poses[::17]:
        r = p[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(p[:3, 3]), 2.0, rtol=1e-5)


def test_pose_spherical_looks_at_center():
    p = pose_spherical(33.0, -20.0, 3.0)
    # camera -z axis (view direction) points at the origin
    view = -p[:3, 2]
    to_origin = -p[:3, 3] / np.linalg.norm(p[:3, 3])
    np.testing.assert_allclose(view, to_origin, atol=1e-5)
