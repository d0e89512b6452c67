import jax
import jax.numpy as jnp
import numpy as np

from moco_flow_tpu.data.correspondence import (
    build_correspondence_table,
    sample_correspondences,
)
from moco_flow_tpu.geometry.smpl import (
    rodrigues,
    smpl_forward,
    smpl_joints,
    smpl_vertex_transforms,
    synthetic_smpl_data,
)
from moco_flow_tpu.ops.knn import nearest_neighbor


def test_rodrigues_z_rotation():
    theta = 0.8
    r = np.asarray(rodrigues(jnp.array([[0.0, 0.0, theta]])))[0]
    c, s = np.cos(theta), np.sin(theta)
    np.testing.assert_allclose(r, [[c, -s, 0], [s, c, 0], [0, 0, 1]], atol=1e-5)


def test_smpl_zero_pose_is_template():
    data = synthetic_smpl_data(128)
    pose = jnp.zeros((1, 72))
    betas = jnp.zeros((1, 10))
    v = smpl_forward(data, pose, betas)
    np.testing.assert_allclose(np.asarray(v)[0], np.asarray(data.v_template),
                               atol=1e-4)
    t = smpl_vertex_transforms(data, pose, betas)
    np.testing.assert_allclose(np.asarray(t)[0],
                               np.broadcast_to(np.eye(4), (128, 4, 4)),
                               atol=1e-4)


def test_smpl_root_rotation_rotates_about_root():
    data = synthetic_smpl_data(128)
    pose = jnp.zeros((1, 72)).at[0, 2].set(0.9)  # rotate root about z
    betas = jnp.zeros((1, 10))
    v = np.asarray(smpl_forward(data, pose, betas))[0]
    r = np.asarray(rodrigues(jnp.array([[0.0, 0.0, 0.9]])))[0]
    j0 = np.asarray(smpl_joints(data, data.v_template[None]))[0, 0]
    want = (np.asarray(data.v_template) - j0) @ r.T + j0
    np.testing.assert_allclose(v, want, atol=1e-3)


def test_smpl_transforms_match_forward():
    """v_posed through per-vertex transforms == smpl_forward output when pose
    blendshapes are inactive (zero pose-dirs contribution is approximated by
    comparing both APIs on the same pose)."""
    data = synthetic_smpl_data(96)
    rng = np.random.default_rng(3)
    pose = jnp.asarray(rng.normal(scale=0.2, size=(2, 72)), jnp.float32)
    betas = jnp.asarray(rng.normal(scale=0.5, size=(2, 10)), jnp.float32)
    v = smpl_forward(data, pose, betas)
    t = smpl_vertex_transforms(data, pose, betas)
    # reconstruct v_posed host-side
    v_shaped = np.asarray(data.v_template) + np.einsum(
        "vck,bk->bvc", np.asarray(data.shapedirs), np.asarray(betas))
    rots = np.asarray(rodrigues(pose.reshape(-1, 3))).reshape(2, 24, 3, 3)
    lrotmin = (rots[:, 1:] - np.eye(3)).reshape(2, -1)
    v_posed = v_shaped + np.einsum("vck,bk->bvc", np.asarray(data.posedirs),
                                   lrotmin)
    homo = np.concatenate([v_posed, np.ones((2, 96, 1))], axis=-1)
    want = np.einsum("bvmn,bvn->bvm", np.asarray(t), homo)[..., :3]
    np.testing.assert_allclose(np.asarray(v), want, atol=1e-4)


def test_knn_matches_numpy():
    rng = np.random.default_rng(0)
    refs = rng.normal(size=(500, 3)).astype(np.float32)
    queries = rng.normal(size=(321, 3)).astype(np.float32)
    dist, idx = nearest_neighbor(jnp.asarray(refs), jnp.asarray(queries),
                                 chunk=64)
    d2 = ((queries[:, None] - refs[None]) ** 2).sum(-1)
    want_idx = d2.argmin(-1)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    np.testing.assert_allclose(np.asarray(dist),
                               np.sqrt(d2[np.arange(321), want_idx]),
                               rtol=1e-3, atol=1e-4)


def test_correspondence_identity_frame():
    """Sampling from the canonical frame itself: chain = T0 @ inv(T0) = I, so
    cano == query."""
    data = synthetic_smpl_data(128)
    rng = np.random.default_rng(1)
    poses = jnp.asarray(rng.normal(scale=0.1, size=(3, 72)), jnp.float32)
    betas = jnp.zeros((3, 10))
    table = build_correspondence_table(data, poses, betas)
    out = sample_correspondences(table, jnp.asarray(0), jax.random.key(0),
                                 num_sampled=256, thickness=0.1)
    np.testing.assert_allclose(np.asarray(out["cano"]),
                               np.asarray(out["query"]), atol=1e-3)
    assert out["query"].shape == (512, 3)
    assert bool(jnp.any(out["inside"])) and bool(jnp.any(~out["inside"]))


def test_correspondence_cross_frame_maps_surface():
    """Surface points of frame 1 map near the posed surface of frame 0."""
    data = synthetic_smpl_data(256)
    rng = np.random.default_rng(2)
    poses = np.zeros((2, 72), np.float32)
    poses[1, 3:] = rng.normal(scale=0.3, size=69)  # pose frame 1 differently
    table = build_correspondence_table(data, jnp.asarray(poses),
                                       jnp.zeros((2, 10)))
    out = sample_correspondences(table, jnp.asarray(1), jax.random.key(1),
                                 num_sampled=256, thickness=0.05)
    inside = np.asarray(out["inside"])
    cano = np.asarray(out["cano"])[inside]
    verts0 = np.asarray(table.verts)[0]
    d = np.sqrt(((cano[:, None] - verts0[None]) ** 2).sum(-1)).min(-1)
    # inside pts started < 0.05 from frame-1 surface; their canonical images
    # should stay close to frame-0 surface (rigid-per-vertex map)
    assert np.median(d) < 0.15
