import jax
import jax.numpy as jnp
import numpy as np

from moco_flow_tpu.nn.nerf import NeRFConfig, init_nerf, nerf_apply, nerf_sigma, sigma_branch_params
from moco_flow_tpu.nn.nof import NoFConfig, init_nof, nof_apply
from moco_flow_tpu.nn.quaternion import (
    log_quaternion_to_rotation_matrix,
    quaternion_log_to_exp,
    quaternion_to_rotation_matrix,
)


def test_quaternion_log_to_exp_small_angle():
    v = jnp.array([[1e-5, 0.0, 0.0]])
    q = np.asarray(quaternion_log_to_exp(v))
    np.testing.assert_allclose(q[0], [1.0, 1e-5, 0.0, 0.0], atol=1e-6)


def test_quaternion_rotation_properties():
    v = jax.random.normal(jax.random.key(3), (32, 3))
    r = np.asarray(log_quaternion_to_rotation_matrix(v))
    eye = np.einsum("bij,bkj->bik", r, r)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)


def test_quaternion_known_rotation():
    # log-quat (theta/2 about z): rotation by theta about z.
    theta = 0.7
    v = jnp.array([[0.0, 0.0, theta / 2]])
    r = np.asarray(log_quaternion_to_rotation_matrix(v))[0]
    c, s = np.cos(theta), np.sin(theta)
    want = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(r, want, atol=1e-5)


def test_quaternion_to_rotation_matrix_identity():
    q = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    np.testing.assert_allclose(
        np.asarray(quaternion_to_rotation_matrix(q))[0], np.eye(3), atol=1e-6)


def test_nerf_shapes_and_sigma_consistency(key):
    cfg = NeRFConfig(depth=8, width=256, in_channels_xyz=63, skips=(4,),
                     extra_feat_type="dir", extra_feat_dim=27)
    params = init_nerf(key, cfg)
    x = jax.random.normal(jax.random.key(1), (64, 63))
    e = jax.random.normal(jax.random.key(2), (64, 27))
    out = nerf_apply(params, x, e, cfg)
    assert out.shape == (64, 4)
    rgb = np.asarray(out[:, :3])
    assert np.all(rgb >= 0) and np.all(rgb <= 1)  # sigmoid head
    sig = nerf_sigma(params, x, cfg)
    np.testing.assert_allclose(np.asarray(out[:, 3:]), np.asarray(sig),
                               rtol=1e-5, atol=1e-5)


def test_nerf_extra_feat_none(key):
    cfg = NeRFConfig(extra_feat_type="none", extra_feat_dim=0)
    params = init_nerf(key, cfg)
    out = nerf_apply(params, jnp.ones((8, 63)), None, cfg)
    assert out.shape == (8, 4)


def test_sigma_branch_subtree(key):
    cfg = NeRFConfig()
    params = init_nerf(key, cfg)
    sub = sigma_branch_params(params)
    assert set(sub) == {"trunk", "sigma", "final"}


def test_nof_offset_mode(key):
    cfg = NoFConfig(use_quat=False)
    params = init_nof(key, cfg)
    inputs = jax.random.normal(jax.random.key(5), (16, cfg.in_dim))
    xyz = jax.random.normal(jax.random.key(6), (16, 3))
    out = nof_apply(params, inputs, xyz, cfg)
    assert out.shape == (16, 3)
    # offset mode: out - xyz equals the raw head output, independent of xyz
    out2 = nof_apply(params, inputs, xyz + 1.0, cfg)
    np.testing.assert_allclose(np.asarray(out2 - out), 1.0, atol=1e-5)


def test_nof_quat_mode_rigid(key):
    """With a crafted head, the quat NoF applies (x-s)@R + s + t."""
    cfg = NoFConfig(use_quat=True)
    params = init_nof(key, cfg)
    # force head output to a constant transform: v=(0,0,0.35), s=(1,2,3), t=(0.1,0,0)
    const = jnp.array([0.0, 0.0, 0.35, 1.0, 2.0, 3.0, 0.1, 0.0, 0.0])
    params["head"]["w"] = jnp.zeros_like(params["head"]["w"])
    params["head"]["b"] = const
    inputs = jnp.zeros((4, cfg.in_dim))
    xyz = jnp.asarray(np.random.default_rng(7).normal(size=(4, 3)), jnp.float32)
    out = np.asarray(nof_apply(params, inputs, xyz, cfg))
    r = np.asarray(log_quaternion_to_rotation_matrix(const[None, :3]))[0]
    s, t = np.array([1.0, 2.0, 3.0]), np.array([0.1, 0.0, 0.0])
    want = (np.asarray(xyz) - s) @ r + s + t
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_linear_init_bounds(key):
    from moco_flow_tpu.nn.mlp import init_linear
    p = init_linear(key, 100, 50)
    bound = 1.0 / np.sqrt(100)
    assert np.all(np.abs(np.asarray(p["w"])) <= bound)
    assert np.all(np.abs(np.asarray(p["b"])) <= bound)
