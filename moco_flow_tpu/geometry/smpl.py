"""SMPL body model in JAX.

Functional rebuild of the reference ``utils/smpl/smpl_model.py`` (itself derived
from the public GraphCMR SMPL port): shape blendshapes, joint regression, pose
blendshapes, forward kinematics over the 24-joint kinematic tree, and linear
blend skinning — plus the per-vertex 4x4 transformation used for frame
correspondences (smpl_model.py:96-139, 141-186).

TPU-native notes:
  - Everything is batched jnp; the FK chain is an unrolled 24-step loop over a
    *static* parent table (the reference's Python loop, smpl_model.py:127-129 —
    24 is small enough that unrolling beats a gather-based ``lax.scan``).
  - Model data loads once into a ``SMPLData`` pytree of device arrays; the
    dense J_regressor matmul replaces the reference's per-batch sparse loop
    (smpl_model.py:104-107).
  - The SMPL pickle is *not* shipped (same as the reference — users download
    it); :func:`synthetic_smpl_data` provides a small stand-in body so the
    full pipeline and tests run without it.
"""

from __future__ import annotations

import dataclasses
import os
import pickle

import numpy as np

import jax
import jax.numpy as jnp

NUM_JOINTS = 24


@dataclasses.dataclass
class SMPLData:
    """SMPL model constants, held as HOST numpy arrays.

    Not a pytree: the FK functions close over it, so jit embeds the arrays as
    compile-time constants. They must be host-resident — closure-captured
    *device* arrays are fetched back to the host during MLIR lowering, which
    is pathologically slow on tunneled TPU backends."""
    v_template: np.ndarray   # (V, 3)
    shapedirs: np.ndarray    # (V, 3, 10)
    posedirs: np.ndarray     # (V, 3, 207)
    j_regressor: np.ndarray  # (24, V)
    lbs_weights: np.ndarray  # (V, 24)
    parents: np.ndarray      # (23,) host ints: parent of joints 1..23
    faces: np.ndarray        # (F, 3) host ints

    @property
    def num_vertices(self) -> int:
        return self.v_template.shape[0]


def load_smpl_data(gender: str = "neutral", model_dir: str | None = None) -> SMPLData:
    """Load the standard SMPL pickle ``basicmodel_<gender>_lbs_10_207_0_v1.1.0.pkl``.

    Search order: ``model_dir``, ``$SMPL_MODEL_DIR``, ``./data/smpl``.
    """
    candidates = []
    if model_dir:
        candidates.append(model_dir)
    if os.environ.get("SMPL_MODEL_DIR"):
        candidates.append(os.environ["SMPL_MODEL_DIR"])
    candidates.append(os.path.join(os.getcwd(), "data", "smpl"))
    name = f"basicmodel_{gender}_lbs_10_207_0_v1.1.0.pkl"
    for d in candidates:
        path = os.path.join(d, name)
        if os.path.exists(path):
            break
    else:
        raise FileNotFoundError(
            f"SMPL model {name} not found in {candidates}; set SMPL_MODEL_DIR "
            "or pass model_dir (download from the SMPL website).")
    with open(path, "rb") as f:
        m = pickle.load(f, encoding="iso-8859-1")
    jr = m["J_regressor"]
    jr = np.asarray(jr.todense()) if hasattr(jr, "todense") else np.asarray(jr)
    kin = np.asarray(m["kintree_table"]).astype(np.int64)
    id_to_col = {int(kin[1, i]): i for i in range(kin.shape[1])}
    parents = np.array([id_to_col[int(kin[0, i])] for i in range(1, kin.shape[1])])
    v = np.asarray(m["v_template"], np.float32)
    return SMPLData(
        v_template=v,
        shapedirs=np.asarray(m["shapedirs"], np.float32)[:, :, :10],
        posedirs=np.asarray(m["posedirs"], np.float32),
        j_regressor=np.asarray(jr, np.float32),
        lbs_weights=np.asarray(m["weights"], np.float32),
        parents=parents,
        faces=np.asarray(m["f"]).astype(np.int64),
    )


def synthetic_smpl_data(num_vertices: int = 512, seed: int = 0) -> SMPLData:
    """A small random-but-valid SMPL-like body for tests and dry runs:
    vertices on a capsule, a chain kinematic tree, smooth LBS weights."""
    rng = np.random.default_rng(seed)
    # capsule-ish template spanning y in [-1, 1]
    y = np.linspace(-1.0, 1.0, num_vertices).astype(np.float32)
    theta = rng.uniform(0, 2 * np.pi, num_vertices).astype(np.float32)
    r = 0.25 * (1.0 - 0.5 * np.abs(y))
    v_template = np.stack([r * np.cos(theta), y, r * np.sin(theta)], -1)
    # chain tree: parent[i] = i-1
    parents = np.arange(0, NUM_JOINTS - 1)
    joints_y = np.linspace(-1.0, 1.0, NUM_JOINTS).astype(np.float32)
    # regressor: softmax over vertex-joint y distance
    d = -np.abs(y[None, :] - joints_y[:, None]) * 20
    j_regressor = np.exp(d) / np.exp(d).sum(1, keepdims=True)
    w = np.exp(-np.abs(y[:, None] - joints_y[None, :]) * 8)
    lbs_weights = (w / w.sum(1, keepdims=True)).astype(np.float32)
    try:  # a closed triangulation so mesh-based consumers (rasterizer) work
        from scipy.spatial import ConvexHull
        faces = ConvexHull(v_template).simplices.astype(np.int64)
    except ImportError:
        faces = np.zeros((1, 3), np.int64)
    return SMPLData(
        v_template=v_template,
        shapedirs=rng.normal(scale=0.01,
                             size=(num_vertices, 3, 10)).astype(np.float32),
        posedirs=rng.normal(scale=0.001,
                            size=(num_vertices, 3, 207)).astype(np.float32),
        j_regressor=j_regressor.astype(np.float32),
        lbs_weights=lbs_weights,
        parents=parents,
        faces=faces,
    )


def rodrigues(theta: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3) via the quaternion
    route the reference uses (smpl_model.py:40-54): angle = |theta + 1e-8|,
    q = (cos(a/2), sin(a/2) axis)."""
    l1 = jnp.linalg.norm(theta + 1e-8, axis=-1, keepdims=True)
    axis = theta / l1
    half = l1 * 0.5
    w = jnp.cos(half)
    xyz = jnp.sin(half) * axis
    q = jnp.concatenate([w, xyz], axis=-1)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = qw * qw, qx * qx, qy * qy, qz * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    r = jnp.stack([
        w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
        2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
        2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
    ], axis=-1)
    return r.reshape(*theta.shape[:-1], 3, 3)


def _joint_transforms(data: SMPLData, pose: jnp.ndarray, betas: jnp.ndarray):
    """Shared core of forward/vertex-transform: returns (G, v_posed) where G is
    the (B, 24, 4, 4) rest-pose-relative global joint transform
    (smpl_model.py:99-135)."""
    b = pose.shape[0]
    v_shaped = data.v_template + jnp.einsum("vck,bk->bvc", data.shapedirs, betas)
    joints = jnp.einsum("jv,bvc->bjc", data.j_regressor, v_shaped)  # (B, 24, 3)
    if pose.ndim == 4:
        rots = pose
    else:
        rots = rodrigues(pose.reshape(b, NUM_JOINTS, 3))
    lrotmin = (rots[:, 1:] - jnp.eye(3)).reshape(b, 207)
    v_posed = v_shaped + jnp.einsum("vck,bk->bvc", data.posedirs, lrotmin)

    rel = joints.at[:, 1:].add(-joints[:, np.asarray(data.parents)])
    local = jnp.concatenate([rots, rel[..., None]], axis=-1)  # (B, 24, 3, 4)
    pad = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0, 1.0]), (b, NUM_JOINTS, 1, 4))
    local = jnp.concatenate([local, pad], axis=-2)  # (B, 24, 4, 4)

    # FK over the static tree (unrolled; 24 joints)
    globals_ = [local[:, 0]]
    for i in range(1, NUM_JOINTS):
        globals_.append(globals_[int(data.parents[i - 1])] @ local[:, i])
    g = jnp.stack(globals_, axis=1)  # (B, 24, 4, 4)

    # subtract the transformed rest joint position so G maps rest -> posed
    rest = jnp.concatenate(
        [joints, jnp.zeros((b, NUM_JOINTS, 1))], axis=-1)[..., None]  # (B,24,4,1)
    correction = jnp.concatenate(
        [jnp.zeros((b, NUM_JOINTS, 4, 3)), g @ rest], axis=-1)
    return g - correction, v_posed


def smpl_forward(data: SMPLData, pose: jnp.ndarray, betas: jnp.ndarray) -> jnp.ndarray:
    """Posed vertices (B, V, 3) from pose (B, 72) or (B, 24, 3, 3) and betas
    (B, 10) (smpl_model.py:96-139)."""
    g, v_posed = _joint_transforms(data, pose, betas)
    t = jnp.einsum("vj,bjmn->bvmn", data.lbs_weights, g)  # (B, V, 4, 4)
    homo = jnp.concatenate([v_posed, jnp.ones_like(v_posed[..., :1])], axis=-1)
    return jnp.einsum("bvmn,bvn->bvm", t, homo)[..., :3]


def smpl_vertex_transforms(data: SMPLData, pose: jnp.ndarray,
                           betas: jnp.ndarray) -> jnp.ndarray:
    """Per-vertex rest->posed 4x4 transforms (B, V, 4, 4)
    (smpl_model.py:141-186)."""
    g, _ = _joint_transforms(data, pose, betas)
    return jnp.einsum("vj,bjmn->bvmn", data.lbs_weights, g)


def smpl_joints(data: SMPLData, vertices: jnp.ndarray) -> jnp.ndarray:
    """Joint positions regressed from vertices (smpl_model.py:188-197)."""
    return jnp.einsum("jv,bvc->bjc", data.j_regressor, vertices)
