"""Preprocessing toolchain tests: VIBE-pkl conversion, software rasterizer,
init_nerf render generation — end to end into a trainable dataset."""

import json
import os.path as osp
import pickle

import numpy as np

from moco_flow_tpu.geometry.smpl import synthetic_smpl_data
from scripts.data_utils import (
    create_init_nerf_data,
    create_moco_flow_data,
    look_at_pose,
    sample_on_sphere,
)
from scripts.rasterizer import rasterize_mesh


def fake_vibe_pkl(path, n_frames=3, seed=0):
    rng = np.random.default_rng(seed)
    poses = np.zeros((n_frames, 72), np.float32)
    poses[:, 3:] = rng.normal(scale=0.1, size=(n_frames, 69))
    data = {1: {
        "frame_ids": np.arange(n_frames),
        "pose": poses,
        "betas": np.zeros((n_frames, 10), np.float32),
        "orig_cam": np.tile([1.0, 1.0, 0.0, 0.0], (n_frames, 1)),
    }}
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return path


def test_create_moco_flow_data(tmp_path):
    pkl = fake_vibe_pkl(str(tmp_path / "vibe_output.pkl"))
    meta = create_moco_flow_data(pkl, (64, 64), focal=80.0)
    assert osp.exists(tmp_path / "train.json")
    loaded = json.load(open(tmp_path / "val.json"))
    assert len(loaded["frames"]) == 3
    fr = loaded["frames"][0]
    assert len(fr["pose"]) == 72 and len(fr["betas"]) == 10
    # orig_cam conversion: transl_z = 2f/(sx*W)
    np.testing.assert_allclose(fr["transl"][2], 2 * 80.0 / (1.0 * 64))
    np.testing.assert_allclose(np.asarray(fr["camera_pose"]),
                               np.diag([1, -1, -1, 1]))


def test_sample_on_sphere_and_look_at():
    pts = sample_on_sphere(32, 3.0)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=-1), 3.0, rtol=1e-6)
    c2w = look_at_pose(np.array([0, 0, 4.0]), np.zeros(3))
    r = c2w[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-8)
    # -z axis (view dir) points at the origin
    np.testing.assert_allclose(-c2w[:3, 2], [0, 0, -1], atol=1e-8)


def test_rasterizer_renders_triangle():
    verts = np.array([[-0.5, -0.5, 0], [0.5, -0.5, 0], [0, 0.5, 0]],
                     np.float32)
    faces = np.array([[0, 1, 2]])
    colors = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    c2w = look_at_pose(np.array([0, 0, 2.0]), np.zeros(3))
    img = rasterize_mesh(verts, faces, colors, c2w, 32.0, (16, 16), (32, 32),
                         bkgd=0.0)
    assert img.shape == (32, 32, 4)
    assert img[..., 3].sum() > 20  # triangle covers pixels
    center = img[16, 16]
    assert center[3] == 1.0
    np.testing.assert_allclose(center[:3].sum(), 1.0, atol=0.05)  # barycentric


def fake_snapshot_gt(gt_dir, n_frames=5, seed=1):
    """Fabricated People-Snapshot GT triplet: camera.pkl / consensus.pkl /
    reconstructed_poses.hdf5 with the real dataset's key schema
    (ref scripts/preprocess_snapshot_data.py:54-74)."""
    import h5py
    rng = np.random.default_rng(seed)
    gt_dir.mkdir(parents=True, exist_ok=True)
    with open(gt_dir / "camera.pkl", "wb") as f:
        pickle.dump({"camera_f": np.array([910.0, 910.0]),
                     "camera_c": np.array([540.0, 540.0]),
                     "camera_k": np.zeros(5)}, f)
    betas = rng.normal(scale=0.03, size=(10,)).astype(np.float64)
    with open(gt_dir / "consensus.pkl", "wb") as f:
        pickle.dump({"betas": betas,
                     "v_personal": np.zeros((6890, 3))}, f)
    poses = np.zeros((n_frames, 72))
    poses[:, 3:] = rng.normal(scale=0.1, size=(n_frames, 69))
    trans = rng.normal(scale=0.05, size=(n_frames, 3)) + [0, 0, 3.0]
    with h5py.File(gt_dir / "reconstructed_poses.hdf5", "w") as h5:
        h5.create_dataset("pose", data=poses)
        h5.create_dataset("trans", data=trans)
        h5.create_dataset("betas", data=betas)
    return poses, trans, betas


def test_snapshot_gt_converter(tmp_path):
    """GT triplet -> VIBE-schema pkl -> train.json, with frames subsampled
    by [start:end:interval] and GT transls passed through untouched."""
    import pytest
    pytest.importorskip("h5py")
    from scripts.preprocess_snapshot_data import convert_snapshot_gt

    poses, trans, betas = fake_snapshot_gt(tmp_path / "gt", n_frames=5)
    out_pkl = str(tmp_path / "converted.pkl")
    converted, focal, c = convert_snapshot_gt(
        str(tmp_path / "gt"), out_pkl, start_frame=1, end_frame=5, interval=2)

    person = converted[1]
    np.testing.assert_array_equal(person["frame_ids"], [0, 1])
    np.testing.assert_allclose(person["pose"], poses[[1, 3]])
    np.testing.assert_allclose(person["transls"], trans[[1, 3]])
    np.testing.assert_allclose(person["betas"], np.stack([betas, betas]))
    assert focal == 910.0
    np.testing.assert_allclose(c, [540.0, 540.0])

    # written pkl is a valid single-person VIBE input for the JSON converter,
    # and GT transls (no orig_cam key) are used verbatim
    meta = create_moco_flow_data(out_pkl, (96, 96), focal=focal, c=c,
                                 gender="m")
    assert len(meta["frames"]) == 2
    loaded = json.load(open(tmp_path / "train.json"))
    np.testing.assert_allclose(loaded["frames"][0]["transl"], trans[1])
    np.testing.assert_allclose(loaded["frames"][0]["betas"], betas)
    assert loaded["camera_focal"] == 910.0
    assert loaded["gender"] == "m"


def test_create_init_nerf_data_end_to_end(tmp_path):
    """Full loop: fake VIBE pkl -> init_nerf dataset -> loadable by the
    MoCoFlowDataset and geometrically consistent."""
    smpl = synthetic_smpl_data(128)
    pkl = fake_vibe_pkl(str(tmp_path / "vibe_output.pkl"))
    create_init_nerf_data(pkl, (48, 48), focal=60.0, num_images=6,
                          smpl_data=smpl)
    root = str(tmp_path / "init_nerf")
    meta = json.load(open(osp.join(root, "train.json")))
    assert len(meta["frames"]) == 6
    from PIL import Image
    img = np.asarray(Image.open(osp.join(root, "images", "0000.png")))
    assert img.shape == (48, 48, 4)
    assert (img[..., 3] > 0).sum() > 10  # body visible

    from moco_flow_tpu.data.dataset import MoCoFlowDataset
    ds = MoCoFlowDataset(root, "images", (48, 48),
                         [[1.2, 1.2, 1.2], [0, 0, 0]], 1.0,
                         smpl_data=smpl)
    assert ds.num_frames == 6
    rays, mask = ds.frame_rays(0)
    assert rays.shape == (48 * 48, 9)
    # the rendered body silhouette lies inside the AABB hull mask
    alpha = (img[..., 3] > 0).reshape(-1)
    assert (alpha & ~np.asarray(mask)).sum() <= alpha.sum() * 0.3


def test_validate_ps_fixtures(tmp_path):
    """The People-Snapshot validation runbook (scripts/validate_ps.py) runs
    green end to end on fabricated fixtures: GT triplet -> converter ->
    dataset build -> 3-stage training -> test.py --eval_metrics. This is
    the CI gate for round-4 verdict item 8 — the exact command a user runs
    the moment real data exists, minus the video extraction."""
    import json as _json
    import os
    import subprocess
    import sys

    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "scripts/validate_ps.py", "--fixtures",
         "--work", str(tmp_path / "vps"), "--reso", "24", "--frames", "2",
         "--steps", "6", "--eval_max_frames", "1", "--stage_timeout", "600"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-3000:]
    out = _json.loads(r.stdout.strip().splitlines()[-1])
    assert out["mode"] == "trained" and out["frames"] == 1
    assert np.isfinite(out["psnr"]) and np.isfinite(out["ssim"])
