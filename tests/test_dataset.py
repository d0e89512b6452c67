"""Device-resident dataset tests: jitted ray sampler correctness, background
modes, frame table geometry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moco_flow_tpu.data.dataset import MoCoFlowDataset, NoFDataset
from moco_flow_tpu.data.synthetic import make_synthetic_scene
from moco_flow_tpu.geometry.smpl import synthetic_smpl_data


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene"))
    smpl = make_synthetic_scene(root, n_frames=4, size=32, focal=40.0)
    return root, smpl


@pytest.fixture(scope="module")
def ds(scene):
    root, smpl = scene
    return MoCoFlowDataset(root, "images", (32, 32),
                           [[1.2, 1.2, 1.2], [0, 0, 0]], 0.5,
                           smpl_data=smpl)


def test_frame_table_shapes(ds):
    t = ds.table
    assert t.c2w.shape == (4, 3, 4)
    assert t.near.shape == (4,) and np.all(np.asarray(t.near) > 0)
    assert np.all(np.asarray(t.near) < np.asarray(t.far))
    np.testing.assert_allclose(np.asarray(t.norm_idx),
                               np.arange(4) * 2 / 4 - 1)
    assert ds.images.shape == (4, 32 * 32, 4)
    assert ds.has_alpha


def test_sample_rays_geometry(ds):
    rays, rgbs, bg = ds.sample_rays(jnp.asarray(1), jax.random.key(0), 256)
    rays = np.asarray(rays)
    assert rays.shape == (256, 9) and rgbs.shape == (256, 3)
    # unit directions
    np.testing.assert_allclose(np.linalg.norm(rays[:, 3:6], axis=-1), 1.0,
                               rtol=1e-5)
    # origin == recentered camera position for every ray
    c2w = np.asarray(ds.table.c2w)[1]
    np.testing.assert_allclose(rays[:, 0:3], np.tile(c2w[:, 3], (256, 1)),
                               atol=1e-5)
    # near/far and frame index constant per frame
    np.testing.assert_allclose(rays[:, 8], float(ds.table.norm_idx[1]))
    # rgbs composited onto the 0.5 gray background stay in [0,1]
    assert np.all(np.asarray(rgbs) >= 0) and np.all(np.asarray(rgbs) <= 1)


def test_sample_rays_respects_valid_mask(ds):
    rays, _, _ = ds.sample_rays(jnp.asarray(0), jax.random.key(1), 512)
    # reconstruct pixel ids by matching directions against the grid
    mask = ds.masks[0]
    # all sampled pixels must come from the valid set: verify via the
    # valid_idx table itself
    count = int(ds.table.valid_count[0])
    table_ids = set(np.asarray(ds.table.valid_idx)[0].tolist())
    flat_valid = set(np.flatnonzero(mask).tolist())
    assert table_ids == flat_valid
    assert count == len(flat_valid)


def test_rand_background_changes_per_key(scene):
    root, smpl = scene
    ds = MoCoFlowDataset(root, "images", (32, 32),
                         [[1.2, 1.2, 1.2], [0, 0, 0]], "rand",
                         smpl_data=smpl)
    _, _, bg1 = ds.sample_rays(jnp.asarray(0), jax.random.key(0), 16)
    _, _, bg2 = ds.sample_rays(jnp.asarray(0), jax.random.key(1), 16)
    # constant color within a batch, different across keys
    assert np.allclose(np.asarray(bg1), np.asarray(bg1)[0])
    assert not np.allclose(np.asarray(bg1), np.asarray(bg2))


def test_frame_rgbs_composites(ds):
    rgbs = ds.frame_rgbs(0)
    assert rgbs.shape == (32 * 32, 3)
    arr = np.asarray(ds.images[0]).reshape(32, 32, 4)
    flat = np.asarray(rgbs).reshape(32, 32, 3)
    empty = arr[..., 3] == 0
    # alpha-0 pixels equal the 0.5 background
    np.testing.assert_allclose(flat[empty], 0.5, atol=1e-6)


def test_nof_dataset_imageless(scene):
    root, smpl = scene
    ds = NoFDataset(root, smpl_data=smpl)
    assert ds.images is None
    corr = ds.get_frame_correspondence(1, jax.random.key(0), num_sampled=64)
    assert corr["query"].shape == (128, 3)


def test_interval_subsampling(scene):
    root, smpl = scene
    ds2 = MoCoFlowDataset(root, "images", (32, 32),
                          [[1.2, 1.2, 1.2], [0, 0, 0]], 1.0, interval=2,
                          smpl_data=smpl)
    assert ds2.num_frames == 2
