"""Multi-chip render sharding: the chunked renderer shards tiles across the
mesh and matches the single-device result."""

import jax
import jax.numpy as jnp
import numpy as np

from moco_flow_tpu.data.synthetic import make_synthetic_scene
from moco_flow_tpu.parallel.mesh import make_mesh
from moco_flow_tpu.train import get_trainer
from moco_flow_tpu.utils.config import Config
from tests.test_stages import moco_config


def test_sharded_render_matches_single(tmp_path):
    root = str(tmp_path / "scene")
    smpl = make_synthetic_scene(root, n_frames=2, size=40, focal=50.0)
    raw = moco_config(root, str(tmp_path))
    t1 = get_trainer(Config(raw, mode="train", job_name="a"),
                     smpl_data=smpl, mesh=make_mesh(1))
    t8 = get_trainer(Config(dict(raw), mode="train", job_name="b"),
                     smpl_data=smpl, mesh=make_mesh(8))
    t8.params = t1.params  # identical weights

    ds = t1.val_dataset
    rays, _ = ds.frame_rays(0)
    bg = jnp.ones((rays.shape[0], 3))
    # chunk chosen so the tile count (7) is NOT divisible by 8 -> padding path
    r1 = t1.render_rays_chunked(rays, bg, t1.rcfg_test,
                                anneal=t1.anneal(), chunk=256)
    r8 = t8.render_rays_chunked(rays, bg, t8.rcfg_test,
                                anneal=t8.anneal(), chunk=256)
    for k in r1:
        np.testing.assert_allclose(np.asarray(r8[k]), np.asarray(r1[k]),
                                   rtol=1e-4, atol=1e-5), k
    typ = "rgb_fine" if "rgb_fine" in r1 else "rgb_coarse"
    assert r1[typ].shape == (rays.shape[0], 3)
