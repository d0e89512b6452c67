"""Occupancy-grid empty-space skipping (render/occupancy.py).

Geometric conservativeness of the bound tightening, plus end-to-end
plumbing: with every cell occupied the tightened rays are bit-identical to
the originals (so the render is exactly the reference render), and with an
empty grid the bounds are left untouched."""

import numpy as np
import pytest

from moco_flow_tpu.render.occupancy import (OccupancyGrid,
                                            tighten_ray_bounds)


def _camera_rays(h, w, focal, origin_z=3.0, near=1.0, far=5.0):
    """Simple pinhole bundle looking down -z from (0,0,origin_z)."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    dirs = np.stack([(xs - w / 2) / focal, (ys - h / 2) / focal,
                     -np.ones_like(xs)], axis=-1).reshape(-1, 3)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    o = np.tile([0.0, 0.0, origin_z], (h * w, 1)).astype(np.float32)
    rays = np.concatenate(
        [o, dirs, np.full((h * w, 1), near, np.float32),
         np.full((h * w, 1), far, np.float32),
         np.zeros((h * w, 1), np.float32)], axis=-1)
    return rays


def _grid_with_cells(res, extent, cells):
    occ = np.zeros((res, res, res), bool)
    for c in cells:
        occ[c] = True
    return OccupancyGrid(occ=occ, extent=extent, threshold=5.0)


def test_brackets_single_occupied_cell():
    res, extent = 16, 1.5
    grid = _grid_with_cells(res, extent, [(8, 8, 8)])  # cell around origin
    h = w = 24
    rays = _camera_rays(h, w, focal=40.0)
    out, stats = tighten_ray_bounds(grid, rays, (h, w))
    # the central ray passes straight through the occupied cell at t ~= 3
    center = (h // 2) * w + w // 2
    assert out[center, 6] > rays[center, 6]  # tightened from 1.0
    assert out[center, 7] < rays[center, 7]  # tightened from 5.0
    assert out[center, 6] < 3.0 < out[center, 7]
    # corner rays miss the cell entirely: original bounds kept
    assert out[0, 6] == rays[0, 6] and out[0, 7] == rays[0, 7]
    assert stats["range_ratio"] < 1.0


def test_conservative_for_every_ray():
    """Brute-force check: every occupied t of every full-res ray lies inside
    its tightened [near, far]."""
    rng = np.random.default_rng(0)
    res, extent = 12, 1.5
    cells = [tuple(rng.integers(2, res - 2, 3)) for _ in range(6)]
    grid = _grid_with_cells(res, extent, cells)
    h = w = 20
    rays = _camera_rays(h, w, focal=30.0)
    out, _ = tighten_ray_bounds(grid, rays, (h, w))

    from moco_flow_tpu.render.occupancy import _lookup
    t_dense = np.linspace(1.0, 5.0, 600, dtype=np.float32)
    for i in range(0, h * w, 7):
        pts = rays[i, 0:3] + rays[i, 3:6] * t_dense[:, None]
        hit = _lookup(grid, pts)
        if not hit.any():
            continue
        lo, hi = t_dense[hit].min(), t_dense[hit].max()
        assert out[i, 6] <= lo + 1e-5, i
        assert out[i, 7] >= hi - 1e-5, i


def test_all_occupied_is_bit_exact_noop():
    grid = OccupancyGrid(occ=np.ones((8, 8, 8), bool), extent=1.5,
                         threshold=-1.0)
    rays = _camera_rays(16, 16, focal=20.0)
    out, stats = tighten_ray_bounds(grid, rays, (16, 16))
    np.testing.assert_array_equal(out, rays)
    assert stats["range_ratio"] == pytest.approx(1.0)


def test_subthreshold_fog_is_not_empty():
    """The tau bound: density below any bool threshold but with a large
    integral along the ray must NOT be skipped (the old threshold-hit
    criterion marked such rays 'provably empty' at max pixel error 1.0)."""
    res, extent = 16, 1.5
    sig = np.full((res, res, res), 4.0, np.float32)  # below threshold 5
    grid = OccupancyGrid(occ=sig > 5.0, extent=extent, threshold=5.0,
                         sig=sig)
    rays = _camera_rays(16, 16, focal=20.0)
    out, stats = tighten_ray_bounds(grid, rays, (16, 16))
    assert stats["empty_frac"] == 0.0          # tau = 4 * span >> eps
    # fog everywhere inside the cube: only zero-density OUTSIDE-the-cube
    # segments may be tightened away — the excluded leading/trailing mass
    # stays within the tau budget (exact bounds are probe-count dependent)
    from moco_flow_tpu.render.occupancy import _lookup_sig
    t_dense = np.linspace(1.0, 5.0, 2000, dtype=np.float32)
    ddt = t_dense[1] - t_dense[0]
    for i in range(0, 256, 17):
        pts = rays[i, 0:3] + rays[i, 3:6] * t_dense[:, None]
        s = _lookup_sig(grid, pts)
        assert float(np.sum(s[t_dense < out[i, 6]]) * ddt) <= 5e-4 + 1e-6
        assert float(np.sum(s[t_dense > out[i, 7]]) * ddt) <= 5e-4 + 1e-6
    # genuinely negligible fog IS empty: tau = 1e-6 * ~4 << 1e-3
    sig2 = np.full((res, res, res), 1e-6, np.float32)
    grid2 = OccupancyGrid(occ=sig2 > 5.0, extent=extent, threshold=5.0,
                          sig=sig2)
    out2, stats2 = tighten_ray_bounds(grid2, rays, (16, 16))
    assert stats2["empty_frac"] == 1.0
    np.testing.assert_array_equal(out2, rays)


def test_tail_mass_bounds_tightening():
    """Tightened-away leading/trailing segments each hold <= tau_eps/2 of
    optical depth."""
    res, extent = 32, 1.5
    rng = np.random.default_rng(3)
    sig = (rng.uniform(size=(res, res, res)) < 0.02).astype(np.float32) * 50
    grid = OccupancyGrid(occ=sig > 5.0, extent=extent, threshold=5.0,
                         sig=sig)
    h = w = 20
    rays = _camera_rays(h, w, focal=30.0)
    tau = 1e-3
    out, _ = tighten_ray_bounds(grid, rays, (h, w), tau_eps=tau)
    from moco_flow_tpu.render.occupancy import _lookup_sig
    t_dense = np.linspace(1.0, 5.0, 2000, dtype=np.float32)
    dt = t_dense[1] - t_dense[0]
    for i in range(0, h * w, 13):
        pts = rays[i, 0:3] + rays[i, 3:6] * t_dense[:, None]
        s = _lookup_sig(grid, pts)
        lead = float(np.sum(s[t_dense < out[i, 6]]) * dt)
        trail = float(np.sum(s[t_dense > out[i, 7]]) * dt)
        # dense Riemann sum vs the probe upper bound: allow quadrature slack
        assert lead <= 0.5 * tau + 1e-6, i
        assert trail <= 0.5 * tau + 1e-6, i


def test_empty_grid_keeps_bounds():
    grid = OccupancyGrid(occ=np.zeros((8, 8, 8), bool), extent=1.5,
                         threshold=5.0)
    rays = _camera_rays(16, 16, focal=20.0)
    out, stats = tighten_ray_bounds(grid, rays, (16, 16))
    np.testing.assert_array_equal(out, rays)
    assert stats["empty_frac"] == 1.0


def test_jax_tightener_matches_host_path():
    """The on-device tightener (tighten_ray_bounds_jax) is a transcription
    of the numpy math: same probe plan, same bounds, same empty mask and
    stats, across the bound-relevant grid regimes (sparse density, hard-inf
    cells, fog, all-empty, measured outer density, finite measured shell)."""
    from moco_flow_tpu.render.occupancy import tighten_ray_bounds_jax

    rng = np.random.default_rng(7)
    res, extent = 16, 1.5
    h = w = 20
    rays = _camera_rays(h, w, focal=30.0)

    sparse = (rng.uniform(size=(res, res, res)) < 0.03).astype(np.float32) * 60
    hard = np.zeros((res, res, res), np.float32)
    hard[7:9, 7:9, 7:9] = np.inf
    fog = np.full((res, res, res), 4.0, np.float32)
    grids = [
        OccupancyGrid(occ=sparse > 5, extent=extent, threshold=5.0,
                      sig=sparse),
        OccupancyGrid(occ=hard > 5, extent=extent, threshold=5.0, sig=hard),
        OccupancyGrid(occ=fog > 5, extent=extent, threshold=5.0, sig=fog),
        OccupancyGrid(occ=np.zeros((res,) * 3, bool), extent=extent,
                      threshold=5.0),
        OccupancyGrid(occ=np.zeros((res,) * 3, bool), extent=extent,
                      threshold=5.0, outer_sig=10.0),
        OccupancyGrid(occ=sparse > 5, extent=extent, threshold=5.0,
                      sig=sparse, outer_sig=0.0, outer_extent=2.0),
    ]
    for gi, grid in enumerate(grids):
        ref, ref_stats = tighten_ray_bounds(grid, rays, (h, w))
        out, stats = tighten_ray_bounds_jax(grid, rays, (h, w))
        out = np.asarray(out)
        assert stats["coarse"] == ref_stats["coarse"], gi
        assert stats["n_probe"] == ref_stats["n_probe"], gi
        np.testing.assert_array_equal(
            np.asarray(stats["empty_mask"]), ref_stats["empty_mask"],
            err_msg=f"grid {gi}")
        np.testing.assert_allclose(out[:, 6], ref[:, 6], atol=2e-5,
                                   err_msg=f"grid {gi} near")
        np.testing.assert_allclose(out[:, 7], ref[:, 7], atol=2e-5,
                                   err_msg=f"grid {gi} far")
        np.testing.assert_array_equal(out[:, :6], ref[:, :6])
        np.testing.assert_allclose(float(stats["empty_frac"]),
                                   ref_stats["empty_frac"], atol=1e-6)
        np.testing.assert_allclose(float(stats["range_ratio"]),
                                   ref_stats["range_ratio"], rtol=1e-5)


def test_trainer_plumbing_and_grid_build(tmp_path):
    """Full path through a real trainer: grid build from the live sigma
    field, caching, train-step invalidation, and the exact-render guarantee
    with threshold -inf (everything occupied)."""
    import jax.numpy as jnp
    from __graft_entry__ import _tiny_moco_config
    from moco_flow_tpu.data.synthetic import make_synthetic_scene
    from moco_flow_tpu.train import get_trainer
    from moco_flow_tpu.utils.config import Config

    root = str(tmp_path / "scene")
    smpl = make_synthetic_scene(root, n_frames=2, size=24, focal=30.0)
    cfg = _tiny_moco_config(root, str(tmp_path / "log"))
    cfg["dataloader"]["size"] = [24, 24]
    cfg["dataloader"]["val_size"] = [24, 24]
    cfg["model"].update({"N_rand": 16, "N_samples": 8, "N_importance": 8,
                         "occ_res": 8, "occ_supersample": 1,
                         "occ_threshold": -1e9})
    trainer = get_trainer(Config(cfg, mode="train"), smpl_data=smpl)

    ds = trainer.val_dataset
    rays, _ = ds.frame_rays(0)
    tight = trainer.tighten_rays(rays, 0, size=ds.size)
    # threshold -inf -> all cells occupied -> bounds unchanged -> renders
    # are the exact render by construction
    np.testing.assert_array_equal(np.asarray(tight), np.asarray(rays))
    grid = trainer.occupancy_grid(0)
    assert grid.occupancy_fraction == 1.0
    assert 0 in trainer._occ_grids

    # a real threshold on the untrained field: grid builds and bounds stay
    # within the originals (conservative clipping)
    trainer._occ_grids.clear()
    trainer.config.raw["model"]["occ_threshold"] = 5.0
    tight2 = np.asarray(trainer.tighten_rays(rays, 0, size=ds.size))
    assert (tight2[:, 6] >= np.asarray(rays)[:, 6] - 1e-6).all()
    assert (tight2[:, 7] <= np.asarray(rays)[:, 7] + 1e-6).all()

    # cache invalidation on a train step
    trainer.train_func()
    assert not trainer._occ_grids

    # every-ray-provably-empty frame (the empty_frac == 1.0 outcome):
    # render_masked_image must composite pure background, not crash on the
    # 0-ray render (render_rays_chunked n == 0 path)
    bg = jnp.ones((rays.shape[0], 3)) * 0.5
    res = trainer.render_masked_image(
        jnp.asarray(rays), np.zeros((rays.shape[0],), bool), bg,
        trainer.rcfg_test, anneal=trainer.anneal())
    typ = "fine" if "rgb_fine" in res else "coarse"
    np.testing.assert_allclose(np.asarray(res[f"rgb_{typ}"]),
                               np.asarray(bg), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(res[f"depth_{typ}"]),
                                  np.full((rays.shape[0],), 10.0))


def test_device_grid_build_matches_host(tmp_path):
    """The on-device grid builder (in-graph lattice + pool/activate/dilate,
    fetches only the pooled grid + one outer scalar — the 26.6 s/frame ->
    transfer-free fix, PERF.md round 4) must reproduce the host reference
    pipeline exactly: same sig lattice, same occupancy, same measured outer
    bound — on both the NoF-warped (frame 0) and canonical (-1) grids."""
    from __graft_entry__ import _tiny_moco_config
    from moco_flow_tpu.data.synthetic import make_synthetic_scene
    from moco_flow_tpu.render.occupancy import build_occupancy_grid
    from moco_flow_tpu.train import get_trainer
    from moco_flow_tpu.utils.config import Config

    root = str(tmp_path / "scene")
    smpl = make_synthetic_scene(root, n_frames=2, size=24, focal=30.0)
    cfg = _tiny_moco_config(root, str(tmp_path / "log"))
    cfg["dataloader"]["size"] = [24, 24]
    cfg["dataloader"]["val_size"] = [24, 24]
    cfg["model"].update({"N_rand": 16, "N_samples": 8, "N_importance": 8})
    trainer = get_trainer(Config(cfg, mode="train"), smpl_data=smpl)

    for frame in (0, -1):  # warped and canonical
        gd = build_occupancy_grid(trainer, frame, resolution=8,
                                  supersample=2, threshold=0.05,
                                  extent=1.5, device=True)
        gh = build_occupancy_grid(trainer, frame, resolution=8,
                                  supersample=2, threshold=0.05,
                                  extent=1.5, device=False)
        np.testing.assert_allclose(gd.sig, gh.sig, rtol=1e-4, atol=1e-4,
                                   err_msg=f"sig mismatch, frame {frame}")
        # occupancy may only differ where sig sits exactly on the threshold
        differ = gd.occ != gh.occ
        assert (np.abs(gh.sig[differ] - 0.05) < 1e-4).all()
        assert gd.outer_extent == gh.outer_extent
        np.testing.assert_allclose(gd.outer_sig, gh.outer_sig,
                                   rtol=1e-4, atol=1e-4)


def test_outside_cube_density_blocks_skipping():
    """A field with density OUTSIDE the grid cube (grid.outer_sig > 0) must
    not declare rays empty or tighten bounds into the outer region — the
    outer bound is measured, never assumed zero."""
    res, extent = 12, 1.5
    occ = np.zeros((res, res, res), bool)     # inner cube: fully empty
    assume_zero = OccupancyGrid(occ=occ, extent=extent, threshold=5.0)
    outer = OccupancyGrid(occ=occ, extent=extent, threshold=5.0,
                          outer_sig=10.0)
    h = w = 8
    rays = _camera_rays(h, w, focal=20.0, origin_z=3.0, near=1.0, far=5.0)
    # sanity: with the field == grid (outer 0), every ray is provably empty
    _, st0 = tighten_ray_bounds(assume_zero, rays, (h, w))
    assert st0["empty_frac"] == 1.0
    # with measured outer density, nothing is provably empty and the
    # outside-the-cube segments ([near, cube] and [cube, far]) survive
    out, st = tighten_ray_bounds(outer, rays, (h, w))
    assert st["empty_frac"] == 0.0
    np.testing.assert_array_equal(out[:, 6], rays[:, 6])
    np.testing.assert_array_equal(out[:, 7], rays[:, 7])


def test_beyond_measured_shell_is_unknown():
    """Probes beyond the MEASURED outer shell read +inf: even outer_sig=0
    cannot certify emptiness where nothing was measured. Rays run from
    z=3 to z=-5 through a shell measured only to |x| <= 2: both the
    leading (t < ~1) and trailing (t > ~5) segments are unmeasured, so no
    ray is provably empty and far never tightens into the unknown tail."""
    res, extent = 12, 1.5
    occ = np.zeros((res, res, res), bool)
    grid = OccupancyGrid(occ=occ, extent=extent, threshold=5.0,
                         outer_sig=0.0, outer_extent=2.0)
    h = w = 8
    rays = _camera_rays(h, w, focal=20.0, origin_z=3.0, near=1.0, far=8.0)
    out, st = tighten_ray_bounds(grid, rays, (h, w))
    assert st["empty_frac"] == 0.0
    np.testing.assert_array_equal(out[:, 7], rays[:, 7])
    # sanity: with the shell declared measured-everywhere (outer_extent
    # inf), the same all-zero field IS provably empty
    grid2 = OccupancyGrid(occ=occ, extent=extent, threshold=5.0,
                          outer_sig=0.0)
    _, st2 = tighten_ray_bounds(grid2, rays, (h, w))
    assert st2["empty_frac"] == 1.0


def test_pipelined_render_matches_sequential(tmp_path):
    """render_views_pipelined (the double-buffered driver train/vis.py and
    the bench use) must produce the same images as committing each view
    one-shot, across frames, skip on/off, and an extra hull mask."""
    import jax.numpy as jnp
    from __graft_entry__ import _tiny_moco_config
    from moco_flow_tpu.data.synthetic import make_synthetic_scene
    from moco_flow_tpu.train import get_trainer
    from moco_flow_tpu.utils.config import Config

    root = str(tmp_path / "scene")
    smpl = make_synthetic_scene(root, n_frames=2, size=24, focal=30.0)
    cfg = _tiny_moco_config(root, str(tmp_path / "log"))
    cfg["dataloader"]["size"] = [24, 24]
    cfg["dataloader"]["val_size"] = [24, 24]
    cfg["model"].update({"N_rand": 16, "N_samples": 8, "N_importance": 8,
                         "occ_res": 8, "occ_supersample": 1,
                         "occ_threshold": 5.0})
    trainer = get_trainer(Config(cfg, mode="train"), smpl_data=smpl)
    ds = trainer.val_dataset
    rcfg = trainer.rcfg_test
    anneal = trainer.anneal()

    hull = np.zeros((24 * 24,), bool)
    hull[::2] = True  # an extra caller mask, like the dataset's AABB hull
    jobs = []
    for frame in (0, 1, 0):
        rays, _ = ds.frame_rays(frame)
        bg = jnp.ones((rays.shape[0], 3)) * (0.2 + 0.3 * frame)
        jobs.append((rays, frame, bg, hull if frame == 1 else None))

    for skip in (True, False):
        seq = [trainer.commit_view(
                   trainer.prepare_view(r, f, extra_mask=m, skip=skip),
                   bg, rcfg, anneal=anneal)
               for (r, f, bg, m) in jobs]
        pip = list(trainer.render_views_pipelined(iter(jobs), rcfg,
                                                  anneal=anneal, skip=skip))
        assert len(pip) == len(seq)
        for a, b in zip(seq, pip):
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_array_equal(np.asarray(a[k]),
                                              np.asarray(b[k]),
                                              err_msg=f"skip={skip} {k}")


def test_masked_render_fused_matches_loop(tmp_path):
    """The single-dispatch fused masked render (in-graph nonzero compaction
    + lax.map tiles + scatter composite, train/base.py::
    _masked_render_fused_fn) must reproduce the host bucket-loop path
    exactly: per-ray math is row-independent, so different batch paddings
    cannot change kept rays."""
    import jax.numpy as jnp
    from __graft_entry__ import _tiny_moco_config
    from moco_flow_tpu.data.synthetic import make_synthetic_scene
    from moco_flow_tpu.train import get_trainer
    from moco_flow_tpu.utils.config import Config

    root = str(tmp_path / "scene")
    smpl = make_synthetic_scene(root, n_frames=2, size=24, focal=30.0)
    cfg = _tiny_moco_config(root, str(tmp_path / "log"))
    cfg["dataloader"]["size"] = [24, 24]
    cfg["dataloader"]["val_size"] = [24, 24]
    cfg["model"].update({"N_rand": 16, "N_samples": 8, "N_importance": 8,
                         "occ_res": 8, "occ_supersample": 1,
                         "occ_threshold": 5.0})
    from moco_flow_tpu.parallel.mesh import make_mesh
    trainer = get_trainer(Config(cfg, mode="train"), smpl_data=smpl,
                          mesh=make_mesh(1))  # fused path is single-chip
    ds = trainer.val_dataset
    rcfg = trainer.rcfg_test
    anneal = trainer.anneal()
    rays, _ = ds.frame_rays(0)
    rays_t = trainer.tighten_rays(rays, 0, size=ds.size)
    bg = jnp.ones((rays.shape[0], 3)) * 0.3

    rng = np.random.default_rng(7)
    occ_keep = np.asarray(trainer.occ_keep_mask())
    masks = [occ_keep, rng.random(rays.shape[0]) < 0.3]
    for mask in masks:
        if mask.sum() == 0:
            continue
        trainer.config.raw["model"]["masked_render"] = "loop"
        a = trainer.render_masked_image(rays_t, mask, bg, rcfg,
                                        anneal=anneal)
        trainer.config.raw["model"]["masked_render"] = "fused"
        b = trainer.render_masked_image(rays_t, jnp.asarray(mask), bg, rcfg,
                                        anneal=anneal,
                                        count=int(mask.sum()))
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]), err_msg=k)


def test_chunked_render_map_matches_loop(tmp_path):
    """Single-chip full-frame renders with n an exact chunk multiple route
    through the one-dispatch lax.map program (the multi-chip body); its
    per-ray outputs must match the per-tile host loop."""
    import jax.numpy as jnp
    from __graft_entry__ import _tiny_moco_config
    from moco_flow_tpu.data.synthetic import make_synthetic_scene
    from moco_flow_tpu.train import get_trainer
    from moco_flow_tpu.utils.config import Config

    root = str(tmp_path / "scene")
    smpl = make_synthetic_scene(root, n_frames=2, size=24, focal=30.0)
    cfg = _tiny_moco_config(root, str(tmp_path / "log"))
    cfg["dataloader"]["size"] = [24, 24]
    cfg["dataloader"]["val_size"] = [24, 24]
    cfg["model"].update({"N_rand": 16, "N_samples": 8, "N_importance": 8})
    from moco_flow_tpu.parallel.mesh import make_mesh
    trainer = get_trainer(Config(cfg, mode="train"), smpl_data=smpl,
                          mesh=make_mesh(1))  # map routing is single-chip
    ds = trainer.val_dataset
    rcfg = trainer.rcfg_test
    anneal = trainer.anneal()
    rays, _ = ds.frame_rays(0)          # 576 rays
    bg = jnp.ones((rays.shape[0], 3)) * 0.3
    a = trainer.render_rays_chunked(jnp.asarray(rays), bg, rcfg,
                                    anneal=anneal, chunk=144)  # map: 4 tiles
    b = trainer.render_rays_chunked(jnp.asarray(rays), bg, rcfg,
                                    anneal=anneal, chunk=576)  # loop: 1 tile
    for k in a:
        va = np.asarray(a[k])
        if va.ndim >= 1:                 # per-ray outputs only — the
            # per-chunk consensus scalars legitimately regroup
            np.testing.assert_allclose(va, np.asarray(b[k]), atol=1e-6,
                                       err_msg=k)


def test_skip_without_tighten_keeps_exact_sampling(tmp_path):
    """occ_tighten: 0 — ray bounds stay bit-exact, the empty mask is the
    same as with tightening, and every KEPT ray renders bit-identically to
    the plain exact render (the whole image is then tau-bounded on the
    skipped rays alone; measured 78.4 dB vs exact on the TPU bench field,
    PERF.md round 4)."""
    import jax.numpy as jnp
    from __graft_entry__ import _tiny_moco_config
    from moco_flow_tpu.data.synthetic import make_synthetic_scene
    from moco_flow_tpu.parallel.mesh import make_mesh
    from moco_flow_tpu.train import get_trainer
    from moco_flow_tpu.utils.config import Config

    root = str(tmp_path / "scene")
    smpl = make_synthetic_scene(root, n_frames=2, size=24, focal=30.0)
    cfg = _tiny_moco_config(root, str(tmp_path / "log"))
    cfg["dataloader"]["size"] = [24, 24]
    cfg["dataloader"]["val_size"] = [24, 24]
    cfg["model"].update({"N_rand": 16, "N_samples": 8, "N_importance": 8,
                         "occ_res": 8, "occ_supersample": 1,
                         "occ_threshold": 5.0, "occ_tighten": 0})
    trainer = get_trainer(Config(cfg, mode="train"), smpl_data=smpl,
                          mesh=make_mesh(1))
    ds = trainer.val_dataset
    rcfg = trainer.rcfg_test
    anneal = trainer.anneal()
    rays, _ = ds.frame_rays(0)
    bg = jnp.ones((rays.shape[0], 3)) * 0.4

    rays_t = np.asarray(trainer.tighten_rays(rays, 0, size=ds.size))
    np.testing.assert_array_equal(rays_t, np.asarray(rays, np.float32))
    keep_notight = np.asarray(trainer.occ_keep_mask())
    trainer.config.raw["model"]["occ_tighten"] = 1
    trainer.tighten_rays(rays, 0, size=ds.size)
    np.testing.assert_array_equal(np.asarray(trainer.occ_keep_mask()),
                                  keep_notight)
    trainer.config.raw["model"]["occ_tighten"] = 0

    exact = trainer.render_rays_chunked(jnp.asarray(rays, jnp.float32), bg,
                                        rcfg, anneal=anneal)
    out = trainer.commit_view(trainer.prepare_view(rays, 0), bg, rcfg,
                              anneal=anneal)
    typ = "fine" if "rgb_fine" in out else "coarse"
    k = keep_notight
    np.testing.assert_array_equal(
        np.asarray(out[f"rgb_{typ}"])[k], np.asarray(exact[f"rgb_{typ}"])[k])
    # foreground kept rays carry the exact depth too (empty kept rays
    # composite to the 8.0 inside-mask sentinel, ref semantics)
    fg = np.asarray(out[f"opacity_{typ}"]) > 0
    np.testing.assert_array_equal(
        np.asarray(out[f"depth_{typ}"])[k & fg],
        np.asarray(exact[f"depth_{typ}"])[k & fg])


def test_occupancy_requires_relu(tmp_path):
    """Under softplus the renderer's infinite catch-all delta saturates
    every ray to opacity 1 (sigma > 0 everywhere), so no ray is provably
    empty and the tau bound cannot hold — occupancy_grid must refuse
    loudly (PARITY.md 'softplus saturates every ray')."""
    import pytest
    from __graft_entry__ import _tiny_moco_config
    from moco_flow_tpu.data.synthetic import make_synthetic_scene
    from moco_flow_tpu.train import get_trainer
    from moco_flow_tpu.utils.config import Config

    root = str(tmp_path / "scene")
    smpl = make_synthetic_scene(root, n_frames=2, size=24, focal=30.0)
    cfg = _tiny_moco_config(root, str(tmp_path / "log"))
    cfg["dataloader"]["size"] = [24, 24]
    cfg["dataloader"]["val_size"] = [24, 24]
    cfg["model"].update({"N_rand": 16, "N_samples": 8, "N_importance": 8,
                         "occ_res": 8, "occ_supersample": 1,
                         "nerf_activate_type": "softplus"})
    trainer = get_trainer(Config(cfg, mode="train"), smpl_data=smpl)
    with pytest.raises(ValueError, match="relu"):
        trainer.occupancy_grid(0)


def _packed_trainer(tmp_path, n_frames=3):
    from __graft_entry__ import _tiny_moco_config
    from moco_flow_tpu.data.synthetic import make_synthetic_scene
    from moco_flow_tpu.parallel.mesh import make_mesh
    from moco_flow_tpu.train import get_trainer
    from moco_flow_tpu.utils.config import Config

    root = str(tmp_path / "scene")
    smpl = make_synthetic_scene(root, n_frames=n_frames, size=24, focal=30.0)
    cfg = _tiny_moco_config(root, str(tmp_path / "log"))
    cfg["dataloader"]["size"] = [24, 24]
    cfg["dataloader"]["val_size"] = [24, 24]
    cfg["model"].update({"N_rand": 16, "N_samples": 8, "N_importance": 8,
                         "occ_res": 8, "occ_supersample": 1,
                         "occ_threshold": 5.0})
    return get_trainer(Config(cfg, mode="train"), smpl_data=smpl,
                       mesh=make_mesh(1))  # packed path is single-chip


def test_packed_stream_matches_per_view(tmp_path):
    """The cross-view packed streamer (render/packed.py, the single-chip
    render_views_pipelined path) must reproduce the per-view fused masked
    render bit-exactly: per-ray math is row-independent, so packing rays
    from different views into shared segments cannot change any kept ray,
    and the composite semantics (background / depth 10 / 8 / opacity 0)
    are identical."""
    import jax.numpy as jnp

    trainer = _packed_trainer(tmp_path)
    ds = trainer.val_dataset
    rcfg = trainer.rcfg_test
    anneal = trainer.anneal()

    hull = np.zeros((24 * 24,), bool)
    hull[::3] = True
    jobs = []
    for i, frame in enumerate((0, 1, 2, 0, 1)):
        rays, _ = ds.frame_rays(frame)
        bg = jnp.ones((rays.shape[0], 3)) * (0.15 + 0.1 * i)
        jobs.append((rays, frame, bg, hull if i == 2 else None))

    seq = [trainer.commit_view(
               trainer.prepare_view(r, f, extra_mask=m, skip=True),
               bg, rcfg, anneal=anneal)
           for (r, f, bg, m) in jobs]
    pip = list(trainer.render_views_pipelined(iter(jobs), rcfg,
                                              anneal=anneal, skip=True))
    assert len(pip) == len(seq)
    for a, b in zip(seq, pip):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]), err_msg=k)


def test_packed_stream_small_segments(tmp_path):
    """Drive PackedStream directly with a tiny segment and window so every
    internal path runs: multiple drains per view, views spanning segment
    boundaries, the window force-flush (slot reuse while in flight),
    zero-kept-count views, and the final flush. Each completed view must
    equal its per-view fused render, and views must complete in order."""
    import jax.numpy as jnp
    from moco_flow_tpu.render.packed import PackedStream

    trainer = _packed_trainer(tmp_path)
    ds = trainer.val_dataset
    rcfg = trainer.rcfg_test
    anneal = trainer.anneal()

    views = []
    none_mask = np.zeros((24 * 24,), bool)  # a zero-kept-count view
    for i, (frame, extra) in enumerate(
            [(0, None), (1, None), (2, none_mask), (0, None), (1, None),
             (2, None), (0, None)]):
        rays, _ = ds.frame_rays(frame)
        bg = jnp.ones((rays.shape[0], 3)) * (0.1 + 0.1 * i)
        handle = trainer.prepare_view(rays, frame, extra_mask=extra,
                                      skip=True)
        views.append((handle, bg))

    # reference: per-view fused commits
    seq = [trainer.commit_view(h, bg, rcfg, anneal=anneal)
           for h, bg in views]

    stream = PackedStream(trainer, rcfg, anneal,
                          n_rays=24 * 24, ray_cols=views[0][0][0].shape[1],
                          seg=128, window=2)
    got = []
    for h, bg in views:
        rays_t, keep, _extra, count = h
        got += stream.add_view(rays_t, keep, int(count), bg)
    got += stream.flush()
    assert len(got) == len(seq)
    for i, (a, b) in enumerate(zip(seq, got)):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]),
                                          err_msg=f"view {i} {k}")


def test_warp_pullback_grid(tmp_path):
    """The warp-pullback builder (``occ_builder: warp``,
    train/vis.py::_warp_grid_builders): per-frame occupancy = the canonical
    grid's bound gathered at bw-warped lattice points. Checks (1) the
    device program against a numpy oracle of the specified math, and (2)
    conservativeness vs the direct build on the same field — every cell
    the direct build marks occupied must be occupied in the pullback grid
    (the canonical bound + dilation dominates point evaluations up to the
    shared lattice-empirical gap)."""
    import jax.numpy as jnp
    from moco_flow_tpu.render.occupancy import build_occupancy_grid
    from moco_flow_tpu.render.volume import RenderConfig
    from moco_flow_tpu.train.stage_nof import nof_points

    trainer = _packed_trainer(tmp_path, n_frames=2)
    res, ss, ext = 8, 2, 1.5
    cano = build_occupancy_grid(trainer, -1, resolution=res, supersample=ss,
                                threshold=0.05, extent=ext, device=True)
    warp = build_occupancy_grid(trainer, 0, resolution=res, supersample=ss,
                                threshold=0.05, extent=ext, builder="warp",
                                cano_grid=cano)
    direct = build_occupancy_grid(trainer, 0, resolution=res, supersample=ss,
                                  threshold=0.05, extent=ext, device=True)

    # (1) numpy oracle of the pullback spec: supersample 1, dilation
    # dilate+1 = 2 (build_occupancy_grid's warp branch — the gather
    # dominates per-point cost, so the pullback trades the supersampled
    # max-pool for one extra dilation cell)
    n = res
    step = 2.0 * ext / (n - 1)
    f = np.arange(n ** 3)
    ijk = np.stack([f // (n * n), (f // n) % n, f % n], axis=-1)
    pts = ijk.astype(np.float32) * step - ext
    norm_idx = jnp.asarray(0 * 2.0 / trainer.num_frames - 1.0)
    y = np.asarray(nof_points(trainer.params["bw_NoF"], trainer.statics,
                              trainer.anneal(), jnp.asarray(pts), norm_idx,
                              RenderConfig(use_nof=True)))
    c_sig = np.asarray(cano.sig)
    cell = 2.0 * ext / res
    ids = np.floor((y + ext) / cell).astype(np.int64)
    inb = ((ids >= 0) & (ids < res)).all(-1)
    ids = np.clip(ids, 0, res - 1)
    vals = c_sig[ids[:, 0], ids[:, 1], ids[:, 2]]
    in_shell = (np.abs(y) <= cano.outer_extent).all(-1)
    vals = np.where(inb, vals,
                    np.where(in_shell, cano.outer_sig, np.inf))
    sig = vals.reshape(res, res, res)
    for _ in range(2):
        pad = np.pad(sig, 1, constant_values=-np.inf)
        sig = np.max(np.stack([pad[i:i + res, j:j + res, k:k + res]
                               for i in range(3) for j in range(3)
                               for k in range(3)]), axis=0)
    dil = sig
    got = np.asarray(warp.sig)
    both_inf = np.isinf(dil) & np.isinf(got)
    np.testing.assert_allclose(np.where(both_inf, 0.0, got),
                               np.where(both_inf, 0.0, dil),
                               rtol=1e-4, atol=1e-4)

    # (2) conservativeness: direct-occupied => warp-occupied
    assert not (direct.occ & ~warp.occ).any()


def test_scaled_frame_view_through_pipeline(tmp_path):
    """frame_rays_scaled views (production frame sizes from the same
    camera) must flow through the occupancy tighten + packed render path:
    tighten_rays infers the scaled (h, w) from the ray count (the round-5
    bench video axis crashed on the val-size assumption)."""
    import jax.numpy as jnp

    trainer = _packed_trainer(tmp_path)
    ds = trainer.val_dataset
    rays, _ = ds.frame_rays_scaled(0, 2)
    assert rays.shape[0] == 4 * 24 * 24
    jobs = [(rays, 0, jnp.ones((rays.shape[0], 3)))]
    outs = list(trainer.render_views_pipelined(
        iter(jobs), trainer.rcfg_test, anneal=trainer.anneal(), skip=True))
    typ = "rgb_fine" if "rgb_fine" in outs[0] else "rgb_coarse"
    assert outs[0][typ].shape == (4 * 24 * 24, 3)
    assert np.isfinite(np.asarray(outs[0][typ])).all()
    # ambiguous ray counts must raise, not mis-reshape
    import pytest
    with pytest.raises(ValueError, match="cannot infer"):
        trainer._infer_view_size(24 * 24 + 7)
