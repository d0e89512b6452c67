"""Short CI version of the cross-implementation TRAINING parity harness
(scripts/parity_train_e2e.py): train the ACTUAL PyTorch stage-1 reference
trainer and the rebuild for 40 steps from identical init weights on one
synthetic scene and assert the systems track each other.

The full 300/200-step runs with the stage-3 trainer and fixed-point NoF
evaluation are recorded in PARITY.md.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

if not hasattr(np, "float"):
    np.float = float  # numpy>=1.24 alias the reference still uses


def test_stage1_training_parity(tmp_path):
    import scripts.parity_train_e2e as P
    from moco_flow_tpu.data.synthetic import make_synthetic_scene
    from scripts.drive_pipeline_e2e import write_scene_smpl_pickle
    from scripts.ref_driver import import_reference

    base = str(tmp_path)
    root = os.path.join(base, "scene")
    smpl = make_synthetic_scene(root, n_frames=P.N_FRAMES, size=P.SIZE,
                                focal=P.FOCAL)
    write_scene_smpl_pickle(smpl, os.path.join(base, "smpl", "data"))
    ns = import_reference(os.path.join(base, "smpl"))

    steps, n_rand = 40, 128
    ref_cfg = P.stage_cfg(1, root, os.path.join(base, "ref"), steps, n_rand,
                          ref_side=True)
    ref_trainer = P.build_reference(ns, ref_cfg)
    init = P.transfer_stage1(ns, ref_trainer)
    ref_losses = P.train_reference(ref_trainer, steps)

    jax_cfg = P.stage_cfg(1, root, os.path.join(base, "jax"), steps, n_rand,
                          ref_side=False)
    jax_trainer, jax_losses = P.run_rebuild(jax_cfg, smpl, init, steps)

    ref_tail = P.smoothed(ref_losses, "img_loss")
    jax_tail = P.smoothed(jax_losses, "img_loss")
    # independent RNG streams: compare smoothed losses, not per-step values
    assert abs(jax_tail - ref_tail) < 0.25 * max(ref_tail, 1e-3), \
        (ref_tail, jax_tail)

    ref_img, gt = P.ref_render_frame(ns, ref_trainer, 0, 1)
    jax_img, gt2 = P.jax_render_frame(jax_trainer, 0)
    np.testing.assert_allclose(gt, gt2, atol=1e-5)
    p_ref = P.psnr(ref_img, gt)
    p_jax = P.psnr(jax_img, gt)
    cross = P.psnr(jax_img, ref_img)
    # after 40 steps from IDENTICAL weights the two systems render nearly
    # the same image (measured ~74 dB at 20 steps, ~38 dB at 300)
    assert cross > 25.0, (cross, p_ref, p_jax)
    assert abs(p_ref - p_jax) < 1.5, (p_ref, p_jax)


def test_stage3_training_parity(tmp_path):
    """Short stage-3 leg of the parity harness: the ACTUAL PyTorch
    MoCoFlowTrainer vs the rebuild, identical init weights, all losses
    active (img + local/global chain + NoF L1 + alpha mask). The long
    200-step run + fixed-point NoF evaluation is recorded in PARITY.md."""
    import scripts.parity_train_e2e as P
    from moco_flow_tpu.data.synthetic import make_synthetic_scene
    from scripts.drive_pipeline_e2e import write_scene_smpl_pickle
    from scripts.ref_driver import import_reference

    base = str(tmp_path)
    root = os.path.join(base, "scene")
    smpl = make_synthetic_scene(root, n_frames=P.N_FRAMES, size=P.SIZE,
                                focal=P.FOCAL)
    write_scene_smpl_pickle(smpl, os.path.join(base, "smpl", "data"))
    ns = import_reference(os.path.join(base, "smpl"))

    steps, n_rand = 25, 64
    ref_cfg = P.stage_cfg(3, root, os.path.join(base, "ref"), steps, n_rand,
                          ref_side=True)
    ref_trainer = P.build_reference(ns, ref_cfg)
    init = P.transfer_stage3(ns, ref_trainer)
    ref_losses = P.train_reference(ref_trainer, steps)

    jax_cfg = P.stage_cfg(3, root, os.path.join(base, "jax"), steps, n_rand,
                          ref_side=False)
    jax_trainer, jax_losses = P.run_rebuild(jax_cfg, smpl, init, steps)

    # every reference loss exists on the rebuild side and tracks it
    # (independent RNG streams: smoothed comparisons, not per-step)
    for k, tol in (("img_loss", 0.3), ("nof_local", 0.5), ("nof_global", 0.5),
                   ("alphas_mask", 0.5)):
        r, j = P.smoothed(ref_losses, k), P.smoothed(jax_losses, k)
        assert np.isfinite(j) and np.isfinite(r), (k, r, j)
        assert abs(j - r) < tol * max(abs(r), 1e-2), (k, r, j)

    ref_img, gt = P.ref_render_frame(ns, ref_trainer, 0, 3)
    jax_img, gt2 = P.jax_render_frame(jax_trainer, 0)
    np.testing.assert_allclose(gt, gt2, atol=1e-5)
    cross = P.psnr(jax_img, ref_img)
    assert cross > 22.0, (cross, P.psnr(ref_img, gt), P.psnr(jax_img, gt))

    # fixed-point NoF eval: identical SMPL fixed points through both
    # implementations' trained NoFs — the apples-to-apples motion metric
    ev = P.nof_eval(ns, ref_trainer, jax_trainer, P.N_FRAMES)
    for side in ("ref", "jax"):
        assert np.isfinite(ev[f"{side}_bw"]), ev
    assert ev["jax_bw"] < 3.0 * max(ev["ref_bw"], 1e-3), ev
