#!/usr/bin/env python
"""In-the-wild preprocessing CLI: phone video -> MoCo-Flow training data.

Capability parity with the reference ``scripts/preprocess_data.py``:
  1. clip the video into frames,
  2. alpha-matte the person (RobustVideoMatting),
  3. estimate a static background (per-pixel median),
  4. run VIBE for per-frame SMPL pose estimates (external repo, invoked as a
     subprocess — same as the reference's ``os.system`` call),
  5. convert the VIBE pkl into ``train.json`` / ``val.json``,
  6. render the init_nerf multi-view images of the frame-0 posed SMPL.

Steps that depend on external networks/tools (2, 4) are gated with clear
errors so the rest of the pipeline works on precomputed inputs.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import subprocess
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from scripts.data_utils import (  # noqa: E402
    clip_video,
    create_init_nerf_data,
    create_moco_flow_data,
    median_background,
    run_matting,
)


def run_vibe(vibe_dir: str, video_path: str, out_dir: str):
    """Invoke the external VIBE repo (ref preprocess_data.py:52-57)."""
    if not vibe_dir or not osp.isdir(vibe_dir):
        raise RuntimeError(
            "VIBE repo not found; pass --vibe_dir or provide the vibe pkl "
            "directly with --vibe_pkl.")
    subprocess.run(
        [sys.executable, "demo.py", "--vid_file", osp.abspath(video_path),
         "--output_folder", osp.abspath(out_dir)],
        cwd=vibe_dir, check=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--video", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--end", type=int, default=None)
    ap.add_argument("--size", type=int, nargs=2, default=[1080, 1080])
    ap.add_argument("--focal", type=float, default=2000.0)
    ap.add_argument("--gender", default="neutral")
    ap.add_argument("--vibe_dir", default=None,
                    help="path to a VIBE checkout (external)")
    ap.add_argument("--vibe_pkl", default=None,
                    help="precomputed VIBE output pkl (skips VIBE)")
    ap.add_argument("--skip_matting", action="store_true")
    ap.add_argument("--num_init_views", type=int, default=120)
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    raw_dir = osp.join(args.out_dir, "raw_images")
    imgs_dir = osp.join(args.out_dir, "images")

    n = clip_video(args.video, raw_dir, args.start, args.end, args.size)
    print(f"extracted {n} frames")

    if args.skip_matting:
        imgs_dir = raw_dir
    else:
        run_matting(raw_dir, imgs_dir)
        print("matting done")

    median_background(raw_dir, None, osp.join(args.out_dir, "background.png"))

    pkl = args.vibe_pkl
    if pkl is None:
        vibe_out = osp.join(args.out_dir, "vibe")
        run_vibe(args.vibe_dir, args.video, vibe_out)
        pkl = osp.join(vibe_out, "vibe_output.pkl")
    # place the pkl next to the dataset so the JSONs land in out_dir
    if osp.dirname(osp.abspath(pkl)) != osp.abspath(args.out_dir):
        import shutil
        shutil.copy(pkl, osp.join(args.out_dir, "vibe_output.pkl"))
        pkl = osp.join(args.out_dir, "vibe_output.pkl")

    create_moco_flow_data(pkl, args.size, focal=args.focal,
                          gender=args.gender)
    create_init_nerf_data(pkl, args.size, focal=args.focal,
                          gender=args.gender, num_images=args.num_init_views)
    print(f"dataset ready at {args.out_dir}")


if __name__ == "__main__":
    main()
