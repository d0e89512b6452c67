#!/usr/bin/env python
"""People-Snapshot preprocessing CLI: convert the dataset's ground-truth
camera/shape/pose annotations into the MoCo-Flow JSON schema.

Capability parity with the reference ``scripts/preprocess_snapshot_data.py``:
clip the video, matte the person, estimate the background, read the GT
``camera.pkl`` / ``consensus.pkl`` / ``reconstructed_poses.hdf5`` and write a
VIBE-schema pkl, then emit ``train.json``/``val.json`` + the init_nerf renders.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import pickle
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from scripts.data_utils import (  # noqa: E402
    clip_video,
    create_init_nerf_data,
    create_moco_flow_data,
    median_background,
    run_matting,
)


def load_pickle(path: str):
    with open(path, "rb") as f:
        return pickle.load(f, encoding="latin1")


def convert_snapshot_gt(gt_dir: str, out_pkl: str, start_frame: int,
                        end_frame: int, interval: int = 1):
    """People-Snapshot GT (camera.pkl / consensus.pkl /
    reconstructed_poses.hdf5) -> VIBE-schema pkl + camera intrinsics
    (ref scripts/preprocess_snapshot_data.py:54-74: per-frame pose/trans from
    the hdf5, one shared consensus beta vector, sequential frame_ids).

    Returns ``(converted_dict, focal, camera_c)``.
    """
    import h5py
    camera = load_pickle(osp.join(gt_dir, "camera.pkl"))
    consensus = load_pickle(osp.join(gt_dir, "consensus.pkl"))
    poses_h5 = h5py.File(osp.join(gt_dir, "reconstructed_poses.hdf5"), "r")

    idx = list(range(start_frame, end_frame, interval))
    converted = {1: {
        "frame_ids": np.arange(len(idx)),
        "betas": np.stack([np.asarray(consensus["betas"]) for _ in idx]),
        "pose": np.stack([poses_h5["pose"][i] for i in idx]),
        "transls": np.stack([poses_h5["trans"][i] for i in idx]),
    }}
    poses_h5.close()
    with open(out_pkl, "wb") as f:
        pickle.dump(converted, f)
    focal = float(np.asarray(camera["camera_f"])[0])
    c = np.asarray(camera["camera_c"])
    return converted, focal, c


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_video", required=True,
                    help="People-Snapshot subject video (.mp4); the GT pkls "
                         "are expected in the same-named directory")
    ap.add_argument("--output_folder", required=True)
    ap.add_argument("--start_frame", type=int, default=0)
    ap.add_argument("--end_frame", type=int, default=-1)
    ap.add_argument("--interval", type=int, default=1)
    ap.add_argument("--gender", default="m")
    ap.add_argument("--skip_matting", action="store_true")
    args = ap.parse_args()

    out = args.output_folder
    os.makedirs(osp.join(out, "images_w_bkgd"), exist_ok=True)

    n = clip_video(args.input_video, osp.join(out, "images_w_bkgd"),
                   args.start_frame,
                   None if args.end_frame == -1 else args.end_frame)
    end_frame = args.end_frame if args.end_frame != -1 else args.start_frame + n
    print(f"extracted {n} frames")

    if not args.skip_matting:
        run_matting(osp.join(out, "images_w_bkgd"), osp.join(out, "images"))
    median_background(osp.join(out, "images_w_bkgd"), None,
                      osp.join(out, "background.png"))

    gt_dir = args.input_video.replace(".mp4", "")
    _, focal, c = convert_snapshot_gt(gt_dir, osp.join(out, "converted.pkl"),
                                      args.start_frame, end_frame,
                                      args.interval)

    from PIL import Image
    h, w = np.asarray(Image.open(
        osp.join(out, "images_w_bkgd", "0000.png"))).shape[:2]
    create_moco_flow_data(osp.join(out, "converted.pkl"), (h, w), focal=focal,
                          c=c, gender=args.gender)
    create_init_nerf_data(osp.join(out, "converted.pkl"), (h, w), focal=focal,
                          c=c, gender=args.gender)
    print(f"dataset ready at {out}")


if __name__ == "__main__":
    main()
