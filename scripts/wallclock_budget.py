#!/usr/bin/env python
"""Three-stage end-to-end wall-clock budget from measured bench throughput.

Turns one `bench.py` JSON line into the table PERF.md publishes for the
"<2h on a v4-8" BASELINE.md target. Workload sizes come from the
reference's shipped configs (total work = num_iters x per-step size: the
reference clock ticks by world size, train.py:76, so num_iters counts
GLOBAL steps regardless of GPU count):

  stage 1  200k iters x 5120 rays   (init_nerf.yaml:29-32,86) = 1.024e9 rays
  stage 2  600k iters x 100k pts    (init_nof.yaml:19,72)     = 6.0e10 pts
  stage 3  2.2M  iters x 1024 rays  (c2f.yaml:34,142)         = 2.2528e9 rays

DP scaling divides each stage by the chip count times the measured
multi-chip step efficiency; stages 1 and 2 are independent (the reference
runs them in parallel, README.md:125-137) so the critical path is
max(s1, s2) + s3.

    python scripts/wallclock_budget.py /tmp/bench.json --chips 8
"""

from __future__ import annotations

import argparse
import json

S1_RAYS = 200_000 * 5120
S2_PTS = 600_000 * 100_000
S3_RAYS = 2_200_000 * 1024

# v4 peak bf16 275 TFLOP/s vs v5e-lite ~197 (public TPU specs); the train
# step is measured MXU-kernel-resident (93.9%, PERF.md) so peak ratio is
# the honest first-order scaling assumption.
V4_OVER_V5E = 275.0 / 197.0


def budget(bench: dict, chips: int, dp_eff: float = 0.99) -> dict:
    s1 = bench["train_stage1_rays_per_sec_per_chip"]
    s2 = bench["train_stage2_pts_per_sec_per_chip"]
    s3 = bench["value" if bench["metric"] == "train_rays_per_sec_per_chip"
               else "train_rays_per_sec_per_chip"]
    scale = chips * dp_eff
    h1 = S1_RAYS / (s1 * scale) / 3600
    h2 = S2_PTS / (s2 * scale) / 3600
    h3 = S3_RAYS / (s3 * scale) / 3600
    seq = h1 + h2 + h3
    par = max(h1, h2) + h3  # reference runs stages 1 and 2 in parallel
    return {
        "chips": chips, "dp_efficiency": dp_eff,
        "stage1_h": round(h1, 3), "stage2_h": round(h2, 3),
        "stage3_h": round(h3, 3),
        "total_sequential_h": round(seq, 3),
        "total_s1_parallel_s2_h": round(par, 3),
        "v4_total_sequential_h": round(seq / V4_OVER_V5E, 3),
        "v4_total_s1_parallel_s2_h": round(par / V4_OVER_V5E, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bench_json")
    ap.add_argument("--chips", type=int, default=8)
    ap.add_argument("--dp_eff", type=float, default=0.99,
                    help="measured multi-chip step efficiency "
                         "(PERF.md: DP overhead ~1%% — one ~1.5M-param "
                         "gradient psum per step)")
    args = ap.parse_args()
    with open(args.bench_json) as f:
        bench = json.loads(f.read().strip().splitlines()[-1])
    print(json.dumps(budget(bench, args.chips, args.dp_eff), indent=2))


if __name__ == "__main__":
    main()
