"""Stage-3 train throughput vs per-step ray batch (the PERF.md round-4
"remaining real train levers" item 1).

The reference trains stage 3 at 1024 rays/GPU/step
(/root/reference/configs/people_snapshot/male-3-casual/c2f.yaml:34); on TPU
the backward kernels run small-M matmuls at that shape (~30-40 TFLOP/s,
PERF.md round-3 profile), so doubling/quadrupling the per-step batch widens
M per backward block and should close part of the gap to the ~38-40k
rays/s/chip FLOP-arithmetic ceiling. Larger batches are a documented
deviation from the reference's step shape (PARITY.md) — same math per ray,
different SGD batch size.

Usage (on the TPU):
    python scripts/bench_batch_size.py --batches 1024 2048 4096 --steps 20
Prints one JSON line per (batch, remat) config.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[1024, 2048, 4096])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--impl", default="auto")
    ap.add_argument("--remat", default="auto",
                    help="auto: bench.py policy (remat iff batch>1024); "
                         "also accepts 0/1 to force")
    args = ap.parse_args()

    from bench import build_trainer, bench_train

    results = []
    for n_rand in args.batches:
        remats = ([n_rand > 1024] if args.remat == "auto"
                  else [bool(int(args.remat))])
        for remat in remats:
            with tempfile.TemporaryDirectory() as tmp:
                t0 = time.time()
                try:
                    trainer = build_trainer(
                        os.path.join(tmp, "scene"), os.path.join(tmp, "log"),
                        args.dtype, args.impl, mesh=None, n_rand=n_rand,
                        model_overrides={"remat": remat})
                    rate = bench_train(trainer, args.steps) / trainer.world_size
                    row = {"n_rand": n_rand, "remat": remat,
                           "rays_per_sec_per_chip": round(rate, 1),
                           "step_ms": round(n_rand / rate * 1e3, 2),
                           "setup_s": round(time.time() - t0, 1)}
                except Exception as e:  # noqa: BLE001 — record, keep sweeping
                    row = {"n_rand": n_rand, "remat": remat,
                           "error": f"{type(e).__name__}: {e}"[:300]}
                trainer = None  # drop params/opt state before the next shape
                results.append(row)
                print(json.dumps(row), flush=True)
    print(json.dumps({"sweep": results}))


if __name__ == "__main__":
    main()
