#!/usr/bin/env python
"""Training CLI.

Same surface as the reference ``train.py``:
``python train.py -c config.yaml [-r ckpt] [-n job_name] [-s seed]`` with
auto-resume from the newest checkpoint of the experiment. ``--dist`` is
unnecessary: multi-chip data parallelism engages automatically whenever
``jax.devices()`` exposes more than one chip (shard_map over a 1-D mesh);
``--num_devices`` can cap it.
"""

from __future__ import annotations

import argparse

from moco_flow_tpu.parallel.mesh import make_mesh
from moco_flow_tpu.train import get_trainer
from moco_flow_tpu.utils.config import Config


def train(config: Config, smpl_data=None, mesh=None):
    trainer = get_trainer(config, smpl_data=smpl_data, mesh=mesh)
    trainer.auto_resume()
    clock = trainer.clock
    tcfg = config["trainer"]
    num_iters = tcfg["num_iters"]
    val_every = tcfg.get("val_every_n_step", 0)
    save_every = tcfg.get("save_every_n_step", 0)
    world = trainer.world_size
    epoch_len = max(trainer.num_frames // world, 1)

    try:
        from tqdm import tqdm
        pbar = tqdm(total=num_iters, initial=clock.step)
    except ImportError:
        pbar = None

    while clock.step < num_iters:
        metrics = trainer.train_func()

        if val_every and clock.step % val_every == 0:
            # EVERY process runs the val/vis computes — they are global-mesh
            # programs, and in multi-controller SPMD all hosts must execute
            # them; logging/file writes inside are process-0-gated (the
            # analog of the reference's @master_process, base.py:52-57)
            trainer.val_func()
            trainer.visualize_batch()
        if save_every and clock.step % save_every == 0 and clock.step > 0:
            trainer.save_ckpt()

        if pbar is not None:
            pbar.update(world)
            pbar.set_postfix({k: f"{v:.4f}" for k, v in metrics.items()
                              if isinstance(v, float)})
        clock.tick(world)
        if clock.minibatch >= epoch_len:
            clock.tock()

    if val_every:
        # the reference ends with the final checkpoint only (train.py:42-43);
        # a closing visualize_batch is our addition — skip it when validation
        # is disabled (quiet/headless runs), since end-of-run renders cost
        # minutes of fresh compiles on the tunneled TPU backend. All
        # processes compute; writes are process-0-gated inside.
        trainer.visualize_batch()
    trainer.save_ckpt("final")
    return trainer


def main():
    args = argparse.ArgumentParser(description="training pipeline")
    args.add_argument("-m", "--mode", default="train", type=str)
    args.add_argument("-c", "--config", required=True, type=str,
                      help="config file path")
    args.add_argument("-r", "--resume", default=None, type=str,
                      help="checkpoint to restore")
    args.add_argument("-n", "--job_name", default=None, type=str)
    args.add_argument("-s", "--seed", default=None)
    args.add_argument("--num_devices", default=None, type=int,
                      help="cap the data-parallel mesh size")
    args.add_argument("--dist", action="store_true",
                      help="multi-host launch (the analog of the reference's "
                           "torch.distributed.launch, README.md:127-145): "
                           "initialize JAX multi-controller mode from "
                           "--coordinator_address/--num_processes/"
                           "--process_id or the JAX_* env vars; every host "
                           "runs this same command and the data mesh spans "
                           "all hosts' chips")
    args.add_argument("--coordinator_address", default=None, type=str,
                      help="host:port of process 0 (multi-host)")
    args.add_argument("--num_processes", default=None, type=int,
                      help="total number of launched processes (multi-host)")
    args.add_argument("--process_id", default=None, type=int,
                      help="this process's rank (multi-host)")
    args.add_argument("--profile", action="store_true",
                      help="capture a jax.profiler trace into the log dir")
    args.add_argument("--debug_nans", action="store_true",
                      help="enable jax_debug_nans (NaN guard on every op)")
    ns = args.parse_args()
    if ns.dist or ns.coordinator_address or ns.num_processes is not None:
        # must run before the first jax.devices() touch so every host sees
        # the union of all chips
        from moco_flow_tpu.parallel.multihost import maybe_init_distributed
        maybe_init_distributed(ns.coordinator_address, ns.num_processes,
                               ns.process_id, require=ns.dist)
    config = Config.from_args(ns)
    mesh = make_mesh(ns.num_devices) if ns.num_devices else None
    if ns.debug_nans:
        import jax
        jax.config.update("jax_debug_nans", True)
    if ns.profile:
        from moco_flow_tpu.utils.logging import profile_trace
        with profile_trace(config.log_dir):
            train(config, mesh=mesh)
    else:
        train(config, mesh=mesh)


if __name__ == "__main__":
    main()
