"""Multi-host (multi-process) initialization and process-0 gating.

The reference scales past one machine with ``torch.distributed.launch``
(README.md:127-145) and gates checkpoint/log/val work on the master rank
(trainer/base.py:52-57, 94-106). The JAX-native equivalent is
multi-controller SPMD: every host runs the same program, calls
``jax.distributed.initialize`` once, and sees the union of all hosts'
devices in ``jax.devices()`` — after which the existing 1-D data mesh
(parallel/mesh.py) spans every chip in the pod slice and the gradient
psum rides ICI/DCN with no further code changes. Host-side side effects
(logging, checkpoint writes, visualization) run on process 0 only.

On a single host (the common v4-8 case) nothing here needs to be called:
``jax.distributed`` stays uninitialized and :func:`is_main` returns True.
"""

from __future__ import annotations

import os


def maybe_init_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None,
                           require: bool = False) -> bool:
    """Initialize JAX multi-controller mode if requested.

    Explicit arguments win; otherwise falls back to the standard
    environment variables (``JAX_COORDINATOR_ADDRESS`` /
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``); with ``require=True``
    (the ``train.py --dist`` path) and no explicit addressing, the no-arg
    ``jax.distributed.initialize()`` runs so the cloud-TPU metadata
    auto-detection can engage — and any failure RAISES rather than letting
    N hosts silently train N independent single-host jobs. Returns True
    iff distributed mode was initialized. Must run before the first
    ``jax.devices()`` touch.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        if not require:
            return False  # single-process run
        try:
            # cloud-TPU / SLURM / OpenMPI auto-detection inside jax
            jax.distributed.initialize()
        except Exception as e:
            raise RuntimeError(
                "--dist was requested but no coordinator is configured and "
                "auto-detection failed; pass --coordinator_address/"
                "--num_processes/--process_id (or the JAX_* env vars)"
            ) from e
        return True
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def process_index() -> int:
    import jax
    return jax.process_index()


def process_count() -> int:
    import jax
    return jax.process_count()


def is_main() -> bool:
    """True on the process that owns logging/checkpoint/visualization
    side effects (the analog of the reference's ``@master_process``,
    trainer/base.py:52-57)."""
    return process_index() == 0
