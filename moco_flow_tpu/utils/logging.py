"""Observability: text log + scalar/metric writers.

Parity with the reference logging stack (trainer/base.py:108-120, 199-229;
utils/base_utils.py:40-49): a ``log.txt`` worklog plus per-step scalar records.
TensorBoard is optional (tensorboardX if importable); scalars always also go to
an appendable ``metrics.jsonl`` so headless runs stay observable. A
``jax.profiler`` trace hook covers the tracing/profiling subsystem the
reference lacks (SURVEY.md §5)."""

from __future__ import annotations

import json
import logging
import os
import time


class WorkLogger:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._logger = logging.getLogger(f"mocoflow.{log_dir}")
        self._logger.setLevel(logging.INFO)
        if not self._logger.handlers:
            h = logging.FileHandler(os.path.join(log_dir, "log.txt"))
            h.setFormatter(logging.Formatter("%(asctime)s - %(message)s"))
            self._logger.addHandler(h)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from tensorboardX import SummaryWriter
            self._tb = SummaryWriter(os.path.join(log_dir, "train.events"))
        except ImportError:
            pass

    def put_line(self, line: str):
        self._logger.info(line)

    def scalars(self, tag_prefix: str, values: dict, step: int):
        rec = {"step": step, "time": time.time()}
        for k, v in values.items():
            v = float(v)
            rec[f"{tag_prefix}/{k}"] = v
            if self._tb is not None:
                self._tb.add_scalar(f"{tag_prefix}/{k}", v, step)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def histogram(self, tag: str, values, step: int):
        """PE-annealing weight histograms on log steps (the reference logs
        these per embedding, trainer_moco_flow.py:384-388). Falls back to a
        jsonl record of the raw vector when TensorBoard is absent."""
        import numpy as np
        values = np.asarray(values)
        if self._tb is not None:
            self._tb.add_histogram(tag, values, step)
        self._jsonl.write(json.dumps(
            {"step": step, "time": time.time(),
             f"hist/{tag}": [float(v) for v in values.ravel()]}) + "\n")
        self._jsonl.flush()

    def image(self, tag: str, img, step: int):
        """img: (H, W, 3) float [0,1]."""
        if self._tb is not None:
            self._tb.add_image(tag, img, step, dataformats="HWC")

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def profile_trace(log_dir: str):
    """Context manager capturing a jax profiler trace viewable in
    TensorBoard/Perfetto."""
    import jax
    return jax.profiler.trace(os.path.join(log_dir, "plugins", "profile"))
