"""Training clock (epoch / minibatch / global step) with checkpoint
round-tripping — parity with the reference TrainClock
(utils/base_utils.py:12-38)."""

from __future__ import annotations


class TrainClock:
    def __init__(self):
        self.epoch = 1
        self.minibatch = 0
        self.step = 0

    def tick(self, step: int = 1):
        self.minibatch += 1
        self.step += step

    def tock(self):
        self.epoch += 1
        self.minibatch = 0

    def make_checkpoint(self) -> dict:
        return {"epoch": self.epoch, "minibatch": self.minibatch,
                "step": self.step}

    def restore_checkpoint(self, d: dict):
        self.epoch = d["epoch"]
        self.minibatch = d["minibatch"]
        self.step = d["step"]
