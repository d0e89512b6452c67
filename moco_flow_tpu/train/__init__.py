"""Trainer registry (ref trainer/__init__.py:5-15)."""

from .base import BaseTrainer
from .stage_mocoflow import MoCoFlowTrainer
from .stage_nerf import NeRFTrainer
from .stage_nof import NoFTrainer


def get_trainer(config, **kwargs):
    kind = config["model"]["type"]
    if kind == "nerf":
        return NeRFTrainer(config, **kwargs)
    if kind == "nof":
        return NoFTrainer(config, **kwargs)
    if kind == "moco_flow":
        return MoCoFlowTrainer(config, **kwargs)
    raise ValueError(f"trainer for model type {kind!r} not found")


__all__ = ["BaseTrainer", "NeRFTrainer", "NoFTrainer", "MoCoFlowTrainer",
           "get_trainer"]
