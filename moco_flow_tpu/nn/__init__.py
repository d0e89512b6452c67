from .embedding import posenc, anneal_weights, freq_bands, out_channels
from .mlp import init_linear, linear, linear_relu
from .nerf import NeRFConfig, init_nerf, nerf_apply, nerf_sigma, sigma_branch_params
from .nof import NoFConfig, init_nof, nof_apply
from .quaternion import (
    quaternion_log_to_exp,
    quaternion_to_rotation_matrix,
    log_quaternion_to_rotation_matrix,
)
from . import losses, metrics

__all__ = [
    "posenc", "anneal_weights", "freq_bands", "out_channels",
    "init_linear", "linear", "linear_relu",
    "NeRFConfig", "init_nerf", "nerf_apply", "nerf_sigma", "sigma_branch_params",
    "NoFConfig", "init_nof", "nof_apply",
    "quaternion_log_to_exp", "quaternion_to_rotation_matrix",
    "log_quaternion_to_rotation_matrix",
    "losses", "metrics",
]
