from .camera import (
    Camera,
    aabb_corners,
    make_rays,
    near_far_from_aabb,
    project_points,
    ray_directions,
    rays_from_pose,
    rescale_aabb,
    valid_rays_mask,
)
from .poses import create_bullet_effect_poses, create_spheric_poses, pose_spherical
from .smpl import (
    SMPLData,
    load_smpl_data,
    rodrigues,
    smpl_forward,
    smpl_joints,
    smpl_vertex_transforms,
    synthetic_smpl_data,
)

__all__ = [
    "Camera", "aabb_corners", "make_rays", "near_far_from_aabb",
    "project_points", "ray_directions", "rays_from_pose", "rescale_aabb",
    "valid_rays_mask",
    "create_bullet_effect_poses", "create_spheric_poses", "pose_spherical",
    "SMPLData", "load_smpl_data", "rodrigues", "smpl_forward", "smpl_joints",
    "smpl_vertex_transforms", "synthetic_smpl_data",
]
