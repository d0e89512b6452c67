"""MoCo-Flow TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for reconstructing
free-viewpoint animatable neural humans from monocular video.

Re-designed from scratch for TPU hardware with the capabilities of the PyTorch
reference implementation of *MoCo-Flow: Neural Motion Consensus Flow for Dynamic
Humans in Stationary Monocular Cameras* (Eurographics/CGF 2022).

Architecture (TPU-first, not a port):
  - ``nn``       pure-function MLPs over parameter pytrees (NeRF, NoF, positional
                 encoding with coarse-to-fine annealing weights as arrays).
  - ``render``   a single jitted megabatch volume renderer (stratified + inverse-CDF
                 hierarchical sampling, NoF warps, alpha compositing) — replaces the
                 reference's host-side Python chunk loop.
  - ``ops``      TPU compute kernels: brute-force KNN as MXU matmul + argmin,
                 fused Pallas PE+MLP kernels, host marching cubes (C++).
  - ``geometry`` cameras/rays, SMPL body model with ``lax``-based FK/LBS, poses.
  - ``data``     device-resident dataset: images live in HBM, rays are generated
                 inside jit from per-frame camera parameters.
  - ``train``    optax-based 3-stage trainers (canonical NeRF -> NoF pretrain ->
                 joint coarse-to-fine), checkpointing, schedules.
  - ``parallel`` data-parallel training via ``shard_map`` over a device mesh with
                 ICI collectives (replaces torch DDP/NCCL).
"""

__version__ = "0.1.0"
