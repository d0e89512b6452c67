"""Import-and-drive machinery for the ACTUAL PyTorch reference at
/root/reference, on CPU.

Used by scripts/parity_train_e2e.py (system-level training parity) — the
reference's CUDA-era dependencies that do not exist in this environment are
replaced by behavior-equivalent stubs:

  - knn_cuda.KNN        -> torch.cdist brute force (k=1 exact, same API)
  - trimesh             -> Box.sample_volume / Trimesh.bounding_box.bounds
                           (the only two members the datasets touch,
                           moco_flow_dataset.py:103-110,149-151)
  - torchvision         -> Resize/ToTensor transforms + save_image no-op
  - tensorboardX        -> no-op SummaryWriter
  - kornia              -> the pinned kornia-0.6.5 quaternion formulas
                           (XYZW order), as in tests/test_ref_parity.py
  - mcubes/plyfile      -> import-only stubs (visualization paths unused)

``BaseTrainer.init_dist`` is patched to run on the CPU device (the reference
hardcodes cuda:N, trainer/base.py:99-100); nothing else in the reference is
modified — the real trainers, datasets, renderer, optimizers and losses run
as written.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REF_ROOT = "/root/reference"


def _stub_module(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _install_torch_stubs():
    import torch

    # ---- knn_cuda: exact k=1 brute force with the wheel's API ----
    class KNN:
        def __init__(self, k=1, transpose_mode=True):
            assert transpose_mode, "reference always uses transpose_mode"
            self.k = k

        def __call__(self, ref, query):
            # ref (1, N, 3), query (1, M, 3) -> dist/ind (1, M, k)
            d = torch.cdist(query, ref)  # (1, M, N)
            dist, ind = torch.topk(d, self.k, dim=-1, largest=False)
            return dist, ind

    _stub_module("knn_cuda", KNN=KNN)

    # ---- trimesh: Box.sample_volume + Trimesh.bounding_box.bounds ----
    class _Box:
        def __init__(self, center=(0, 0, 0), extents=(1, 1, 1)):
            self.center = np.asarray(center, np.float64)
            self.extents = np.asarray(extents, np.float64)

        def sample_volume(self, n):
            lo = self.center - self.extents / 2
            hi = self.center + self.extents / 2
            return np.random.uniform(lo, hi, size=(n, 3))

    class _BoundingBox:
        def __init__(self, verts):
            self.bounds = np.stack([verts.min(0), verts.max(0)])

    class _Trimesh:
        def __init__(self, vertices=None, faces=None, **kw):
            self.vertices = np.asarray(vertices)
            self.faces = faces
            self.bounding_box = _BoundingBox(self.vertices)

    tm = _stub_module("trimesh", Trimesh=_Trimesh)
    tm.primitives = _stub_module("trimesh.primitives", Box=_Box)

    # ---- torchvision: the two transforms the dataset composes ----
    from PIL import Image

    class _Resize:
        def __init__(self, size):
            self.size = size  # (h, w)

        def __call__(self, img):
            return img.resize((self.size[1], self.size[0]), Image.BILINEAR)

    class _ToTensor:
        def __call__(self, img):
            arr = np.asarray(img, np.float32) / 255.0
            if arr.ndim == 2:
                arr = arr[..., None]
            return torch.from_numpy(arr.transpose(2, 0, 1).copy())

    class _Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    tv = _stub_module("torchvision")
    tv.transforms = _stub_module(
        "torchvision.transforms", Compose=_Compose, Resize=_Resize,
        ToTensor=_ToTensor)
    tv.utils = _stub_module("torchvision.utils",
                            save_image=lambda *a, **k: None,
                            make_grid=lambda *a, **k: None)

    # ---- tensorboardX ----
    class _SummaryWriter:
        def __init__(self, *a, **k):
            pass

        def __getattr__(self, name):
            return lambda *a, **k: None

    _stub_module("tensorboardX", SummaryWriter=_SummaryWriter)

    # ---- kornia (pinned 0.6.5 formulas, XYZW) ----
    import torch.nn.functional as F

    def quaternion_log_to_exp(q, eps: float = 1e-8):
        norm_q = torch.norm(q, p=2, dim=-1, keepdim=True).clamp(min=eps)
        vec = q * torch.sin(norm_q) / norm_q
        return torch.cat([vec, torch.cos(norm_q)], dim=-1)

    def quaternion_to_rotation_matrix(q):
        q = F.normalize(q, p=2, dim=-1, eps=1e-12)
        x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
        tx, ty, tz = 2 * x, 2 * y, 2 * z
        twx, twy, twz = tx * w, ty * w, tz * w
        txx, txy, txz = tx * x, ty * x, tz * x
        tyy, tyz, tzz = ty * y, tz * y, tz * z
        one = torch.ones_like(x)
        m = torch.stack([
            one - (tyy + tzz), txy - twz, txz + twy,
            txy + twz, one - (txx + tzz), tyz - twx,
            txz - twy, tyz + twx, one - (txx + tyy),
        ], dim=-1)
        return m.reshape(q.shape[:-1] + (3, 3))

    def _ssim(img1, img2, window_size=3):
        # kornia-0.6.5 ssim map with a gaussian window (sigma 1.5); only the
        # mean is consumed (models/metrics.py:19-22)
        sigma = 1.5
        ax = torch.arange(window_size, dtype=torch.float32) \
            - (window_size - 1) / 2
        g = torch.exp(-ax ** 2 / (2 * sigma ** 2))
        g = (g / g.sum())
        kernel = (g[:, None] @ g[None, :])[None, None]
        c = img1.shape[1]
        kernel = kernel.expand(c, 1, -1, -1)
        pad = window_size // 2
        mu1 = F.conv2d(img1, kernel, padding=pad, groups=c)
        mu2 = F.conv2d(img2, kernel, padding=pad, groups=c)
        mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        s1 = F.conv2d(img1 * img1, kernel, padding=pad, groups=c) - mu1_sq
        s2 = F.conv2d(img2 * img2, kernel, padding=pad, groups=c) - mu2_sq
        s12 = F.conv2d(img1 * img2, kernel, padding=pad, groups=c) - mu12
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        return ((2 * mu12 + c1) * (2 * s12 + c2)) / \
            ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))

    k = _stub_module("kornia")
    kg = _stub_module("kornia.geometry")
    kgc = _stub_module(
        "kornia.geometry.conversions",
        quaternion_log_to_exp=quaternion_log_to_exp,
        quaternion_to_rotation_matrix=quaternion_to_rotation_matrix)
    km = _stub_module("kornia.metrics")
    kms = _stub_module("kornia.metrics.ssim", ssim=_ssim)
    k.geometry, kg.conversions, k.metrics, km.ssim = kg, kgc, km, kms.ssim

    _stub_module("mcubes", marching_cubes=None)
    _stub_module("plyfile", PlyData=None, PlyElement=None)


def import_reference(smpl_pickle_dir: str) -> types.SimpleNamespace:
    """Import the reference packages with stubs installed, CPU-patched, and
    the SMPL pickle redirected to ``smpl_pickle_dir`` (the reference
    hardcodes utils/smpl/data/, smpl_model.py:60 — read-only here)."""
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    # tests/test_ref_parity.py installs an EMPTY 'datasets' stub (its parity
    # scope avoids the KNN_CUDA import); this driver needs the REAL package
    # (knn_cuda is stubbed below) — evict any fileless stub first, AND every
    # cached reference module: `from datasets import get_dataset` at module
    # top (trainer/trainer_nerf.py:15) bakes the stub's lambda into any
    # reference module imported while the stub was live, so those must
    # reimport against the real package too.
    stub_found = False
    for name in list(sys.modules):
        if (name == "datasets" or name.startswith("datasets.")) and \
                getattr(sys.modules[name], "__file__", None) is None:
            del sys.modules[name]
            stub_found = True
    if stub_found:
        for name, mod in list(sys.modules.items()):
            f = getattr(mod, "__file__", None)
            if f and f.startswith(REF_ROOT):
                del sys.modules[name]
    _install_torch_stubs()

    import importlib
    ns = types.SimpleNamespace()
    ns.smpl_model = importlib.import_module("utils.smpl.smpl_model")
    # SMPL resolves its pickle via module-global `os`; point dirname at the
    # fabricated model dir (same trick as tests/test_ref_parity.py:342-348)
    ns.smpl_model.os = types.SimpleNamespace(path=types.SimpleNamespace(
        dirname=lambda _: smpl_pickle_dir))

    ns.base = importlib.import_module("trainer.base")

    def init_dist_cpu(self, config):
        self.dist = False
        self.gpu = 0
        self.is_master = True
        self.local_rank = -1
        self.world_size = 1
        import torch
        self.device = torch.device("cpu")

    ns.base.BaseTrainer.init_dist = init_dist_cpu

    ns.parse_config = importlib.import_module("utils.parse_config")
    ns.trainer = importlib.import_module("trainer")
    ns.trainer_nerf = importlib.import_module("trainer.trainer_nerf")
    ns.trainer_moco = importlib.import_module("trainer.trainer_moco_flow")
    ns.rendering = importlib.import_module("models.rendering")
    ns.metrics = importlib.import_module("models.metrics")
    ns.datasets = importlib.import_module("datasets")
    return ns


def make_config(ns, cfg_dict: dict, job_name: str = "parity", seed=0,
                mode: str = "train"):
    """Build the reference ConfigParser the way from_args does
    (parse_config.py:69-99), without argparse."""
    return ns.parse_config.ConfigParser(
        cfg_dict, job_name=job_name, seed=seed, resume=None,
        gpu_id=0, local_rank=-1, mode=mode)
