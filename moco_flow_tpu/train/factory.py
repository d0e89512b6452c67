"""Model/statics/render-config builders from YAML config dicts.

The functional analog of the reference factories (models/__init__.py:8-39 +
each trainer's ``build_model``): config dicts -> static config dataclasses +
freshly initialized parameter pytrees.
"""

from __future__ import annotations

import jax

from ..nn.nerf import NeRFConfig, init_nerf
from ..nn.nof import NoFConfig, init_nof
from ..render.volume import EmbeddingSpec, ModelStatics, RenderConfig


def build_statics(model_cfg: dict) -> ModelStatics:
    """ModelStatics from the ``model:`` YAML block."""
    def emb(name):
        return EmbeddingSpec.from_dict(model_cfg.get(name))

    coarse = NeRFConfig.from_dict(model_cfg["coarse_NeRF"]) \
        if model_cfg.get("coarse_NeRF") else NeRFConfig()
    fine = NeRFConfig.from_dict(model_cfg["fine_NeRF"]) \
        if model_cfg.get("fine_NeRF") and model_cfg.get("N_importance", 0) > 0 \
        else None
    nof = NoFConfig.from_dict(model_cfg["bw_NoF"]) \
        if model_cfg.get("bw_NoF") else None
    return ModelStatics(
        coarse=coarse, fine=fine, nof=nof,
        nerf_xyz=emb("nerf_embedding_xyz") or EmbeddingSpec(0),
        nerf_ind=emb("nerf_embedding_ind"),
        nerf_dir=emb("nerf_embedding_dir"),
        nof_xyz=emb("nof_embedding_xyz"),
        nof_ind=emb("nof_embedding_ind"),
    )


def init_params(key: jax.Array, model_cfg: dict, statics: ModelStatics,
                with_nerf: bool = True, with_nof: bool = False,
                with_fw_nof: bool = False) -> dict:
    """Fresh parameter pytree; which nets exist mirrors the reference build
    logic (trainer_moco_flow.py:72-102: fw_NoF only when chain losses are
    on)."""
    keys = jax.random.split(key, 4)
    params = {}
    if with_nerf:
        params["coarse_NeRF"] = init_nerf(keys[0], statics.coarse)
        if statics.fine is not None:
            params["fine_NeRF"] = init_nerf(keys[1], statics.fine)
    if with_nof:
        assert statics.nof is not None
        params["bw_NoF"] = init_nof(keys[2], statics.nof)
        if with_fw_nof:
            params["fw_NoF"] = init_nof(keys[3], statics.nof)
    return params


def _uses_hashgrid(model_cfg: dict) -> bool:
    return any((model_cfg.get(k) or {}).get("encoding") == "hashgrid"
               for k in ("coarse_NeRF", "fine_NeRF"))


def render_config(model_cfg: dict, use_nof: bool = False,
                  chain_local: bool = False, chain_global: bool = False,
                  test_time: bool = False, perturb=None,
                  compute_dtype: str | None = None,
                  mlp_impl: str | None = None) -> RenderConfig:
    impl = mlp_impl or model_cfg.get("mlp_impl", "auto")
    if impl == "auto":
        # fused VMEM megakernels on real TPUs — fastest for both test-time
        # rendering (the XLA trunk is HBM-bound at 4M-row megabatches) and,
        # since the fused NoF warp-chain kernel, training (22.9k vs 21.6k
        # rays/s XLA, PERF.md). Plain XLA on the CPU test backend, where
        # Pallas would run interpreted. The hash-grid encoding has no fused
        # kernel (Mosaic has no vector gather; its tiny MLP is not
        # trunk-bound anyway) — auto resolves it to XLA everywhere.
        import jax
        impl = "xla" if (jax.default_backend() == "cpu"
                         or _uses_hashgrid(model_cfg)) else "fused"
    elif impl in ("fused", "fused_nerf", "pallas") and _uses_hashgrid(model_cfg):
        raise ValueError(
            f"mlp_impl={impl} has no hashgrid-encoding kernel path; use "
            f"mlp_impl: xla (or auto) with encoding: hashgrid")
    # Empty-space skipping + coarse probe (render/volume.py,
    # render/sampling.py) are consumed ONLY by the fused test-time path.
    # Train/val configs zero them (exact sampling is the training contract);
    # a test-time config that requests them on a path that would ignore them
    # raises instead of silently rendering exact (a silently-inert knob
    # already produced one bogus measurement — PERF.md quality-evidence note).
    fine_budget = int(model_cfg.get("fine_budget", 0))
    coarse_probe = int(model_cfg.get("coarse_probe", 0))
    if not test_time:
        fine_budget = coarse_probe = 0
    elif (fine_budget or coarse_probe) and impl != "fused":
        raise ValueError(
            f"fine_budget={fine_budget} / coarse_probe={coarse_probe} are "
            f"only implemented on the fused Pallas test-time path, but "
            f"mlp_impl resolved to '{impl}' "
            f"(auto -> xla on the CPU backend). Set them to 0 for an exact "
            f"render, or run with mlp_impl: fused on a TPU.")
    return RenderConfig(
        n_samples=model_cfg.get("N_samples", 64),
        n_importance=model_cfg.get("N_importance", 0),
        use_disp=model_cfg.get("use_disp", False),
        perturb=model_cfg.get("perturb", 0.0) if perturb is None else perturb,
        noise_std=model_cfg.get("noise_std", 0.0),
        activation=model_cfg.get("nerf_activate_type", "relu"),
        use_nof=use_nof, chain_local=chain_local, chain_global=chain_global,
        test_time=test_time,
        compute_dtype=compute_dtype or model_cfg.get("compute_dtype", "float32"),
        mlp_impl=impl,
        remat=bool(model_cfg.get("remat", False)) and not test_time,
        fine_budget=fine_budget,
        coarse_probe=coarse_probe,
        share_coarse_warps=bool(model_cfg.get("share_coarse_warps", True)),
    )
