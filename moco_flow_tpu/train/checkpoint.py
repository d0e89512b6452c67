"""Checkpointing: atomic pytree save/load + cross-stage weight surgery.

Same external contract as the reference (trainer/base.py:279-327, SURVEY.md
§3.5): checkpoints named ``epoch{E}_iter{S}``, auto-resume picks the newest by
iteration, partial loads tolerate missing keys, and the stage-3 bootstrap
copies ONLY the sigma branch of the pretrained *fine* NeRF into both coarse and
fine NeRFs (trainer_moco_flow.py:54-62).

Format: a single ``.npz`` with '/'-flattened pytree paths plus a JSON sidecar
of non-array state (clock). Writes are atomic (tmp + rename) so a preempted
run never sees a torn checkpoint (the auto-resume contract of SURVEY.md §5).
"""

from __future__ import annotations

import glob
import json
import os
import re

import numpy as np

import jax
import jax.numpy as jnp


def _flatten(tree, prefix="") -> dict:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict):
    root: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(re.fullmatch(r"\d+", k) for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_checkpoint(path: str, tree, extra: dict | None = None) -> None:
    """Atomically write ``tree`` (pytree of arrays) + ``extra`` (JSON-able)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = _flatten(jax.device_get(tree))
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    # commit the .npz BEFORE the sidecar: a crash between the two renames
    # then leaves a fresh .npz with a stale/missing sidecar (auto-resume
    # ranks it conservatively low) rather than a fresh sidecar pointing at a
    # stale .npz, which could out-rank a good numbered checkpoint
    os.replace(tmp, path + ".npz")
    if extra is not None:
        with open(path + ".json.tmp", "w") as f:
            json.dump(extra, f)
        os.replace(path + ".json.tmp", path + ".json")


def load_checkpoint(path: str):
    """-> (tree, extra_dict)."""
    if path.endswith(".npz"):
        path = path[:-4]
    with np.load(path + ".npz") as data:
        tree = _unflatten({k: data[k] for k in data.files})
    extra = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            extra = json.load(f)
    return tree, extra


def merge_into(params, loaded, strict: bool = False):
    """Overlay ``loaded`` onto ``params`` where paths+shapes match
    (the reference's ``strict=False`` load, base.py:312-314)."""
    flat_p = _flatten(params)
    flat_l = _flatten(loaded)
    out = {}
    for k, v in flat_p.items():
        if k in flat_l and flat_l[k].shape == v.shape:
            out[k] = jnp.asarray(flat_l[k])
        else:
            if strict and k not in flat_l:
                raise KeyError(f"checkpoint missing {k}")
            out[k] = v
    return _unflatten(out)


def ckpt_step(path: str) -> int:
    """Step of a checkpoint: from the ``_iterN`` name, else from the sidecar
    clock (covers the 'final' checkpoint, which the reference's name-parsing
    auto-resume could not rank)."""
    m = re.search(r"_iter(\d+)", os.path.basename(path))
    if m:
        return int(m.group(1))
    try:
        with open(path + ".json") as f:
            return int(json.load(f).get("clock", {}).get("step", -1))
    except (OSError, ValueError):
        return -1


def find_latest_checkpoint(pattern: str) -> str | None:
    """Newest checkpoint by iteration number under a glob like
    ``save_dir/exp_name/*/ckpts/*.npz`` (ref train.py:22-29)."""
    candidates = [p[:-4] for p in glob.glob(pattern) if p.endswith(".npz")]
    candidates = [p for p in candidates if ckpt_step(p) >= 0]
    if not candidates:
        return None
    return max(candidates, key=ckpt_step)


# -- cross-stage surgery ----------------------------------------------------

def transfer_pretrained_nerf(params: dict, ckpt_tree: dict) -> dict:
    """Copy the *fine* NeRF sigma branch (trunk + sigma head +
    xyz_encoding_final) from a stage-1 checkpoint into BOTH coarse and fine
    NeRFs, leaving the rgb branch (extra/rgb) at its fresh init — the
    reference's 'xyz or sigma keys only, fine_NeRF source' trick
    (trainer_moco_flow.py:54-62)."""
    src = ckpt_tree.get("params", ckpt_tree).get("fine_NeRF")
    if src is None:
        raise KeyError("checkpoint has no fine_NeRF parameters")
    out = dict(params)
    for name in ("coarse_NeRF", "fine_NeRF"):
        if name in out:
            tgt = dict(out[name])
            for branch in ("trunk", "sigma", "final"):
                tgt[branch] = jax.tree.map(jnp.asarray, src[branch])
            out[name] = tgt
    return out


def transfer_pretrained_nof(params: dict, ckpt_tree: dict) -> dict:
    """Copy bw_NoF/fw_NoF from a stage-2 checkpoint
    (trainer_moco_flow.py:66-70)."""
    src = ckpt_tree.get("params", ckpt_tree)
    out = dict(params)
    for name in ("bw_NoF", "fw_NoF"):
        if name in out and name in src:
            out[name] = jax.tree.map(jnp.asarray, src[name])
    return out
