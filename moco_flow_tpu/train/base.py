"""Trainer base: lifecycle, checkpoint IO, chunked full-image rendering.

Host-side orchestration equivalent of the reference ``trainer/base.py`` —
but where the reference base class owns mutable nn.Modules, DDP wrappers and
torch optimizers, this one owns *pytrees* (params / optimizer state) and
compiled step functions; all mutation is functional. Multi-chip data
parallelism comes from ``parallel.dp_jit`` (shard_map + psum) instead of
DDP/NCCL (ref base.py:94-106, 251-256).
"""

from __future__ import annotations

import functools
import os.path as osp

import numpy as np

import jax
import jax.numpy as jnp

from ..parallel import multihost
from ..parallel.mesh import make_mesh
from ..render.volume import RenderConfig, render_rays
from ..utils.clock import TrainClock
from ..utils.config import Config
from ..utils.logging import WorkLogger
from .checkpoint import (
    find_latest_checkpoint,
    load_checkpoint,
    merge_into,
    save_checkpoint,
)


class BaseTrainer:
    """Shared services: logging, clock, checkpointing, chunked rendering."""

    def __init__(self, config: Config, mesh=None, smpl_data=None):
        self.config = config
        self.mode = config.mode
        self.smpl_data = smpl_data
        self.mesh = mesh if mesh is not None else (
            make_mesh() if len(jax.devices()) > 1 else None)
        self.world_size = (int(np.prod(self.mesh.devices.shape))
                           if self.mesh is not None else 1)
        self.clock = TrainClock()
        self.logger = None
        self.params = {}
        self.opt_state = None
        self.extra = {}
        self.losses = {}
        self._render_fns = {}
        self._occ_grids = {}  # frame_idx -> OccupancyGrid (test-time cache)
        self._occ_stats = None
        # multi-host: side effects (logging/ckpt/vis) are process-0-only,
        # the analog of the reference's @master_process (base.py:52-57)
        self.is_main = multihost.is_main()

        if self.mode == "train":
            if self.is_main:
                self.logger = WorkLogger(config.log_dir)
            self.record_str(f"world_size={self.world_size} "
                            f"devices={jax.devices()}")
            self.prepare_dataloader(config["dataloader"])
            self.build_model(config["model"])
            self.configure_optimizers(config["optimizer"],
                                      config.get("scheduler"))
            self.build_steps()

    # -- subclass hooks ---------------------------------------------------

    def prepare_dataloader(self, data_config):
        raise NotImplementedError

    def build_model(self, model_config):
        raise NotImplementedError

    def configure_optimizers(self, optimizer_config, scheduler_config):
        raise NotImplementedError

    def build_steps(self):
        raise NotImplementedError

    def train_step(self):
        raise NotImplementedError

    def val_step(self):
        raise NotImplementedError

    def visualize_batch(self, save_path=None):
        pass

    # -- logging ----------------------------------------------------------

    def record_str(self, s: str):
        print(s)
        if self.logger is not None:
            self.logger.put_line(
                f"[Epoch/Step : {self.clock.epoch}/{self.clock.step}]: {s}")

    def record_scalars(self, values: dict, mode: str = "train"):
        if self.logger is not None:
            self.logger.scalars(mode, values, self.clock.step)

    # -- deterministic host RNG -------------------------------------------

    def val_rng(self) -> np.random.Generator:
        """Host RNG for validation/vis choices (val frame, novel-view pose),
        keyed on (config seed, clock step) so val metrics are reproducible
        run-to-run — everything device-side is already keyed; the reference
        leaves these on unseeded np.random (trainer_moco_flow.py:415,
        trainer_nerf.py:173)."""
        return np.random.default_rng(
            (int(self.config.seed or 0), int(self.clock.step)))

    # -- train/val entry points (ref base.py:231-249) ---------------------

    def train_func(self):
        """One training step. Metrics come back as device arrays and are only
        pulled to the host on log steps — per-step blocking D2H reads would
        serialize the device queue (and ride the TPU tunnel)."""
        metrics = self.train_step()
        if self._occ_grids:
            self._occ_grids.clear()  # params moved: cached grids are stale
        if self.clock.step % self.config["trainer"].get("log_freq", 100) == 0:
            metrics = {k: float(v) for k, v in metrics.items()}
            self.record_scalars(metrics, "train")
        self.losses = metrics
        return metrics

    def val_func(self):
        metrics = self.val_step()
        if metrics:
            self.record_scalars(metrics, "valid")
        return metrics

    # -- checkpointing (ref base.py:279-327) ------------------------------

    def _ckpt_path(self, name=None) -> str:
        if name is None:
            name = f"epoch{self.clock.epoch}_iter{self.clock.step}"
        return osp.join(self.config.ckpts_dir, name)

    def extra_state(self) -> dict:
        """Subclass hook for JSON-able trainer state persisted in checkpoints."""
        return {}

    def load_extra_state(self, extra: dict) -> None:
        pass

    @staticmethod
    def _opt_named_leaves(opt_state) -> dict:
        """Optimizer state as ``{keystr(path): leaf}`` — named paths (optax
        NamedTuple fields + param-tree keys), so restores survive structural
        drift instead of silently dropping everything."""
        flat = jax.tree_util.tree_flatten_with_path(opt_state)[0]
        return {jax.tree_util.keystr(p): leaf for p, leaf in flat}

    def save_ckpt(self, name=None):
        if not self.is_main:  # process-0-only (ref base.py:279 @master_process)
            return
        tree = {"params": self.params}
        if self.opt_state is not None:
            tree["opt_named"] = {
                k: np.asarray(v)
                for k, v in self._opt_named_leaves(self.opt_state).items()}
        save_checkpoint(self._ckpt_path(name), tree,
                        extra={"clock": self.clock.make_checkpoint(),
                               **self.extra_state()})
        self.record_str(f"saved checkpoint {self._ckpt_path(name)}")

    def _restore_opt_state(self, tree) -> None:
        if "opt_named" in tree:
            loaded = tree["opt_named"]
            paths, treedef = jax.tree_util.tree_flatten_with_path(
                self.opt_state)
            out, missed = [], 0
            for path, cur in paths:
                k = jax.tree_util.keystr(path)
                v = loaded.get(k)
                if v is not None and getattr(v, "shape", None) == \
                        getattr(cur, "shape", None):
                    out.append(jnp.asarray(v).astype(cur.dtype)
                               if hasattr(cur, "dtype") else v)
                else:
                    out.append(cur)
                    missed += 1
            self.opt_state = jax.tree_util.tree_unflatten(treedef, out)
            if missed:
                self.record_str(
                    f"optimizer state: {missed}/{len(paths)} leaves not in "
                    "checkpoint (kept at init, strict=False)")
            return
        if "opt" in tree:  # legacy anonymous-leaves format
            loaded = tree["opt"]["leaves"]
            treedef = jax.tree_util.tree_structure(self.opt_state)
            cur = jax.tree_util.tree_leaves(self.opt_state)
            if len(loaded) == len(cur):
                leaves = [jnp.asarray(l).astype(c.dtype) if hasattr(c, "dtype")
                          else l for l, c in zip(loaded, cur)]
                self.opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
            else:
                self.record_str("optimizer state in checkpoint does not match; "
                                "skipping (strict=False)")

    def load_ckpt(self, path, restore_clock=True, restore_optimizer=True):
        tree, extra = load_checkpoint(path)
        self.params = merge_into(self.params, tree.get("params", tree))
        if restore_optimizer and self.opt_state is not None:
            self._restore_opt_state(tree)
        if restore_clock and "clock" in extra:
            self.clock.restore_checkpoint(extra["clock"])
        self.load_extra_state(extra)
        self.record_str(f"loaded checkpoint {path}")

    def auto_resume(self):
        """Resume from the newest checkpoint of this experiment
        (ref train.py:22-29)."""
        pattern = osp.join(self.config.save_dir, self.config.exp_name,
                           "*", "ckpts", "*.npz")
        latest = find_latest_checkpoint(pattern)
        if latest:
            self.load_ckpt(latest)
        if self.config.resume:
            self.load_ckpt(self.config.resume)

    # -- chunked full-image rendering -------------------------------------

    def _chunk_render_fn(self, rcfg: RenderConfig, chunk: int):
        key_ = (rcfg, chunk)
        if key_ not in self._render_fns:
            statics = self.statics
            mesh = self.mesh

            def body(params, anneal, rays_tiles, bkgd_tiles, key):
                def one(args):
                    rays, bkgd = args
                    return render_rays(params, statics, anneal, rays, bkgd,
                                       key, rcfg)
                return jax.lax.map(one, (rays_tiles, bkgd_tiles))

            if mesh is not None and int(np.prod(mesh.devices.shape)) > 1:
                # shard the tile axis across the mesh: rays are embarrassingly
                # parallel, so test-time render scales linearly with chips
                from jax import shard_map
                from jax.sharding import PartitionSpec as P
                from ..parallel.mesh import DATA_AXIS
                fn = jax.jit(shard_map(
                    body, mesh=mesh,
                    in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P()),
                    out_specs=P(DATA_AXIS), check_vma=False))
            else:
                fn = jax.jit(body)
            self._render_fns[key_] = fn
        return self._render_fns[key_]

    def _tile_render_fn(self, rcfg: RenderConfig):
        """One jitted single-tile render; jax.jit shape-specializes per tile
        size, so variable tail tiles reuse this one cache entry."""
        key_ = (rcfg, "tile")
        if key_ not in self._render_fns:
            statics = self.statics

            def one(params, anneal, rays, bkgd, key):
                return render_rays(params, statics, anneal, rays, bkgd,
                                   key, rcfg)

            self._render_fns[key_] = jax.jit(one)
        return self._render_fns[key_]

    def render_rays_chunked(self, rays, background, rcfg: RenderConfig,
                            anneal=None, chunk: int | None = None,
                            key=None) -> dict:
        """Render any number of rays with bounded memory (the jitted analog
        of the reference's Python chunk loop, trainer_moco_flow.py:196-224).
        ``chunk`` defaults to the config's ``model.chunk`` (the reference's
        render-tile knob; 16384 measured fastest on v5e, PERF.md).

        Single-chip: a Python loop dispatches one compiled tile fn per
        chunk, padding only the TAIL chunk, and only up to the next
        power-of-two bucket (>=2048) — so masked renders
        (render_masked_image), whose kept-ray count varies per frame, waste
        <= one bucket of compute instead of up to a whole chunk, and each
        new count costs at most one small-bucket compile rather than a new
        multi-tile program. Multi-chip: pad to a full chunk multiple and
        ``lax.map`` over fixed-size tiles with the tile axis sharded across
        the mesh."""
        if chunk is None:
            chunk = int(self.config["model"].get("chunk", 16384))
        if key is None:
            key = jax.random.key(0)
        n = rays.shape[0]
        if n == 0:
            # reachable via render_masked_image when occupancy proves EVERY
            # ray empty (empty_frac == 1.0): render one well-formed dummy
            # ray to learn the rcfg-dependent output keys/shapes, return
            # 0-length slices (callers composite pure background)
            dummy = np.zeros((1, rays.shape[1]), np.float32)
            dummy[0, 5] = -1.0   # d = (0, 0, -1)
            dummy[0, 6], dummy[0, 7] = 1.0, 2.0  # near, far
            out = self.render_rays_chunked(
                jnp.asarray(dummy), jnp.ones((1, 3)), rcfg,
                anneal=anneal, chunk=chunk, key=key)
            return {k: (v[:0] if getattr(v, "ndim", 0) >= 1 else v)
                    for k, v in out.items()}
        # single chip, ray count an exact tile multiple (every full frame):
        # fall through to the one-dispatch lax.map program below instead of
        # the per-tile host loop — per-ray outputs are the same tiles in the
        # same order, and the per-chunk consensus scalars average over equal
        # tiles, so both paths agree (the loop path remains for tail/bucket
        # shapes and is the cross-check in tests/test_render.py)
        if self.world_size <= 1 and (n <= chunk or n % chunk != 0):
            fn = self._tile_render_fn(rcfg)
            bg = background if background is not None else jnp.ones((n, 3))
            outs = []
            i = 0
            while i < n:
                rows = min(chunk, n - i)
                bucket = rows if rows == chunk else \
                    min(chunk, max(2048, 1 << (rows - 1).bit_length()))
                tile = rays[i:i + rows]
                bgt = bg[i:i + rows]
                if bucket > rows:
                    tile = jnp.concatenate(
                        [tile, jnp.broadcast_to(tile[-1:],
                                                (bucket - rows,
                                                 tile.shape[1]))])
                    bgt = jnp.concatenate(
                        [bgt, jnp.broadcast_to(bgt[-1:],
                                               (bucket - rows, 3))])
                outs.append((rows, fn(self.params, anneal or {}, tile, bgt,
                                      key)))
                i += rows
            flat = {}
            for k, v0 in outs[0][1].items():
                if v0.ndim >= 1:  # per-ray output
                    flat[k] = (jnp.concatenate([o[k][:r] for r, o in outs])
                               if len(outs) > 1 else v0[:n])
                else:
                    # per-chunk scalars (consensus terms): average weighted
                    # by REAL ray count so a small tail bucket doesn't get a
                    # full chunk's vote (the tail's padded duplicate rays
                    # still enter its own masked mean — an approximation
                    # documented here; training never takes this path, the
                    # train step is one unchunked jit)
                    if len(outs) > 1:
                        w = jnp.asarray([r for r, _ in outs], jnp.float32)
                        flat[k] = (jnp.stack([o[k] for _, o in outs])
                                   * w).sum() / w.sum()
                    else:
                        flat[k] = v0
            return flat
        # Multi-chip: don't let the fixed chunk knob amplify small ray sets —
        # padding n=576 test-frame rays to chunk(16384) x 8 devices is a 227x
        # work blowup that starved the XLA:CPU collective rendezvous in the
        # fake-mesh tests (and wastes real chips on small masked views). One
        # tile per device is already full parallelism, so cap the tile at the
        # per-device share, rounded up to 8 rows (TPU sublane alignment).
        per_dev = -(-n // max(self.world_size, 1))
        chunk = min(chunk, max(8, -(-per_dev // 8) * 8))
        pad = (-n) % chunk
        rays_p = jnp.concatenate(
            [rays, jnp.broadcast_to(rays[-1:], (pad, rays.shape[1]))]) if pad else rays
        bg = background if background is not None else jnp.ones((n, 3))
        bg_p = jnp.concatenate(
            [bg, jnp.broadcast_to(bg[-1:], (pad, 3))]) if pad else bg
        tiles = rays_p.reshape(-1, chunk, rays_p.shape[1])
        bg_tiles = bg_p.reshape(-1, chunk, 3)
        n_tiles = tiles.shape[0]
        if self.world_size > 1:  # tile axis is sharded across the mesh
            tpad = (-n_tiles) % self.world_size
            if tpad:
                tiles = jnp.concatenate(
                    [tiles, jnp.broadcast_to(tiles[-1:],
                                             (tpad, *tiles.shape[1:]))])
                bg_tiles = jnp.concatenate(
                    [bg_tiles, jnp.broadcast_to(bg_tiles[-1:],
                                                (tpad, chunk, 3))])
        out = self._chunk_render_fn(rcfg, chunk)(
            self.params, anneal or {}, tiles, bg_tiles, key)
        flat = {}
        for k, v in out.items():
            v = v[:n_tiles]
            if v.ndim >= 2 and v.shape[1] == chunk:
                vv = v.reshape(-1, *v.shape[2:])[:n]
            else:  # per-chunk scalars (consensus terms): average
                vv = jnp.mean(v)
            flat[k] = vv
        return flat

    def evaluate_sequence(self, max_frames: int | None = None,
                          chunk: int = 16384) -> dict:
        """Mean PSNR/SSIM (and the reference's dssim) over the validation
        sequence — the quantities the reference computes but never publishes
        (SURVEY.md §6, models/metrics.py)."""
        from ..nn import lpips as lpips_mod
        from ..nn.metrics import dssim, psnr, ssim
        ds = self.val_dataset
        # evaluate with the TEST-time render config (deterministic sampling,
        # and the only config where the fine_budget / coarse_probe knobs are
        # live — rcfg_val would silently ignore them)
        rcfg = (getattr(self, "rcfg_test", None)
                or getattr(self, "rcfg_val", None) or self.rcfg_train)
        n = ds.num_frames if max_frames is None else min(max_frames,
                                                         ds.num_frames)
        lp_weights = None
        if lpips_mod.available():
            lp_weights = lpips_mod.load_weights()
        psnrs, ssims, dssims, lpipss = [], [], [], []
        for idx in range(n):
            rays, _ = ds.frame_rays(idx)
            rgbs = ds.frame_rgbs(idx)
            if rgbs is None:
                continue
            rays = self.tighten_rays(rays, idx, size=ds.size)
            res = self.render_rays_chunked(rays, ds.bkgd_img, rcfg,
                                           anneal=self.anneal(), chunk=chunk)
            typ = "rgb_fine" if "rgb_fine" in res else "rgb_coarse"
            h, w = ds.size
            pred = res[typ].reshape(h, w, 3).transpose(2, 0, 1)[None]
            gt = rgbs.reshape(h, w, 3).transpose(2, 0, 1)[None]
            psnrs.append(float(psnr(res[typ], rgbs)))
            ssims.append(float(ssim(pred, gt)))
            dssims.append(float(dssim(pred, gt)))
            if lp_weights is not None:
                lpipss.append(float(lpips_mod.lpips(
                    lp_weights, jnp.asarray(pred), jnp.asarray(gt))[0]))
        out = {"psnr": float(np.mean(psnrs)) if psnrs else float("nan"),
               "ssim": float(np.mean(ssims)) if ssims else float("nan"),
               "dssim": float(np.mean(dssims)) if dssims else float("nan"),
               "frames": len(psnrs)}
        if lpipss:
            out["lpips"] = float(np.mean(lpipss))
        if rcfg.fine_budget or rcfg.coarse_probe:
            # approximate-sampling knobs were live for these metrics — say so
            # in the result instead of leaving it to config archaeology
            out["eval_fine_budget"] = rcfg.fine_budget
            out["eval_coarse_probe"] = rcfg.coarse_probe
        return out

    # -- occupancy-grid empty-space skipping (render/occupancy.py) ---------

    @property
    def occ_cfg(self) -> dict:
        m = self.config["model"]
        return {"resolution": int(m.get("occ_res", 0)),
                "threshold": float(m.get("occ_threshold", 5.0)),
                "supersample": int(m.get("occ_supersample", 2)),
                # <= 0 = auto: cover the hull of the frame's ray segments so
                # no tighten-time probe leaves the grid (the bound then
                # rests entirely on the measured inner lattice). Rays that
                # DO escape the grid (explicit small extent, or novel poses
                # reusing a cached frame grid) read the coarse measured
                # outer_sig bound within 2x extent and +inf beyond it —
                # conservative: skipping degrades or turns off, never
                # silently drops visible rays
                "extent": float(m.get("occ_extent", 0.0)),
                "tau": float(m.get("occ_tau", 1e-3)),
                # 1 (default): rewrite near/far to the occupied interval.
                # 0: keep original bounds and ONLY drop provably-empty rays —
                # the fixed-sample-count kernels gain NO speed from shorter
                # intervals (static shapes), and redistributing samples moves
                # kept rays off the exact reference image; with tightening
                # off, kept rays render BIT-IDENTICALLY to the exact render
                # and total error is tau-bounded on the skipped rays alone
                # (measured: exact+occ dB-vs-exact 48.7 -> 61+, same speed)
                "tighten": bool(int(m.get("occ_tighten", 1))),
                # auto = the on-device jitted tightener (zero host numpy in
                # the timed render loop); "host" = the original numpy path
                # (fallback + cross-check oracle, tests/test_occupancy.py)
                "impl": str(m.get("occ_impl", "auto")),
                # direct (default): evaluate sigma(bw_warp(x)) on the full
                # per-frame lattice. warp: pull the CANONICAL grid's bound
                # back through the frame's bw warp — ~4-5x cheaper per
                # frame (training-pose videos build one grid per frame),
                # same lattice-empirical conservativeness
                # (render/occupancy.py::build_occupancy_grid)
                "builder": str(m.get("occ_builder", "direct"))}

    def _occ_auto_extent(self, frame_idx: int) -> float:
        """Half-width of the cube covering every sample point of the frame's
        rays: |o + d t| is per-coordinate linear in t, so the segment max
        is attained at the near/far endpoints."""
        rays, _ = self.val_dataset.frame_rays(max(int(frame_idx), 0))
        r = np.asarray(rays)
        o, d = r[:, 0:3], r[:, 3:6]
        ends = np.stack([o + d * r[:, 6:7], o + d * r[:, 7:8]])
        return float(np.abs(ends).max()) * 1.05  # one-cell-ish margin

    def occupancy_grid(self, frame_idx: int):
        """Cached per-frame observation-space occupancy grid (canonical for
        frame -1); reused across every view of the frame."""
        rcfg = getattr(self, "rcfg_test", None)
        if rcfg is not None and rcfg.activation == "softplus":
            # The tau bound integrates sigma over REAL segment lengths, but
            # the renderer's infinite catch-all delta on the last sample
            # (reference rendering.py:158-160 parity) saturates alpha to 1
            # whenever the far sample's sigma > 0 — and softplus(raw) > 0
            # EVERYWHERE. Every ray then has opacity 1 and the far sample's
            # color; 'provably empty' does not exist and tightening `far`
            # moves the catch-all sample (measured: a 'skipped' ray can
            # differ from the exact render by 0.64 rgb). Under relu, empty
            # space has sigma exactly 0 and the bound is sound.
            raise ValueError(
                "occupancy-grid skipping (occ_res > 0) requires "
                "nerf_activate_type: relu — under softplus the renderer's "
                "infinite last-sample delta saturates every ray to opacity "
                "1, so no ray is provably empty (see PARITY.md)")
        key = int(frame_idx)
        if key not in self._occ_grids:
            from ..render.occupancy import build_occupancy_grid
            c = self.occ_cfg
            extent = (c["extent"] if c["extent"] > 0
                      else self._occ_auto_extent(frame_idx))
            cano = None
            if (c["builder"] == "warp" and key != -1
                    and "bw_NoF" in self.params):
                cano = self.occupancy_grid(-1)  # built once, direct
            self._occ_grids[key] = build_occupancy_grid(
                self, frame_idx, resolution=c["resolution"],
                supersample=c["supersample"], threshold=c["threshold"],
                extent=extent, builder=c["builder"], cano_grid=cano)
        return self._occ_grids[key]

    def tighten_rays(self, rays, frame_idx: int, size=None):
        """Rewrite rays' near/far to the occupied depth interval when the
        ``occ_res`` knob is on (0 = off, exact bounds). Also stashes the
        per-ray provably-empty mask (see :meth:`occ_keep_mask`). With
        ``occ_tighten: 0`` the bounds are left untouched and only the empty
        mask is produced (see :meth:`occ_cfg`)."""
        if self.occ_cfg["resolution"] <= 0:
            return rays
        grid = self.occupancy_grid(frame_idx)
        size = size or self._infer_view_size(rays.shape[0])
        if self.occ_cfg["impl"] == "host":
            from ..render.occupancy import tighten_ray_bounds
            out, stats = tighten_ray_bounds(grid, np.asarray(rays), size,
                                            tau_eps=self.occ_cfg["tau"])
            self._occ_keep = ~stats.pop("empty_mask")
            stats["kept_count"] = int(self._occ_keep.sum())
            self._occ_stats = stats
            if not self.occ_cfg["tighten"]:
                return jnp.asarray(rays, jnp.float32)
            return jnp.asarray(out)
        from ..render.occupancy import tighten_ray_bounds_jax
        out, stats = tighten_ray_bounds_jax(grid, rays, size,
                                            tau_eps=self.occ_cfg["tau"])
        self._occ_keep = jnp.logical_not(stats.pop("empty_mask"))
        self._occ_stats = stats
        if not self.occ_cfg["tighten"]:
            return jnp.asarray(rays, jnp.float32)
        return out

    def _infer_view_size(self, n_rays: int):
        """(h, w) for a full-frame ray batch: the val size, or an integer
        multiple of it (frame_rays_scaled renders production-size frames
        from the same camera). Ambiguous counts must pass ``size=``."""
        h0, w0 = self.val_dataset.size
        if n_rays == h0 * w0:
            return (h0, w0)
        s = round((n_rays / (h0 * w0)) ** 0.5)
        if s >= 1 and h0 * s * w0 * s == n_rays:
            return (h0 * s, w0 * s)
        raise ValueError(
            f"cannot infer (h, w) for {n_rays} rays from val size "
            f"({h0}, {w0}); pass size= explicitly")

    def occ_keep_mask(self):
        """Bool (n_rays,) mask from the LAST :meth:`tighten_rays` call:
        True where the ray's optical-depth upper bound exceeds ``occ_tau``.
        Rays that are False composite to background within ~occ_tau of the
        exact pixel and can skip rendering entirely (render_masked_image).
        None when occupancy is off."""
        if self.occ_cfg["resolution"] <= 0:
            return None
        return getattr(self, "_occ_keep", None)

    def prepare_view(self, rays, frame_idx: int, extra_mask=None, size=None,
                     skip: bool = True):
        """Dispatch a view's occupancy tighten + keep-mask programs WITHOUT
        reading anything back; returns an opaque handle for
        :meth:`commit_view`. Preparing view i+1 before committing view i
        lets the kept-count device->host readback (the only per-view host
        sync in the skip path; a ~28 ms round trip on the tunneled backend)
        overlap the previous view's device render — see
        :meth:`render_views_pipelined`. ``skip=False`` tightens depth bounds
        but renders every ray."""
        rays_t = self.tighten_rays(rays, frame_idx, size=size)
        keep = self.occ_keep_mask() if skip else None
        count = None
        if keep is not None:
            # carried so commit_view syncs on ONE scalar, never the mask
            count = (self._occ_stats or {}).get("kept_count")
            if extra_mask is not None:
                keep = jnp.logical_and(jnp.asarray(keep),
                                       jnp.asarray(extra_mask))
                count = jnp.sum(keep)
            elif count is None:
                count = jnp.sum(jnp.asarray(keep))
        return (rays_t, keep, extra_mask, count)

    def commit_view(self, handle, background, rcfg: RenderConfig,
                    anneal=None, chunk: int = 16384) -> dict:
        """Read the prepared view's kept-ray COUNT (the one host sync — a
        scalar, not the mask) and dispatch its render. Returns the
        render-output dict (device arrays — not yet fetched)."""
        rays_t, keep, extra_mask, count = handle
        if keep is None:
            if extra_mask is not None:
                em = np.asarray(extra_mask)
                return self.render_masked_image(rays_t, em, background, rcfg,
                                                anneal=anneal, chunk=chunk,
                                                count=int(em.sum()))
            return self.render_rays_chunked(rays_t, background, rcfg,
                                            anneal=anneal, chunk=chunk)
        # prepare_view already folded extra_mask into keep (on device)
        return self.render_masked_image(rays_t, keep, background, rcfg,
                                        anneal=anneal, chunk=chunk,
                                        count=int(count))

    def render_views_pipelined(self, jobs, rcfg: RenderConfig, anneal=None,
                               chunk: int = 16384, skip: bool = True):
        """Render a sequence of views with one view of lookahead: view
        i+1's tighten/keep programs are dispatched before view i's mask
        readback + render dispatch, so every host round trip overlaps
        device execution (double buffering; on the tunneled backend this
        removed the per-view ~28 ms serial stall of the occ skip path).

        ``jobs``: iterable of ``(rays, frame_idx, background)`` or
        ``(rays, frame_idx, background, extra_mask)``. Yields the views'
        render-output dicts in order; outputs are device arrays, so a
        caller that also lags its own np.asarray() fetch by one view
        overlaps the image readback too (train/vis.py does).

        When occupancy skipping is live on a single chip (and
        ``model.masked_render`` is not ``loop``), the stream additionally
        PACKS kept rays across views into shared fixed-size render
        segments (render/packed.py): tile padding is paid once per stream
        instead of once per view, and per-kept-count render compiles
        disappear. Outputs are bit-identical to the per-view path
        (tests/test_occupancy.py); a view's dict is yielded as soon as the
        segment holding its last kept ray has rendered, so yields lag by
        up to one segment (~16k kept rays) instead of exactly one view."""
        impl = str(self.config["model"].get("masked_render", "fused"))
        packed_ok = (skip and self.world_size <= 1 and impl != "loop"
                     and self.occ_cfg["resolution"] > 0)
        it = iter(jobs)
        prev = None
        prev_bg = None
        if not packed_ok:
            for job in it:
                rays, frame_idx, bg = job[0], job[1], job[2]
                extra = job[3] if len(job) > 3 else None
                nxt = self.prepare_view(rays, frame_idx, extra_mask=extra,
                                        skip=skip)
                if prev is not None:
                    yield self.commit_view(prev, prev_bg, rcfg,
                                           anneal=anneal, chunk=chunk)
                prev, prev_bg = nxt, bg
            if prev is not None:
                yield self.commit_view(prev, prev_bg, rcfg, anneal=anneal,
                                       chunk=chunk)
            return

        from ..render.packed import PackedStream
        stream: PackedStream | None = None

        def commit_packed(handle, bg):
            """One view into the packed stream (or the per-view fallback
            when no keep mask was produced); returns completed views."""
            nonlocal stream
            rays_t, keep, _extra, count = handle
            ready: list[dict] = []
            if keep is None:  # defensive: occupancy produced no mask
                if stream is not None:
                    ready += stream.flush()
                    stream = None
                ready.append(self.commit_view(handle, bg, rcfg,
                                              anneal=anneal, chunk=chunk))
                return ready
            n, rc = rays_t.shape[0], rays_t.shape[1]
            if stream is not None and (stream.n != n or stream.rc != rc):
                ready += stream.flush()  # shape change: new stream
                stream = None
            if stream is None:
                if not hasattr(self, "_key0"):
                    self._key0 = jax.random.key(0)
                stream = PackedStream(self, rcfg, anneal or {}, n, rc,
                                      key=self._key0)
            # count stays a DEVICE scalar: the stream reads counts back in
            # batches (render/packed.py), so no per-view host sync remains
            ready += stream.add_view(rays_t, keep, count, bg)
            return ready

        for job in it:
            rays, frame_idx, bg = job[0], job[1], job[2]
            extra = job[3] if len(job) > 3 else None
            nxt = self.prepare_view(rays, frame_idx, extra_mask=extra,
                                    skip=skip)
            if prev is not None:
                yield from commit_packed(prev, prev_bg)
            prev, prev_bg = nxt, bg
        if prev is not None:
            yield from commit_packed(prev, prev_bg)
        if stream is not None:
            yield from stream.flush()

    def _masked_render_fused_fn(self, rcfg: RenderConfig, n_tiles: int,
                                tile: int):
        """ONE jitted program for a whole masked view: in-graph keep-mask
        compaction (``jnp.nonzero(size=capacity)``), ``lax.map`` render over
        fixed tiles, and in-graph scatter/composite back to the full frame.
        Replaces the ~35 eager host dispatches per view of the loop path
        (host flatnonzero, per-bucket slices/pad-concats/jit calls, output
        concats, scatter composites) with a single dispatch — the occupancy
        render axis was measured 20% device-busy under the loop
        (scripts/profile_hotpath.py --mode occ_student, PERF.md round 4).
        Capacity is static per compile; the caller buckets the kept count to
        ``n_tiles`` x ``tile`` and pads with duplicate rays whose scatter
        indices are out of range (``mode='drop'``)."""
        key_ = (rcfg, n_tiles, tile, "fused_masked")
        if key_ not in self._render_fns:
            statics = self.statics

            def fused(params, anneal, rays, keep, background, key):
                n = rays.shape[0]
                cap = n_tiles * tile
                idx = jnp.nonzero(keep, size=cap, fill_value=n)[0]
                safe = jnp.minimum(idx, n - 1)
                sub_rays = jnp.take(rays, safe, axis=0)
                sub_bg = jnp.take(background, safe, axis=0)

                def one(args):
                    r, b = args
                    return render_rays(params, statics, anneal, r, b, key,
                                       rcfg)

                res = jax.lax.map(
                    one, (sub_rays.reshape(n_tiles, tile, rays.shape[1]),
                          sub_bg.reshape(n_tiles, tile, 3)))
                typ = "fine" if "rgb_fine" in res else "coarse"
                opacity = res[f"opacity_{typ}"].reshape(cap)
                rgb = res[f"rgb_{typ}"].reshape(cap, 3)
                depth = res[f"depth_{typ}"].reshape(cap)
                # ref trainer_moco_flow.py:226-268 composite semantics:
                # foreground where opacity > 0, background elsewhere;
                # depth 10 outside the mask, 8 inside-but-empty
                fg = opacity > 0
                rgb_vals = jnp.where(fg[:, None], rgb, sub_bg)
                depth_vals = jnp.where(fg, depth, 8.0)
                rgb_full = jnp.asarray(background).at[idx].set(
                    rgb_vals, mode="drop")
                depth_full = jnp.full((n,), 10.0).at[idx].set(
                    depth_vals, mode="drop")
                opa_full = jnp.zeros((n,)).at[idx].set(opacity, mode="drop")
                return {f"rgb_{typ}": rgb_full, f"depth_{typ}": depth_full,
                        f"opacity_{typ}": opa_full}

            self._render_fns[key_] = jax.jit(fused)
        return self._render_fns[key_]

    def render_masked_image(self, rays, mask, background, rcfg: RenderConfig,
                            anneal=None, chunk: int = 16384,
                            count: int | None = None) -> dict:
        """Render only hull-masked rays, scatter back, composite with the
        background (ref trainer_moco_flow.py:226-268 semantics: foreground
        where opacity > 0, background elsewhere; depth 10 outside the hull,
        8 inside-but-empty).

        Default impl is the single-dispatch fused program above, keyed off
        ``count`` (kept-ray total) so a device-resident ``mask`` never needs
        a full readback — pass ``count`` when you have it (commit_view
        does; it falls back to summing the mask host-side otherwise).
        INVARIANT: ``count`` must equal the mask's true population — the
        in-graph ``jnp.nonzero(size=cap)`` compaction silently truncates if
        it is smaller, rendering truncated rays as background (checked under
        jax debug_nans mode, the trainer's cheap-asserts flag).
        ``model.masked_render: loop`` selects the original host bucket loop
        (the multi-chip path and the fused path's cross-check oracle,
        tests/test_occupancy.py::test_masked_render_fused_matches_loop)."""
        impl = str(self.config["model"].get("masked_render", "fused"))
        if count is None:
            count = int(np.asarray(mask).sum())
        else:
            count = int(count)
            if jax.config.jax_debug_nans:  # debug builds verify the invariant
                true_count = int(np.asarray(mask).sum())
                assert count >= true_count, (
                    f"render_masked_image: count={count} < mask population "
                    f"{true_count}; kept rays would silently render as "
                    "background")
        if impl == "fused" and self.world_size <= 1 and count > 0:
            if count > 4096:
                tile, n_tiles = 4096, -(-count // 4096)
            else:  # small views: one power-of-two tile (same floor as the
                # loop path's buckets)
                tile, n_tiles = max(2048,
                                    1 << (count - 1).bit_length()), 1
            fn = self._masked_render_fused_fn(rcfg, n_tiles, tile)
            if not hasattr(self, "_key0"):
                self._key0 = jax.random.key(0)
            return fn(self.params, anneal or {}, jnp.asarray(rays),
                      jnp.asarray(mask), jnp.asarray(background), self._key0)
        mask = np.asarray(mask)
        idx = np.flatnonzero(mask)
        sel = jnp.asarray(idx)
        res = self.render_rays_chunked(rays[sel], background[sel], rcfg,
                                       anneal=anneal, chunk=chunk)
        typ = "fine" if "rgb_fine" in res else "coarse"
        n = rays.shape[0]
        opacity = res[f"opacity_{typ}"]
        fg = opacity > 0

        rgb_full = jnp.asarray(background)
        rgb_vals = jnp.where(fg[:, None], res[f"rgb_{typ}"], background[sel])
        rgb_full = rgb_full.at[sel].set(rgb_vals)

        depth_full = jnp.full((n,), 10.0)
        depth_vals = jnp.where(fg, res[f"depth_{typ}"], 8.0)
        depth_full = depth_full.at[sel].set(depth_vals)
        return {f"rgb_{typ}": rgb_full, f"depth_{typ}": depth_full,
                f"opacity_{typ}": jnp.zeros((n,)).at[sel].set(opacity)}
