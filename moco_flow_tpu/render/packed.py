"""Cross-view packed masked rendering (round-5 render-glue elimination).

The per-view fused masked render (train/base.py::_masked_render_fused_fn)
quantizes each view's kept rays up to 4096-ray tiles (11.6k kept rays ->
3 x 4096 = up to 25% padded compute in the last tile) and compiles one
render program per kept-count bucket. This module replaces it for STREAMS
of views (video / orbit renders, the bench occ axes): kept rays from
consecutive views are packed back-to-back into one device-resident buffer
and rendered in fixed 16384-ray segments — the measured-fastest render
tile (PERF.md round 2) — so tile padding is paid once per STREAM (the
final flush) instead of once per view, and the render-program compile
inventory collapses to ONE program regardless of per-view kept counts
(compiles cost 2-300 s on the tunneled backend, CLAUDE.md pitfall 5).

Reference behavior being generalized: the test renderer only evaluates
hull-masked rays and composites the rest to background
(trainer_moco_flow.py:226-268); packing is the TPU-native static-shape
replacement for its boolean indexing, one level up from the per-view
in-graph compaction.

Soundness: test-time ``render_rays`` is row-independent (per-ray sampling,
warps, composite; no cross-ray reductions), so rays from different views
render identically in shared segments — asserted bit-exactly against the
per-view fused path in tests/test_occupancy.py.

Everything stays on device, INCLUDING the stream offset: appends chain a
device ``fill`` scalar (the kept count is recomputed in-graph), so a view
joins the buffer with zero host syncs. Kept counts are read back in
BATCHES of ``sync_every`` views in ONE stacked transfer — the round-4
per-view readback gated the next view's drain dispatch, idling the device
~28 ms per view on the tunneled backend (measured: exact+occ 591k vs the
37%-higher readback-free bound). Host ``fill``/``pos`` mirrors update at
sync points; drains are dispatched then. All jitted programs are cached
in the trainer's ``_render_fns`` dict so they persist across streams.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

import jax
import jax.numpy as jnp

from .volume import RenderConfig, render_rays

SEG = 16384      # render segment rows: measured-fastest chunk (PERF.md)
WINDOW = 16      # in-flight view slots in the scatter-target buffer
SYNC_EVERY = 8   # views per batched kept-count sync (8 measured +22% on
                 # the exact+occ leg vs 4 — fewer sync points = fewer
                 # dispatch-stall windows on the tunneled backend)


@dataclasses.dataclass
class _View:
    slot: int
    end: int | None  # cumulative kept rays after this view; None = unsynced


class PackedStream:
    """Packs kept rays of successive same-shape views into one device
    buffer; renders in fixed segments; scatters composited pixels into a
    windowed per-view output buffer. Views complete in input order."""

    def __init__(self, trainer, rcfg: RenderConfig, anneal, n_rays: int,
                 ray_cols: int, key=None, seg: int = SEG,
                 window: int = WINDOW, sync_every: int = SYNC_EVERY):
        self.trainer = trainer
        self.statics = trainer.statics
        self.rcfg = rcfg
        self.anneal = anneal or {}
        self.n = int(n_rays)
        self.rc = int(ray_cols)
        self.seg = int(seg)
        self.w = int(window)
        self.b = max(int(sync_every), 1)
        # cap the un-synced append backlog by BYTES, not view count: the
        # packed buffer holds b views of n rows x (rc+3) f32, and a video
        # frame at production scale (1M+ rays) with the default b=8/w=16
        # allocated ~1.3 GB (+ roll temporaries) and RESOURCE_EXHAUSTED the
        # shared chip (round-5 bench). Big views sync a little more often;
        # the async count reads keep that cheap.
        view_bytes = self.n * (self.rc + 3) * 4
        max_bytes = int(os.environ.get("MOCO_PACK_BYTES",
                                       400 * 1024 * 1024))
        self.b = max(1, min(self.b, max_bytes // max(view_bytes, 1)))
        self.w = min(self.w, max(2 * self.b, 4))
        self.key = key if key is not None else jax.random.key(0)
        # room for one full segment's backlog plus up to ``sync_every``
        # un-synced appends of n rows each
        buf_rows = self.b * self.n + self.seg
        self._buf = jnp.zeros((buf_rows, self.rc + 3), jnp.float32)
        self._dest = jnp.full((buf_rows,), self.w * self.n, jnp.int32)
        self._out_rgb = jnp.zeros((self.w * self.n, 3), jnp.float32)
        self._out_depth = jnp.zeros((self.w * self.n,), jnp.float32)
        self._out_opa = jnp.zeros((self.w * self.n,), jnp.float32)
        # drain segment sizes, largest first: steady-state drains use
        # ``seg``; the flush tail drains in seg//4 steps so a short stream's
        # one padded render wastes <seg//4 rows, not <seg (2 compiled drain
        # programs total, cached across streams)
        self.sizes = sorted({self.seg, max(self.seg // 4, 1)}, reverse=True)
        self.fill = 0      # SYNCED live (unrendered) buffer rows
        self.pos = 0       # SYNCED stream rows appended
        self.drained = 0   # stream rows rendered
        self._fill_dev = jnp.int32(0)   # device append offset (all views)
        self._pending: list[tuple[_View, object]] = []  # unsynced counts
        self._views: list[_View] = []  # incomplete views, input order
        self._n_views = 0
        self._typ = "fine" if rcfg.n_importance > 0 else "coarse"

    # -- jitted programs (cached across streams on the trainer) -----------

    def _fns(self):
        key_ = ("packed", self.rcfg, self.n, self.rc, self.seg, self.w)
        cache = self.trainer._render_fns
        if key_ in cache:
            return cache[key_]
        statics, rcfg = self.statics, self.rcfg
        n, rc, seg, w = self.n, self.rc, self.seg, self.w
        oob = w * n  # out-of-range scatter destination (mode='drop')

        def append(buf, dest, fill, rays, keep, bg, slot):
            """Compact one view's kept rays to the front and write them at
            the DEVICE stream offset ``fill`` (contiguous
            dynamic_update_slice — no scatter); returns the advanced
            offset, so appends chain with zero host syncs. Rows past the
            kept count are duplicate real rays whose dest falls outside
            the live [0, fill') region; the drain's fill-mask keeps them
            from ever scattering."""
            idx = jnp.nonzero(keep, size=n, fill_value=n)[0]
            safe = jnp.minimum(idx, n - 1)
            vals = jnp.concatenate(
                [jnp.take(rays, safe, axis=0),
                 jnp.take(bg, safe, axis=0)], axis=1)
            buf = jax.lax.dynamic_update_slice(buf, vals, (fill, 0))
            d = (slot * n + idx).astype(jnp.int32)
            dest = jax.lax.dynamic_update_slice(dest, d, (fill,))
            count = jnp.sum(keep.astype(jnp.int32))
            return buf, dest, fill + count

        def admit(buf, dest, fill, rays, keep, bg, out_rgb, out_depth,
                  out_opa, slot):
            """ONE dispatch per admitted view: slot init (non-kept rays ->
            background / depth 10 / opacity 0, ref trainer_moco_flow.py:
            226-268 semantics) + the kept-ray append. Fused because each
            jitted dispatch costs ~10+ ms of host time on the tunneled
            backend (PERF.md round 5) — two calls per view was the
            second-largest glue term after the count sync."""
            out_rgb = jax.lax.dynamic_update_slice(out_rgb, bg,
                                                   (slot * n, 0))
            out_depth = jax.lax.dynamic_update_slice(
                out_depth, jnp.full((n,), 10.0, jnp.float32), (slot * n,))
            out_opa = jax.lax.dynamic_update_slice(
                out_opa, jnp.zeros((n,), jnp.float32), (slot * n,))
            buf, dest, fill = append(buf, dest, fill, rays, keep, bg, slot)
            return buf, dest, fill, out_rgb, out_depth, out_opa

        def make_drain(sz: int):
            def drain(params, anneal, buf, dest, fill, out_rgb, out_depth,
                      out_opa, key):
                """Render the buffer's first ``sz`` rows and scatter the
                composited pixels to their views' output slots. Rows at/past
                ``fill`` (append padding, flush tail) render as
                wasted-but-harmless duplicates and are masked out of the
                scatter."""
                head = buf[:sz]
                rays, bg = head[:, :rc], head[:, rc:]
                res = render_rays(params, statics, anneal, rays, bg, key,
                                  rcfg)
                typ = "fine" if "rgb_fine" in res else "coarse"
                opacity = res[f"opacity_{typ}"]
                fg = opacity > 0
                rgb_v = jnp.where(fg[:, None], res[f"rgb_{typ}"], bg)
                dep_v = jnp.where(fg, res[f"depth_{typ}"], 8.0)
                live = jnp.arange(sz) < fill
                d = jnp.where(live, dest[:sz], oob)
                out_rgb = out_rgb.at[d].set(rgb_v, mode="drop")
                out_depth = out_depth.at[d].set(dep_v, mode="drop")
                out_opa = out_opa.at[d].set(opacity, mode="drop")
                buf = jnp.roll(buf, -sz, axis=0)
                dest = jnp.roll(dest, -sz)
                return buf, dest, out_rgb, out_depth, out_opa
            return jax.jit(drain)

        def slice_view(out_rgb, out_depth, out_opa, slot):
            r = jax.lax.dynamic_slice(out_rgb, (slot * n, 0), (n, 3))
            dd = jax.lax.dynamic_slice(out_depth, (slot * n,), (n,))
            o = jax.lax.dynamic_slice(out_opa, (slot * n,), (n,))
            return r, dd, o

        fns = {"admit": jax.jit(admit), "slice": jax.jit(slice_view),
               "drain": {sz: make_drain(sz) for sz in self.sizes}}
        cache[key_] = fns
        return fns

    # -- stream API --------------------------------------------------------

    def add_view(self, rays, keep, count, background) -> list[dict]:
        """Append one prepared view (tightened rays + keep mask + kept
        count + per-ray background) and drain any full segments once
        enough counts have synced. ``count`` may be a DEVICE scalar (the
        tighten kernel's kept_count — preferred, it defers the readback)
        or a host int; it must equal the mask's population (same invariant
        as render_masked_image). Returns the output dicts of views that
        just completed, in input order."""
        fns = self._fns()
        slot = self._n_views % self.w
        ready: list[dict] = []
        if any(v.slot == slot for v in self._views):
            # window exhausted (many tiny views in flight): finish and
            # slice them BEFORE the slot's output region is re-initialized
            self._drain_all(fns)
            ready += self._collect(fns)
        bg = jnp.broadcast_to(
            jnp.asarray(background if background is not None else 1.0,
                        jnp.float32), (self.n, 3))
        (self._buf, self._dest, self._fill_dev, self._out_rgb,
         self._out_depth, self._out_opa) = fns["admit"](
            self._buf, self._dest, self._fill_dev,
            jnp.asarray(rays, jnp.float32), jnp.asarray(keep), bg,
            self._out_rgb, self._out_depth, self._out_opa, jnp.int32(slot))
        if not fns.get("_warmed"):
            # compile EVERY drain size now, on the first real view's rows
            # (fill=0 masks all scatters; outputs are discarded). A short
            # warmup stream otherwise only exercises the tail size, and the
            # first steady ``seg`` drain then pays its 10-100 s remote
            # compile inside whatever a caller is timing (the round-5 bench
            # regression: occ axes 435k -> 51k rays/s).
            fns["_warmed"] = True
            for size in self.sizes:
                fns["drain"][size](
                    self.trainer.params, self.anneal, self._buf, self._dest,
                    jnp.int32(0), self._out_rgb, self._out_depth,
                    self._out_opa, self.key)
        view = _View(slot=slot, end=None)
        self._views.append(view)
        self._pending.append((view, count))
        # start the kept-count D2H NOW: by the batched _sync the scalar has
        # ridden the tunnel behind the drains already dispatched, so the
        # sync's np.asarray finds it on host instead of paying the ~28 ms
        # round trip while the device queue runs dry
        if hasattr(count, "copy_to_host_async"):
            try:
                count.copy_to_host_async()
            except Exception:
                pass  # non-jax count (host int) or backend w/o async D2H
        self._n_views += 1
        if len(self._pending) >= self.b:
            self._sync(fns)
        return ready + self._collect(fns)

    def flush(self) -> list[dict]:
        """Render the partial tail segment (the stream's ONE padded render)
        and return every remaining view's outputs."""
        fns = self._fns()
        self._drain_all(fns)
        return self._collect(fns)

    # -- internals ----------------------------------------------------------

    def _sync(self, fns):
        """ONE stacked readback of the pending views' kept counts; update
        the host fill/pos mirrors, dispatch any due segment drains, and
        re-seat the device append offset (drains shifted the buffer)."""
        if not self._pending:
            return
        # each count's D2H was issued async at add_view; these np.asarray
        # calls find the values already on host (or pay one residual wait)
        counts = [int(np.asarray(c)) for _, c in self._pending]
        for (view, _), c in zip(self._pending, counts):
            self.fill += int(c)
            self.pos += int(c)
            view.end = self.pos
        self._pending.clear()
        while self.fill >= self.seg:
            self._drain_one(fns)
        self._fill_dev = jnp.int32(self.fill)

    def _drain_one(self, fns, size: int | None = None):
        size = self.seg if size is None else size
        self._buf, self._dest, self._out_rgb, self._out_depth, \
            self._out_opa = fns["drain"][size](
                self.trainer.params, self.anneal, self._buf, self._dest,
                jnp.int32(self.fill), self._out_rgb, self._out_depth,
                self._out_opa, self.key)
        consumed = min(size, self.fill)
        self.fill -= consumed
        self.drained += consumed

    def _drain_all(self, fns):
        self._sync(fns)
        for size in self.sizes:
            while self.fill >= size:
                self._drain_one(fns, size)
        if self.fill > 0:  # the stream's one padded render, <sizes[-1] waste
            self._drain_one(fns, self.sizes[-1])
        self._fill_dev = jnp.int32(self.fill)

    def _collect(self, fns) -> list[dict]:
        out = []
        while self._views and self._views[0].end is not None \
                and self._views[0].end <= self.drained:
            v = self._views.pop(0)
            r, d, o = fns["slice"](self._out_rgb, self._out_depth,
                                   self._out_opa, jnp.int32(v.slot))
            out.append({f"rgb_{self._typ}": r, f"depth_{self._typ}": d,
                        f"opacity_{self._typ}": o})
        return out
