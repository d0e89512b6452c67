"""Persistent occupancy grid + per-ray depth-bound tightening.

Empty-space skipping for test-time rendering, one level above the
fine-budget/coarse-probe knobs (render/sampling.py): a cached
observation-space occupancy grid per frame concentrates EVERY pass's samples
in the ~20-40% of each ray's [near, far] range that can contain density, so
empty space costs zero NeRF *and* zero NoF evaluations instead of a strided
sigma probe. The reference has no analog — its stratified sampling always
spans the loose AABB-corner near/far (models/rendering.py:244-260 +
utils/camera.py:134-148); this is the TPU-native replacement for the
"skip empty rays" masked-indexing tricks a dynamic-shape framework would
use (SURVEY.md §7 hard-parts).

Pipeline (all static-shape; nothing here recompiles the render fn):
  1. ``build_occupancy_grid``: evaluate sigma (NoF-warped for a frame) on a
     supersampled lattice on-device — reusing train/vis.py::sigma_grid, the
     same evaluator mesh extraction uses — max-pool to the grid resolution,
     threshold, and dilate one cell (conservative).
  2. ``tighten_ray_bounds``: probe the grid along a coarse subgrid of rays
     (spacing auto-clamped to the cell size via the rays' angular pitch),
     take per-pixel [t_min, t_max] over occupied hits, dilate in image
     space, pad by grid cells, upsample, and rewrite the rays' near/far
     columns. Rays that provably hit nothing keep their original bounds
     (their compositing weights are ~0 anyway). Two implementations with
     identical math: :func:`tighten_ray_bounds_jax` (default — one jitted
     on-device program; only the probe-plan scalars are derived host-side,
     so the timed render loop runs zero host numpy over ray-sized arrays)
     and the original :func:`tighten_ray_bounds` numpy path (fallback +
     cross-check oracle, ``model.occ_impl: host``).
  3. Render exactly as before: stratified z sampling already consumes
     per-ray near/far, so the tightened rays flow through the existing
     fused/XLA render paths and compose with fine_budget/coarse_probe.

Error bound: everything excluded — skipped rays and tightened-away ray
segments alike — carries an optical-depth upper bound <= tau_eps
(``occ_tau``, default 1e-3): probes read the 3^3-dilated per-cell max of
the activated density and integrate it along the ray, so the excluded
alpha is <= 1 - exp(-tau_eps). Ray segments OUTSIDE the grid cube read a
MEASURED coarse-lattice bound on the outer region's density
(``OccupancyGrid.outer_sig``) rather than an assumed zero — a field with
real density outside the cube therefore degrades to "cannot skip" instead
of silently dropping visible rays. The whole bound is lattice-empirical
(supersampled max-pool + dilation resolves the field up to sub-cell
features); quality is additionally measured against exact renders on
trained fields in tests/test_occupancy.py and scripts/bench_occupancy.py.

The grid is cheap: 64^3 at 2x supersampling = 2.1M sigma evals, ~2% of one
1080^2 frame render, amortized over every view of that frame (novel-view
orbits, bullet time and eval reuse the cached grid).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class OccupancyGrid:
    """Host-side occupancy over the cube [-extent, extent]^3, index order
    (x, y, z).

    ``sig`` is the per-cell UPPER BOUND of the activated density (max-pooled
    over the supersampled lattice, then 3^3-max dilated) — the quantity the
    tau-integral bound in :func:`tighten_ray_bounds` consumes. ``occ`` is the
    thresholded bool view (stats / hit tests). Grids built directly from a
    bool mask (tests) get ``sig = inf`` inside occupied cells and 0 outside,
    which reduces the tau bound to pure geometry."""
    occ: np.ndarray       # (R, R, R) bool
    extent: float
    threshold: float
    sig: np.ndarray | None = None  # (R, R, R) float32, dilated upper bound
    # activated-sigma bound for probe points OUTSIDE the cube: rays sample
    # [near, far] segments that can leave [-extent, extent]^3, and a field
    # is free to hold density there — assuming zero would let a ray be
    # declared "empty" while passing through visible outside-the-cube
    # density. build_occupancy_grid MEASURES this on a coarse (dilated)
    # shell out to ``outer_extent``; probes BEYOND the measured shell read
    # +inf (unknown — never skippable). Grids built directly from a mask
    # (tests) keep 0.0 / inf defaults = "the field is exactly the grid".
    outer_sig: float = 0.0
    outer_extent: float = float("inf")

    def __post_init__(self):
        if self.sig is None:
            self.sig = np.where(self.occ, np.inf, 0.0).astype(np.float32)

    @property
    def resolution(self) -> int:
        return self.occ.shape[0]

    @property
    def cell(self) -> float:
        return 2.0 * self.extent / self.resolution

    @property
    def occupancy_fraction(self) -> float:
        return float(self.occ.mean())

    def device_sig(self):
        """Flattened ``sig`` as a cached device array (feeds the jitted
        tightener; built lazily so host-only users never touch a device)."""
        if getattr(self, "_device_sig", None) is None:
            import jax.numpy as jnp
            self._device_sig = jnp.asarray(self.sig.reshape(-1))
        return self._device_sig


class DeviceOccupancyGrid:
    """Duck-typed :class:`OccupancyGrid` whose ``sig`` bound LIVES ON
    DEVICE (round-5). The device build (train/vis.py::_grid_builders)
    previously fetched the pooled 28 MB lattice to host only for
    ``device_sig()`` to re-upload it — a pure ~0.8 s/frame round trip over
    the tunneled backend, and a HOST SYNC that serialized every per-frame
    grid build against the render stream. Here the jitted build's outputs
    are kept as device arrays: construction is fully async (a video's
    frame i+1 grid builds while frame i renders, with zero host time), the
    tighten kernel consumes ``device_sig()``/``outer_sig_dev`` directly,
    and host mirrors (``sig``/``occ``/``occupancy_fraction``/``outer_sig``)
    fetch lazily — only diagnostics pay the transfer."""

    def __init__(self, sig_dev, extent: float, threshold: float,
                 outer_sig_dev=None, outer_extent: float = float("inf")):
        self.sig_dev = sig_dev                       # (R, R, R) device f32
        self.extent = float(extent)
        self.threshold = float(threshold)
        self.outer_sig_dev = outer_sig_dev           # 0-d device f32 | None
        self.outer_extent = float(outer_extent)
        self._flat = None
        self._sig_host = None

    @property
    def resolution(self) -> int:
        return int(self.sig_dev.shape[0])

    @property
    def cell(self) -> float:
        return 2.0 * self.extent / self.resolution

    def device_sig(self):
        if self._flat is None:
            self._flat = self.sig_dev.reshape(-1)
        return self._flat

    # -- lazy host mirrors (diagnostics / the host tighten oracle) ---------

    @property
    def sig(self) -> np.ndarray:
        if self._sig_host is None:
            self._sig_host = np.asarray(self.sig_dev, np.float32)
        return self._sig_host

    @property
    def occ(self) -> np.ndarray:
        return self.sig > self.threshold

    @property
    def occupancy_fraction(self) -> float:
        return float(self.occ.mean())

    @property
    def outer_sig(self) -> float:
        return (0.0 if self.outer_sig_dev is None
                else float(self.outer_sig_dev))


def _dilate3d(occ: np.ndarray, steps: int = 1) -> np.ndarray:
    """3-D max-filter dilation by ``steps`` cells (full 3^3 neighborhood),
    pure numpy; works for bool (binary dilation) and float (running max)."""
    out = occ
    reduce = np.logical_or if occ.dtype == bool else np.maximum
    for _ in range(steps):
        p = np.pad(out, 1) if occ.dtype == bool else \
            np.pad(out, 1, constant_values=0.0)
        acc = None
        for dx in (0, 1, 2):
            for dy in (0, 1, 2):
                for dz in (0, 1, 2):
                    s = p[dx:dx + out.shape[0],
                          dy:dy + out.shape[1],
                          dz:dz + out.shape[2]]
                    acc = s.copy() if acc is None else reduce(acc, s)
        out = acc
    return out


def _activate(sig: np.ndarray, rcfg) -> np.ndarray:
    """Raw sigma -> the activated density the renderer integrates
    (softplus keeps negative raw sigma contributing; both are monotone so
    pool-then-activate is exact)."""
    if rcfg is not None and getattr(rcfg, "activation", None) == "softplus":
        return np.logaddexp(sig, 0.0)
    return np.maximum(sig, 0.0)


def build_occupancy_grid(trainer, frame_idx: int, resolution: int = 64,
                         supersample: int = 2, threshold: float = 5.0,
                         extent: float = 1.5, dilate: int = 1,
                         outer_factor: float = 2.0, device: bool = True,
                         builder: str = "direct", cano_grid=None
                         ) -> OccupancyGrid:
    """Occupancy of sigma(bw_warp(x, frame)) (or canonical sigma for
    frame_idx == -1) over [-extent, extent]^3.

    The threshold applies to the ACTIVATED density the renderer integrates
    (relu or softplus per the trainer's test render config) — softplus keeps
    negative raw sigma contributing, so thresholding raw sigma would mark
    genuinely-emitting regions empty.

    ``supersample``: sigma is evaluated on a (resolution*supersample)^3
    lattice and max-pooled, so sub-cell density features set their cell
    occupied (the instant-ngp-style conservative pooling).

    ``device=True`` (default) runs the whole pipeline on device and fetches
    only the pooled resolution^3 grid + one outer scalar (train/vis.py::
    _grid_builders) — the host path below uploads the full supersampled
    lattice and fetches raw sigma, which cost ~25 s/frame in transfers
    alone over the tunneled TPU backend at 192^3x2 (PERF.md round 4); it
    is kept as the cross-check oracle (tests/test_occupancy.py).
    """
    rcfg = getattr(trainer, "rcfg_test", None)
    activation = ("softplus" if rcfg is not None
                  and getattr(rcfg, "activation", None) == "softplus"
                  else "relu")

    if builder == "warp" and frame_idx != -1 and cano_grid is not None:
        # per-frame grid = the canonical grid's bound pulled back through
        # the frame's bw warp (train/vis.py::_warp_grid_builders) — cheaper
        # than re-evaluating the trunk on the full lattice; points warping
        # outside the canonical cube degrade to "cannot skip". The pullback
        # runs at supersample 1 with one EXTRA dilation step: its per-point
        # cost is gather-dominated (XLA:TPU random gathers run ~2 GB/s,
        # PERF.md hash-grid post-mortem), so 8x fewer points buys most of
        # the speed, and the widened dilation covers the half-cell sampling
        # gap the supersampled max-pool would have resolved — the same
        # lattice-empirical tradeoff, one cell coarser.
        from ..train.vis import warp_grid_device
        outer_extent = float(extent * outer_factor)
        sig, outer_sig = warp_grid_device(
            trainer, frame_idx, resolution, cano_grid,
            supersample=1, extent=extent, dilate=dilate + 1,
            outer_extent=outer_extent if outer_factor > 1.0 else None)
        return DeviceOccupancyGrid(sig, extent=float(extent),
                                   threshold=float(threshold),
                                   outer_sig_dev=outer_sig,
                                   outer_extent=(outer_extent
                                                 if outer_factor > 1.0
                                                 else float(extent)))

    if device:
        from ..train.vis import grid_sig_device, outer_bound_device
        sig = grid_sig_device(trainer, frame_idx, resolution,
                              supersample=supersample, extent=extent,
                              activation=activation, dilate=dilate,
                              fetch=False)
        outer_sig, outer_extent = None, float(extent)
        if outer_factor > 1.0:
            outer_extent = float(extent * outer_factor)
            outer_sig = outer_bound_device(trainer, frame_idx, resolution,
                                           extent, outer_extent, activation,
                                           fetch=False)
        return DeviceOccupancyGrid(sig, extent=float(extent),
                                   threshold=float(threshold),
                                   outer_sig_dev=outer_sig,
                                   outer_extent=outer_extent)

    from ..train.vis import sigma_grid

    n = resolution * supersample
    sig = sigma_grid(trainer, frame_idx, n_grid=n, extent=extent,
                     clip_negative=False)
    if supersample > 1:
        sig = sig.reshape(resolution, supersample, resolution, supersample,
                          resolution, supersample).max(axis=(1, 3, 5))
    sig = _activate(sig, rcfg)
    # sigma_grid's lattice is meshgrid(xy-indexed): axis order (y, x, z);
    # transpose to (x, y, z) so index math below reads naturally
    sig = np.ascontiguousarray(sig.transpose(1, 0, 2).astype(np.float32))
    if dilate:
        sig = _dilate3d(sig, dilate)
    occ = sig > threshold

    # measure (never assume) the activated density OUTSIDE the cube on a
    # coarse dilated lattice over [-outer_factor*extent, ..]^3: ray
    # segments that leave the cube but stay within the measured shell read
    # this bound instead of a silent zero; probes BEYOND the shell read
    # +inf (unknown — those segments can never be tightened away). Same
    # lattice-empirical character as the inner grid (coarser cells +
    # 1-cell dilation: a guard, not the tight bound).
    outer_sig, outer_extent = 0.0, float(extent)
    if outer_factor > 1.0:
        outer_extent = float(extent * outer_factor)
        s_out = _activate(
            sigma_grid(trainer, frame_idx, n_grid=resolution,
                       extent=outer_extent, clip_negative=False), rcfg)
        s_out = _dilate3d(s_out.astype(np.float32), 1)
        c = np.linspace(-outer_extent, outer_extent, resolution,
                        dtype=np.float32)
        inner = ((np.abs(c)[:, None, None] <= extent)
                 & (np.abs(c)[None, :, None] <= extent)
                 & (np.abs(c)[None, None, :] <= extent))
        outer_sig = float(s_out[~inner].max()) if (~inner).any() else 0.0

    return OccupancyGrid(occ=np.ascontiguousarray(occ), extent=float(extent),
                         threshold=float(threshold), sig=sig,
                         outer_sig=outer_sig, outer_extent=outer_extent)


def _lookup(grid: OccupancyGrid, pts: np.ndarray) -> np.ndarray:
    """(...,3) points -> bool occupied (False outside the grid)."""
    r = grid.resolution
    ids = np.floor((pts + grid.extent) / grid.cell).astype(np.int64)
    inb = np.all((ids >= 0) & (ids < r), axis=-1)
    ids = np.clip(ids, 0, r - 1)
    return grid.occ[ids[..., 0], ids[..., 1], ids[..., 2]] & inb


def _lookup_sig(grid: OccupancyGrid, pts: np.ndarray) -> np.ndarray:
    """(...,3) points -> per-cell sigma upper bound. Three zones: inside
    the grid reads the dilated per-cell max; outside the grid but within
    the MEASURED outer shell reads ``grid.outer_sig``; beyond the measured
    shell reads +inf (unknown density is never skippable)."""
    r = grid.resolution
    ids = np.floor((pts + grid.extent) / grid.cell).astype(np.int64)
    inb = np.all((ids >= 0) & (ids < r), axis=-1)
    ids = np.clip(ids, 0, r - 1)
    in_shell = np.all(np.abs(pts) <= grid.outer_extent, axis=-1)
    out_val = np.where(in_shell, np.float32(grid.outer_sig),
                       np.float32(np.inf))
    return np.where(inb, grid.sig[ids[..., 0], ids[..., 1], ids[..., 2]],
                    out_val)


def tighten_ray_bounds(grid: OccupancyGrid, rays: np.ndarray, size,
                       pad_cells: float = 2.0, max_coarse: int = 8,
                       tau_eps: float = 1e-3):
    """Rewrite rays' near/far (columns 6, 7) to the interval that holds all
    but ``tau_eps`` of the ray's optical-depth upper bound.

    The bound: each probe reads the 3^3-dilated per-cell max of the
    activated density (``grid.sig``), so ``max(s_i, s_{i+1}) * dt`` bounds
    the true integral of sigma over probe segment i (probe spacing <= one
    cell). A ray whose TOTAL bound is <= tau_eps has opacity
    <= 1 - exp(-tau_eps) ~= tau_eps and is marked provably empty
    (``stats['empty_mask']``: skip rendering, composite to background).
    Otherwise near/far shrink to the interval outside of which the leading
    and trailing tails each hold <= tau_eps/2 of optical depth — the
    excluded regions provably contribute <= tau_eps of alpha. This replaces
    a naive threshold-hit bracket, whose "empty" claim is unbounded: sigma
    just under the threshold across the whole span composites to visible
    color (measured: max pixel error 1.0 on a distilled field at
    threshold 5).

    Args:
      rays: ``(H*W, >=9)`` packed rays (image-ordered).
      size: ``(H, W)``.
      pad_cells: extra conservative padding of the interval, in grid cells
        (on top of one probe spacing).
      max_coarse: probe every k-th pixel in x/y, k auto-clamped so the ray
        spacing at the far plane stays under one cell (small objects cannot
        fall between probed rays).
      tau_eps: optical-depth budget for everything excluded (skipped rays
        and tightened-away segments alike).

    Returns ``(rays_tightened, stats)``; rays with nothing to exclude keep
    their original bounds bit-exactly.
    """
    rays = np.asarray(rays)
    h, w = size
    o, d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6].copy(), rays[:, 7].copy()

    # angular pitch between horizontally adjacent rays -> max safe probe
    # stride: stride * pitch * t_far <= cell
    d0 = d[0] / np.linalg.norm(d[0])
    d1 = d[1] / np.linalg.norm(d[1])
    pitch = float(np.linalg.norm(np.cross(d0, d1))) + 1e-12
    safe = int(grid.cell / (pitch * float(far.max()) + 1e-12))
    coarse = int(np.clip(safe, 1, max_coarse))

    ys = np.arange(0, h, coarse)
    xs = np.arange(0, w, coarse)
    sub = (ys[:, None] * w + xs[None, :]).reshape(-1)
    o_s, d_s = o[sub], d[sub]
    n_s, f_s = near[sub], far[sub]

    # probe spacing along t <= one cell (direction norms ~1; guard anyway)
    dn = np.linalg.norm(d_s, axis=-1)
    span = (f_s - n_s) * dn
    n_probe = int(np.clip(np.ceil(span.max() / grid.cell) + 1, 8, 512))
    if n_probe > 8:  # same bucketing as _probe_plan (compile-cache reuse)
        n_probe = min(512, -(-n_probe // 32) * 32)
    ts = n_s[:, None] + (f_s - n_s)[:, None] * \
        np.linspace(0.0, 1.0, n_probe, dtype=np.float32)[None, :]
    pts = o_s[:, None, :] + d_s[:, None, :] * ts[..., None]
    s = _lookup_sig(grid, pts)                          # (S, P)

    # per-segment optical-depth upper bound, then prefix mass. prefix[:, k]
    # = bound on integral over [t_0, t_k] (P entries: prefix[:, 0] = 0).
    dt = (ts[:, 1:] - ts[:, :-1]) * dn[:, None]
    seg = np.maximum(s[:, 1:], s[:, :-1]) * dt          # (S, P-1)
    zcol = np.zeros((seg.shape[0], 1), np.float32)
    prefix = np.concatenate([zcol, np.cumsum(seg, axis=1)], axis=1)  # (S, P)
    # suffix[k] = mass in [t_k, t_P]; reverse cumsum (NOT total - prefix,
    # which is inf - inf = NaN for tests' hard-occupied inf cells)
    suffix = np.concatenate(
        [np.cumsum(seg[:, ::-1], axis=1)[:, ::-1], zcol], axis=1)
    total = prefix[:, -1]

    half = 0.5 * tau_eps
    # last probe index whose leading mass is still <= eps/2 (>=0 exists:
    # prefix[0] = 0), and first index whose trailing mass is <= eps/2
    lead_ok = prefix <= half
    trail_ok = suffix <= half
    t_lo = np.take_along_axis(
        ts, (lead_ok.shape[1] - 1 - np.argmax(lead_ok[:, ::-1], axis=1)
             )[:, None], axis=1)[:, 0]
    t_hi = np.take_along_axis(
        ts, np.argmax(trail_ok, axis=1)[:, None], axis=1)[:, 0]

    ch, cw = len(ys), len(xs)

    # image-space 3x3 min/max dilation (covers rays between probe rays)
    def _erode_min(a):
        p = np.pad(a.reshape(ch, cw), 1, constant_values=np.inf)
        return np.min([p[i:i + ch, j:j + cw]
                       for i in (0, 1, 2) for j in (0, 1, 2)], axis=0)

    def _dilate_max(a):
        p = np.pad(a.reshape(ch, cw), 1, constant_values=0.0)
        return np.max([p[i:i + ch, j:j + cw]
                       for i in (0, 1, 2) for j in (0, 1, 2)], axis=0)

    t_lo = _erode_min(t_lo)
    t_hi = _dilate_max(np.where(total > 0, t_hi, 0.0))
    total_d = _dilate_max(total)

    # nearest upsample back to (h, w)
    up_y = np.minimum(np.arange(h) // coarse, ch - 1)
    up_x = np.minimum(np.arange(w) // coarse, cw - 1)
    t_lo_full = t_lo[up_y[:, None], up_x[None, :]].reshape(-1)
    t_hi_full = t_hi[up_y[:, None], up_x[None, :]].reshape(-1)
    total_full = total_d[up_y[:, None], up_x[None, :]].reshape(-1)

    pad_t = pad_cells * grid.cell + span.max() / max(n_probe - 1, 1)
    empty = total_full <= tau_eps
    new_near = np.clip(t_lo_full - pad_t, near, far)
    new_far = np.clip(t_hi_full + pad_t, near, far)
    new_near = np.where(empty, near, new_near)
    new_far = np.where(empty, far, new_far)

    out = rays.copy()
    out[:, 6] = new_near.astype(rays.dtype)
    out[:, 7] = new_far.astype(rays.dtype)
    stats = {
        "coarse": coarse,
        "n_probe": n_probe,
        "empty_frac": float(empty.mean()),
        "range_ratio": float(np.mean((new_far - new_near)
                                     / (far - near + 1e-12))),
        # per-ray "provably empty" mask (image-dilated, conservative): the
        # ray's whole-span optical-depth bound is <= tau_eps, so skipping it
        # changes the pixel by at most ~tau_eps — such rays render as pure
        # background (render_masked_image). This is where the big test-time
        # win lives: a person covers ~10-40% of a frame, so whole-ray
        # skipping multiplies frame throughput by 1/(1-empty_frac) on top
        # of the depth-bound tightening.
        "empty_mask": empty,
    }
    return out, stats


# ---------------------------------------------------------------------------
# On-device tightening (round-4: zero host numpy in the timed render loop)
# ---------------------------------------------------------------------------

def _probe_plan(grid: OccupancyGrid, rays_np: np.ndarray, size,
                max_coarse: int):
    """Host-side probe-plan scalars (stride + probe count). Mirrors the
    derivation at the top of :func:`tighten_ray_bounds`; everything here is
    O(n_rays) numpy over data the caller already holds on host (frame rays
    come from the dataset's host-side camera, data/dataset.py::frame_rays)."""
    h, w = size
    o, d = rays_np[:, 0:3], rays_np[:, 3:6]
    near, far = rays_np[:, 6], rays_np[:, 7]
    d0 = d[0] / np.linalg.norm(d[0])
    d1 = d[1] / np.linalg.norm(d[1])
    pitch = float(np.linalg.norm(np.cross(d0, d1))) + 1e-12
    safe = int(grid.cell / (pitch * float(far.max()) + 1e-12))
    coarse = int(np.clip(safe, 1, max_coarse))
    ys = np.arange(0, h, coarse)
    xs = np.arange(0, w, coarse)
    sub = (ys[:, None] * w + xs[None, :]).reshape(-1)
    dn = np.linalg.norm(d[sub], axis=-1)
    span_max = float(((far[sub] - near[sub]) * dn).max())
    n_probe = int(np.clip(np.ceil(span_max / grid.cell) + 1, 8, 512))
    # quantize n_probe UP to a multiple of 32: it is a static jit arg, and
    # per-frame span jitter (auto-extent grids differ slightly per frame)
    # would otherwise compile a fresh tighten program per novel value — at
    # 2-300 s per compile on the tunneled backend a multi-frame video could
    # stall minutes per frame. Extra probes only tighten the bound.
    if n_probe > 8:
        n_probe = min(512, -(-n_probe // 32) * 32)
    return coarse, n_probe, len(ys), len(xs)


def _tighten_kernel(sig_flat, extent, cell, outer_sig, outer_extent,
                    tau_eps, pad_cells, rays, *, r, h, w, coarse, n_probe):
    """The whole tighten computation as one jit-able program. Math is a
    line-for-line transcription of :func:`tighten_ray_bounds` (same probe
    lattice, same tau-integral prefix/suffix bound, same image-space
    dilation and padding); tests assert near-bit equality on f32 inputs."""
    import jax.numpy as jnp

    ys = jnp.arange(0, h, coarse)
    xs = jnp.arange(0, w, coarse)
    ch, cw = ys.shape[0], xs.shape[0]
    sub = (ys[:, None] * w + xs[None, :]).reshape(-1)
    rs = jnp.take(rays, sub, axis=0)
    o_s, d_s = rs[:, 0:3], rs[:, 3:6]
    n_s, f_s = rs[:, 6], rs[:, 7]
    near, far = rays[:, 6], rays[:, 7]

    dn = jnp.linalg.norm(d_s, axis=-1)
    span_max = ((f_s - n_s) * dn).max()
    ts = n_s[:, None] + (f_s - n_s)[:, None] * \
        jnp.linspace(0.0, 1.0, n_probe, dtype=jnp.float32)[None, :]
    pts = o_s[:, None, :] + d_s[:, None, :] * ts[..., None]

    # three-zone sigma upper bound (== _lookup_sig)
    ids = jnp.floor((pts + extent) / cell).astype(jnp.int32)
    inb = jnp.all((ids >= 0) & (ids < r), axis=-1)
    ids = jnp.clip(ids, 0, r - 1)
    flat = (ids[..., 0] * r + ids[..., 1]) * r + ids[..., 2]
    vals = jnp.take(sig_flat, flat.reshape(-1)).reshape(flat.shape)
    in_shell = jnp.all(jnp.abs(pts) <= outer_extent, axis=-1)
    out_val = jnp.where(in_shell, outer_sig, jnp.inf)
    s = jnp.where(inb, vals, out_val)                   # (S, P)

    dt = (ts[:, 1:] - ts[:, :-1]) * dn[:, None]
    seg = jnp.maximum(s[:, 1:], s[:, :-1]) * dt         # (S, P-1)
    zcol = jnp.zeros((seg.shape[0], 1), jnp.float32)
    prefix = jnp.concatenate([zcol, jnp.cumsum(seg, axis=1)], axis=1)
    suffix = jnp.concatenate(
        [jnp.cumsum(seg[:, ::-1], axis=1)[:, ::-1], zcol], axis=1)
    total = prefix[:, -1]

    half = 0.5 * tau_eps
    lead_ok = prefix <= half
    trail_ok = suffix <= half
    lo_idx = n_probe - 1 - jnp.argmax(lead_ok[:, ::-1], axis=1)
    hi_idx = jnp.argmax(trail_ok, axis=1)
    t_lo = jnp.take_along_axis(ts, lo_idx[:, None], axis=1)[:, 0]
    t_hi = jnp.take_along_axis(ts, hi_idx[:, None], axis=1)[:, 0]

    def _erode_min(a):
        p = jnp.pad(a.reshape(ch, cw), 1, constant_values=jnp.inf)
        return jnp.min(jnp.stack([p[i:i + ch, j:j + cw]
                                  for i in (0, 1, 2) for j in (0, 1, 2)]),
                       axis=0)

    def _dilate_max(a):
        p = jnp.pad(a.reshape(ch, cw), 1, constant_values=0.0)
        return jnp.max(jnp.stack([p[i:i + ch, j:j + cw]
                                  for i in (0, 1, 2) for j in (0, 1, 2)]),
                       axis=0)

    t_lo = _erode_min(t_lo)
    t_hi = _dilate_max(jnp.where(total > 0, t_hi, 0.0))
    total_d = _dilate_max(total)

    up_y = jnp.minimum(jnp.arange(h) // coarse, ch - 1)
    up_x = jnp.minimum(jnp.arange(w) // coarse, cw - 1)
    t_lo_full = t_lo[up_y[:, None], up_x[None, :]].reshape(-1)
    t_hi_full = t_hi[up_y[:, None], up_x[None, :]].reshape(-1)
    total_full = total_d[up_y[:, None], up_x[None, :]].reshape(-1)

    pad_t = pad_cells * cell + span_max / max(n_probe - 1, 1)
    empty = total_full <= tau_eps
    new_near = jnp.clip(t_lo_full - pad_t, near, far)
    new_far = jnp.clip(t_hi_full + pad_t, near, far)
    new_near = jnp.where(empty, near, new_near)
    new_far = jnp.where(empty, far, new_far)

    out = jnp.concatenate(
        [rays[:, :6], new_near[:, None].astype(rays.dtype),
         new_far[:, None].astype(rays.dtype), rays[:, 8:]], axis=1)
    empty_frac = empty.mean(dtype=jnp.float32)
    range_ratio = jnp.mean((new_far - new_near) / (far - near + 1e-12))
    kept_count = jnp.sum(jnp.logical_not(empty)).astype(jnp.int32)
    return out, empty, empty_frac, range_ratio, kept_count


_TIGHTEN_JIT = None


def tighten_ray_bounds_jax(grid: OccupancyGrid, rays, size,
                           pad_cells: float = 2.0, max_coarse: int = 8,
                           tau_eps: float = 1e-3):
    """On-device :func:`tighten_ray_bounds`: same bound, same outputs, but
    the probe/scan math runs as ONE jitted program and the returned rays,
    empty mask and stats stay on device (callers that need the mask host-
    side pay one transfer; nothing else syncs). Only the probe-plan ints —
    stride and probe count, which are shapes — are derived host-side from
    the (host-resident) rays. Returns ``(rays_device, stats)`` with
    ``stats['empty_mask']`` a device bool array and the scalar stats device
    scalars (read them lazily)."""
    import jax
    import jax.numpy as jnp

    rays_np = np.asarray(rays)
    coarse, n_probe, _, _ = _probe_plan(grid, rays_np, size, max_coarse)
    h, w = size

    global _TIGHTEN_JIT
    if _TIGHTEN_JIT is None:
        _TIGHTEN_JIT = jax.jit(
            _tighten_kernel,
            static_argnames=("r", "h", "w", "coarse", "n_probe"))
    outer_sig = getattr(grid, "outer_sig_dev", None)
    if outer_sig is None:  # host grids: plain float (tests, oracle path)
        outer_sig = jnp.float32(grid.outer_sig)
    out, empty, empty_frac, range_ratio, kept_count = _TIGHTEN_JIT(
        grid.device_sig(), jnp.float32(grid.extent), jnp.float32(grid.cell),
        outer_sig.astype(jnp.float32), jnp.float32(grid.outer_extent),
        jnp.float32(tau_eps), jnp.float32(pad_cells),
        jnp.asarray(rays_np, jnp.float32),
        r=grid.resolution, h=h, w=w, coarse=coarse, n_probe=n_probe)
    stats = {"coarse": coarse, "n_probe": n_probe,
             "empty_frac": empty_frac, "range_ratio": range_ratio,
             "empty_mask": empty, "kept_count": kept_count}
    return out, stats
