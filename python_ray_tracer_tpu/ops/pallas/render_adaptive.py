"""Adaptive 3x3 supersampling via a stream-compacted per-pixel ray worklist.

The reference's AA is unconditional: every interior pixel averages 9 samples
(/root/reference/src/ray_tracing/kernels.py:32-65). Its cost is the AA axis's
perf frontier — the shared-sample kernel (render_pallas._make_kernel_aa_shared)
already sits at its ~5.1/9 arithmetic bound, so further AA speed needs an
*algorithmic* lever: most of a frame is locally smooth, and on locally-linear
intensity the 9-sample average provably equals the center sample (the AA
offsets are symmetric, so linear terms cancel) — supersampling only changes
the image where it has curvature or sub-pixel structure.

Tile-granular adaptivity measured a NEGATIVE on TPU: with the lane dimension
fixed at 128, every viable tile shape has 70-95% of demo-scene tiles touching
an edge (benchmarks/adaptive_sweep.py), so whole-tile skipping cannot beat the
shared-AA kernel. The winning granularity is the PIXEL, which needs a dense
worklist rather than a sparse grid. This module renders AA adaptively in two
passes, both TPU-resident (one jit, no host round trips, static shapes):

1. **Centers pass**: the production no-AA fused kernel renders every pixel's
   center sample (`render_pallas._render_image_pallas`).
2. **Flagging** (jnp, XLA-fused): a *curvature* metric — max absolute second
   difference of the centers along x, y, and both diagonals — flags pixels
   where intensity is not locally linear; a 1-px max-dilation makes the test
   conservative against features straddling a pixel boundary. First
   differences deliberately do NOT flag: steep-but-linear gradients (floor
   shading) are exactly where center == 9-sample average.
3. **Tent fallback**: unflagged interior pixels take the 9-sample average
   with samples *bilinearly interpolated* from centers — a 3x3 tent filter,
   exact to second order. Measured on the demo scene at 512x288: max error
   0.33/255 at eps=0.5/255, below the uint8 quantization step.
4. **Worklist pass**: flagged pixels' 9 samples are stream-compacted
   (`jnp.nonzero(size=...)`) into a dense ``(rows, 128)``
   fractional-pixel-coordinate list; one Pallas kernel traces them all (the
   same `_sample_chain` bounce-chain machinery as the grid kernels, evaluated
   over an arbitrary coordinate list); one scatter of the K combined rows
   (sorted, unique) into the tent image composes the final result. Flagged
   pixels evaluate the same per-sample arithmetic in the same summation order
   as the per-sample AA kernel; they agree to FMA-contraction ULPs (~1e-5,
   i.e. ~0.003/255 — compiler fusion differs across kernel shapes, the same
   tolerance class as the repo's other cross-kernel comparisons).

**MEASURED NEGATIVE on v5e (kept as an opt-in experiment).** Quality is
excellent everywhere tested (demo 1080p: 0.002% of pixels off by more than
one uint8 step vs full AA), but the mode is slower than the shared-AA kernel
in every measured regime, for two quantified hardware reasons:

- *Small scenes* (demo 1080p, 15.1% flagged): compute is cheap (centers pass
  1.7 ms + worklist trace 2.6 ms) but per-pixel indirection is not —
  `nonzero` is an XLA sort (~20 ms at 2M pixels) and gather/scatter cost
  ~5-9 ns/row (no hardware gather; 12-byte rows pad to vregs). The fixed
  movement tax alone exceeds the full shared-AA frame (7.7 ms); the shipped
  9-sample + sorted-scatter variant measures 75 ms end-to-end vs 7.7 ms.
- *Dense scenes* (where the tax would amortize): the worklist loses every
  tile-coherence optimization the grid kernels rely on — cone-cull lists,
  tile-coherent shadow early exit, Morton-group bounce gating all assume a
  spatially-bounded pixel tile. Measured per-sample cost at 1000 spheres:
  ~161 ns (scattered worklist, full sweeps) vs ~42 ns/sample-unit in the
  culled grid kernel. Net: 100-sphere 1080p AA 160 ms vs 59 ms full
  (0.37x), 1000-sphere 707 ms vs 450 ms (0.64x).

Tile-granular skipping (the other way to adaptivity) was probed first and is
equally negative: with the lane dimension fixed at 128, 70-95% of demo tiles
touch an edge at every viable tile shape, so whole-tile skipping saves
nothing over the shared-AA kernel's 5.1/9 sharing bound. Conclusion: on this
hardware, unconditional shared-grid supersampling beats data-dependent
sample skipping at every scale measured; the AA frontier stays at the
shared kernel's arithmetic bound. (Numbers: docs/ROADMAP.md round-4
section; same honesty bar as the bf16 negative, benchmarks/bf16_sweep.py.)

The sample budget is static (``budget_frac`` of the pixel count) so the whole
pipeline stays one compiled program: if more pixels flag than the budget
holds, the overflow keeps the tent value (deterministically, in pixel-index
order) and the returned stats report it.

Known limitation (inherent to any center-driven adaptive scheme): structure
invisible to every center sample — features thinner than a pixel threading
between centers — cannot be flagged and falls back to the tent value. The
honest-quality contract is the returned ``stats`` plus the measured error
distributions in tests/test_adaptive.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .render_pallas import (AA_OFFSETS, _pack_params, _sample_chain,
                            _shadow_cheap_ok, render_image_pallas)

_LANES = 128


def _make_list_kernel(*, depth, ns, npl, nl, compat, cheap_shadow, RW):
    """Trace a dense worklist of fractional pixel coords -> per-sample rgb.

    Rays are generated analytically from the coordinate list exactly as the
    grid kernels do (`_raygen` inside `_sample_chain`); a worklist sample
    runs the same arithmetic as the per-sample AA kernel evaluating that
    sample (agreement to FMA-contraction ULPs — see module docstring).
    """
    shape = (RW, _LANES)

    def kernel(params, sph, pln, lts, px_ref, py_ref, out_ref):
        r, g, b = _sample_chain(params, sph, ns, pln, npl, lts, nl,
                                px_ref[...], py_ref[...],
                                depth=depth, compat=compat, shape=shape,
                                cheap_shadow=cheap_shadow)
        out_ref[0], out_ref[1], out_ref[2] = r, g, b

    return kernel


def _curvature_flags(C, W, H, eps):
    """Per-pixel adaptive test: max |second difference| over x/y/diagonal
    axes and channels, dilated by 1 px, interior-only (borders never get AA —
    reference kernels.py:27-30). ``C`` is the clean (r,g,b) centers image
    ``(W, H, 3)``. jnp.roll wrap-around only ever *adds* flags near image
    edges (conservative)."""
    d = jnp.zeros((W, H), jnp.float32)
    for ax, ay in ((1, 0), (0, 1), (1, 1), (1, -1)):
        p = jnp.roll(C, (ax, ay), axis=(0, 1))
        m = jnp.roll(C, (-ax, -ay), axis=(0, 1))
        d = jnp.maximum(d, jnp.max(jnp.abs(p - 2.0 * C + m), axis=-1))
    # 3x3 max-dilation, separably.
    d = jnp.maximum(d, jnp.maximum(jnp.roll(d, 1, 0), jnp.roll(d, -1, 0)))
    d = jnp.maximum(d, jnp.maximum(jnp.roll(d, 1, 1), jnp.roll(d, -1, 1)))
    gx = jax.lax.broadcasted_iota(jnp.int32, (W, H), 0)
    gy = jax.lax.broadcasted_iota(jnp.int32, (W, H), 1)
    interior = (gx >= 1) & (gx <= W - 2) & (gy >= 1) & (gy <= H - 2)
    return (d > eps) & interior


def _tent_image(C, W, H, compat):
    """9-sample AA average with samples bilinearly interpolated from centers
    — exact on locally-linear intensity. Returns the full-image fallback in
    the kernels' *stored* channel layout (the compat combine composes the
    reference's accumulation+store G/B swaps, ops/render.py:78-84)."""
    k = ((0.25, 1.0, 0.25), (1.0, 4.0, 1.0), (0.25, 1.0, 0.25))
    T = jnp.zeros_like(C)
    for sx in (-1, 0, 1):
        for sy in (-1, 0, 1):
            T = T + k[sx + 1][sy + 1] * jnp.roll(C, (sx, sy), axis=(0, 1))
    T = T / 9.0
    gx = jax.lax.broadcasted_iota(jnp.int32, (W, H), 0)
    gy = jax.lax.broadcasted_iota(jnp.int32, (W, H), 1)
    interior = ((gx >= 1) & (gx <= W - 2) & (gy >= 1) & (gy <= H - 2))[..., None]
    Cr, Cg, Cb = C[..., 0], C[..., 1], C[..., 2]
    if compat:
        aa = jnp.stack([T[..., 0],
                        (Cb + 9.0 * T[..., 1] - Cg) / 9.0,
                        (Cg + 9.0 * T[..., 2] - Cb) / 9.0], axis=-1)
        border = jnp.stack([Cr, Cb, Cg], axis=-1)
    else:
        aa = T
        border = C
    return jnp.where(interior, aa, border)


def render_image_adaptive(camera, scene, *, depth: int = 2,
                          compat: bool = True, eps: float = 1.0 / 255,
                          budget_frac: float = 0.25,
                          interpret: bool = False, row_block: int = 64,
                          with_stats: bool = False,
                          tile_w: int | None = None, tile_h: int | None = None):
    """Adaptive-AA render -> float ``(w, h, 3)`` image (same layout/contract
    as :func:`render_pallas.render_image_pallas` with ``aliasing=True``).

    ``eps``: curvature threshold in [0,1] color units (1/255 = one uint8
    step). ``eps < 0`` flags every interior pixel — with a covering budget
    the result matches the per-sample AA kernel to FMA-contraction ULPs
    (~1e-5; identical arithmetic and summation order). ``budget_frac``
    bounds the worklist at ``budget_frac * W * H`` pixels (static shape);
    overflow keeps the tent value, reported via ``with_stats``.

    Returns ``image`` or ``(image, stats)``,
    stats = ``{"flagged": n, "dropped": n}``.
    """
    # cheap_shadow inspects concrete radii — it must resolve OUTSIDE the jit
    # boundary (inside, scene is a tracer and the check degrades to the
    # conservative root form; render_pallas keeps the same wrapper/inner
    # split for the same reason).
    cheap_shadow = _shadow_cheap_ok(scene, compat)
    return _render_image_adaptive(camera, scene, depth=depth, compat=compat,
                                  eps=eps, budget_frac=budget_frac,
                                  interpret=interpret, row_block=row_block,
                                  with_stats=with_stats, tile_w=tile_w,
                                  tile_h=tile_h, cheap_shadow=cheap_shadow)


@functools.partial(jax.jit, static_argnames=("depth", "compat", "eps",
                                             "budget_frac", "interpret",
                                             "row_block", "with_stats",
                                             "tile_w", "tile_h",
                                             "cheap_shadow"))
def _render_image_adaptive(camera, scene, *, depth, compat, eps, budget_frac,
                           interpret, row_block, with_stats, tile_w, tile_h,
                           cheap_shadow):
    W, H = camera.resolution
    ns, npl, nl = scene.spheres.count, scene.planes.count, scene.lights.count

    # --- pass 1: centers (the production no-AA fused kernel) ---
    img0 = render_image_pallas(camera, scene, depth=depth, aliasing=False,
                               compat=compat, interpret=interpret,
                               cheap_shadow=cheap_shadow,
                               tile_w=tile_w, tile_h=tile_h)
    C = img0[..., jnp.asarray([0, 2, 1])] if compat else img0  # stored->rgb

    # --- flags + tent fallback ---
    flags = _curvature_flags(C, W, H, eps)
    tent = _tent_image(C, W, H, compat)

    # --- stream compaction (nonzero = XLA sort; ~20 ms at 1080p — a fixed
    # cost that only pays off when the skipped supersampling is much larger,
    # i.e. dense scenes; see the measured-negative note for small scenes) ---
    K = max(1, min(int(budget_frac * W * H), W * H))
    flat = flags.reshape(-1)
    n_flagged = jnp.sum(flat.astype(jnp.int32))
    (idx,) = jnp.nonzero(flat, size=K, fill_value=int(W * H))
    idx = idx.astype(jnp.int32)
    # distinct out-of-bounds sentinels (W*H + slot) keep the scatter's
    # unique_indices/sorted promises honest when fewer than K pixels flag —
    # identical fill values would violate the uniqueness contract even
    # though drop-mode never applies them.
    slot = jnp.arange(K, dtype=jnp.int32)
    idx = jnp.where(idx >= W * H, jnp.int32(W * H) + slot, idx)

    px0 = (idx // H).astype(jnp.float32)     # sentinels -> x >= W (off-frame)
    py0 = (idx % H).astype(jnp.float32)
    # all NINE samples per flagged pixel (center first, reference order):
    # recomputing the center costs +1/9 kernel time and removes a K-row
    # gather of pass-1 centers — gathers are the expensive op on TPU.
    offs = jnp.asarray(AA_OFFSETS, jnp.float32)      # (9, 2)
    px = (px0[:, None] + offs[None, :, 0]).reshape(-1)   # (9K,) pixel-major
    py = (py0[:, None] + offs[None, :, 1]).reshape(-1)

    n_rows = -(-px.shape[0] // _LANES)
    RW = min(row_block, n_rows)
    n_rows = -(-n_rows // RW) * RW
    pad = n_rows * _LANES - px.shape[0]
    px = jnp.pad(px, (0, pad), constant_values=float(W)).reshape(n_rows, _LANES)
    py = jnp.pad(py, (0, pad), constant_values=0.0).reshape(n_rows, _LANES)

    # --- pass 2: trace the worklist ---
    params = _pack_params(camera, scene, compat, 0.0)
    sph = jnp.concatenate([
        scene.spheres.center.T.astype(jnp.float32),
        scene.spheres.radius[None].astype(jnp.float32),
        scene.spheres.albedo.T.astype(jnp.float32)], axis=0) if ns else \
        jnp.zeros((7, 1), jnp.float32)
    pln = jnp.concatenate([
        scene.planes.origin.T.astype(jnp.float32),
        scene.planes.normal.T.astype(jnp.float32),
        scene.planes.albedo.T.astype(jnp.float32)], axis=0) if npl else \
        jnp.zeros((9, 1), jnp.float32)
    lts = (scene.lights.position.T.astype(jnp.float32) if nl else
           jnp.zeros((3, 1), jnp.float32))
    kernel = _make_list_kernel(depth=depth, ns=ns, npl=npl, nl=nl,
                               compat=compat, cheap_shadow=cheap_shadow, RW=RW)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    samples = pl.pallas_call(
        kernel,
        grid=(n_rows // RW,),
        in_specs=[smem(), smem(), smem(), smem(),
                  pl.BlockSpec((RW, _LANES), lambda i: (i, 0)),
                  pl.BlockSpec((RW, _LANES), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((3, RW, _LANES), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((3, n_rows, _LANES), jnp.float32),
        interpret=interpret,
    )(params, sph, pln, lts, px, py)

    s = samples.reshape(3, -1)[:, :9 * K].reshape(3, K, 9)
    # Center init + neighbor accumulation in AA_OFFSETS order — the same
    # association as the per-sample kernel's s-loop
    # (render_pallas._make_kernel: s=0 stores (r,b,g) under compat, then
    # neighbors accumulate unswapped, then *1/9).
    if compat:
        accr, accg, accb = s[0, :, 0], s[2, :, 0], s[1, :, 0]  # (pr, pb, pg)
    else:
        accr, accg, accb = s[0, :, 0], s[1, :, 0], s[2, :, 0]
    for j in range(1, 9):
        accr = accr + s[0, :, j]
        accg = accg + s[1, :, j]
        accb = accb + s[2, :, j]
    inv9 = jnp.float32(1.0 / 9.0)
    aa_vals = jnp.stack([accr, accg, accb], axis=-1) * inv9   # (K, 3) stored

    # --- compose: scatter K sorted-unique rows into the tent image (the
    # inverse gather-expand costs ~9 ns/row x W*H on TPU; the scatter costs
    # it only x K). Sentinel rows (idx = W*H) drop out of bounds. ---
    out = tent.reshape(-1, 3).at[idx].set(
        aa_vals, mode="drop", indices_are_sorted=True,
        unique_indices=True).reshape(W, H, 3)
    if with_stats:
        return out, {"flagged": n_flagged,
                     "dropped": jnp.maximum(n_flagged - K, 0)}
    return out
