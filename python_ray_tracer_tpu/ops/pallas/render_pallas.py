"""Fused Pallas (Mosaic) render kernel: ray-gen -> intersect -> shade -> framebuffer.

This is the TPU-native equivalent of the reference's single ``@cuda.jit`` global
kernel plus its device-function tree (reference kernels.py:6-73, trace.py,
intersections.py, common.py — compiled to PTX by numba there, to Mosaic here). One
``pallas_call`` covers the entire forward pipeline; nothing ever round-trips to HBM
between ray generation and the final framebuffer block:

  * grid ``(W/TW, H/TH, S)``: pixel tiles x AA samples. The output block's index map
    ignores the sample axis, so the framebuffer tile stays resident in VMEM while all
    S samples accumulate into it (the CUDA version's per-thread accumulator
    registers, kernels.py:58-65, become a revisited VMEM block).
  * ray generation is analytic from ``program_id`` + iota — there is no pixel-grid
    input at all (the reference gathers neighbor pixel locations from a device
    array, kernels.py:32-41; here AA offsets are half-index shifts read from SMEM).
  * the scene SoA lives in SMEM (it is tiny: reference demo scene = 60 floats) and
    object sweeps broadcast per-object scalars against ``(TW, TH)`` ray tiles on the
    VPU — unrolled for small scenes; large scenes chunk-unroll 8 objects per
    ``fori_loop`` iteration and add three exact accelerations: a conservative
    per-tile cone cull for primary sweeps (:func:`_tile_visibility`), a runtime
    origin-AABB capsule cull for shadow sweeps (:func:`_any_hit_capsule`), and a
    tile-coherent early exit once every lane's shadow ray is occluded.
  * materials/camera are traced SMEM scalars: changing them does NOT recompile the
    kernel (the reference pays a numba re-JIT per refl_depth value, main.py:41-47).

The kernel reproduces compat semantics exactly (999.0 far clip, strict-< closest
hit with spheres-before-planes tie-break, unlimited-range shadow rays, 2e-4 acne
biases, the AA G/B accumulation swap + store swap — see ops/render.py docstring).

Differentiability: :func:`render_image_fast` wraps this forward in a
``jax.custom_vjp`` whose backward is the fused hand-derived adjoint kernel
(render_bwd.py) for no-AA unrolled scenes — both passes at kernel speed — and
XLA's autodiff of the jnp path otherwise.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30
FAR = 999.0
BIAS = 2e-4
_UNROLL_LIMIT = 16

# AA half-offsets in (x, y) index space; s=0 is the primary (center) sample
# (reference kernels.py:32-50).
AA_OFFSETS = ((0.0, 0.0), (-0.5, 0.0), (0.5, 0.0), (0.0, 0.5), (0.0, -0.5),
              (-0.5, 0.5), (0.5, 0.5), (-0.5, -0.5), (0.5, -0.5))

# params SMEM vector layout
_P_ORIGIN = 0      # 3: camera origin
_P_ROT = 3         # 9: rotation, row-major
_P_FOCAL = 12
_P_Y0, _P_DY, _P_Z0, _P_DZ = 13, 14, 15, 16
_P_AMB, _P_LAMB, _P_REFL = 17, 18, 19
_P_SPEC, _P_SHIN = 20, 21   # Phong specular/shininess (clean mode only)
_P_X0 = 22         # global x index of this shard's first column (ray-DP sharding)
_P_OFFS = 23       # 2*S: AA offsets
_N_PARAMS = _P_OFFS + 2 * len(AA_OFFSETS)


def _rnorm(x, y, z):
    return jax.lax.rsqrt(x * x + y * y + z * z)


_CHUNK = 8


def _fold_objects(n, body, carry):
    """Fold ``body(j, carry) -> carry`` over an object axis of static size ``n``.

    Small scenes unroll fully (static SMEM indices). Large scenes run a
    chunk-unrolled ``fori_loop`` — _CHUNK objects per iteration with dynamic
    SMEM reads — which amortizes the loop-carry overhead that made the r1
    one-object-per-iteration rolled path ~3x slower than unrolled-equivalent,
    plus a statically-unrolled tail for the remainder."""
    if n <= _UNROLL_LIMIT:
        for j in range(n):
            carry = body(j, carry)
        return carry

    def chunk_body(k, carry):
        base = k * _CHUNK
        for jj in range(_CHUNK):
            carry = body(base + jj, carry)
        return carry

    carry = jax.lax.fori_loop(0, n // _CHUNK, chunk_body, carry)
    for j in range((n // _CHUNK) * _CHUNK, n):
        carry = body(j, carry)
    return carry


def _fold_objects_early_exit(n, body, carry, done):
    """Like :func:`_fold_objects` but for monotone accumulations (shadow
    occlusion): once ``done(carry)`` reports every lane saturated, remaining
    chunks are skipped via the ``while_loop`` condition — an exact,
    tile-coherent early exit (occlusion can only grow; skipped objects cannot
    change a saturated tile). Dense scenes saturate after a few chunks."""
    if n <= _UNROLL_LIMIT:
        for j in range(n):
            carry = body(j, carry)
        return carry

    def cond(state):
        k, carry = state
        return (k < n // _CHUNK) & jnp.logical_not(done(carry))

    def chunk_body(state):
        k, carry = state
        base = k * _CHUNK
        for jj in range(_CHUNK):
            carry = body(base + jj, carry)
        return k + 1, carry

    _, carry = jax.lax.while_loop(cond, chunk_body, (jnp.int32(0), carry))
    for j in range((n // _CHUNK) * _CHUNK, n):
        carry = body(j, carry)
    return carry


def _culled_sphere_fold(ns, body, carry, cull):
    """Fold ``body(j, carry, ok) -> carry`` over this tile's compact
    visible-sphere list (conservative cone cull — see :func:`_tile_visibility`).

    The ONE copy of the sentinel/count-clamp/index-guard semantics shared by
    the forward closest-hit (:func:`_closest_hit`) and the backward kernel's
    primary-trace folds (``render_bwd._fold_spheres_culled``) — the backward's
    exactness argument relies on sweeping exactly the spheres the forward
    swept, so the logic must live once. Semantics:

    - ``cull = (vis_ref, cnt_ref, tile_id, K)``; the flat list is indexed
      ``tile_id * K + slot`` (SMEM tables must be 1-D, see
      :func:`_tile_visibility`).
    - Sentinel count ``-1`` = the tile overflowed its K slots: sweep all
      ``ns`` spheres by identity index, so the cull is conservative at any K.
    - Chunk-unrolled ``fori_loop`` with an in-range guard ``ok`` instead of a
      static tail (the count is traced); out-of-range slots re-read a real
      index and MUST be masked by the body via ``ok``.
    """
    vis_ref, cnt_ref, tile_id, K = cull
    raw = cnt_ref[tile_id]
    full = raw < 0
    count = jnp.where(full, ns, raw)
    base_idx = tile_id * K

    def cull_chunk(k, carry):
        base = k * _CHUNK
        for q in range(_CHUNK):
            jj = base + q
            ok = jj < count
            jj_safe = jnp.where(ok, jj, 0)
            j = jnp.where(full, jj_safe,
                          vis_ref[base_idx + jnp.minimum(jj_safe, K - 1)])
            carry = body(j, carry, ok)
        return carry

    return jax.lax.fori_loop(0, (count + _CHUNK - 1) // _CHUNK,
                             cull_chunk, carry)


def _culled_sphere_fold_ee(ns, body, carry, cull, done):
    """:func:`_culled_sphere_fold` + the tile-coherent early exit of
    :func:`_fold_objects_early_exit` (monotone accumulations only): stop as
    soon as ``done(carry)`` saturates. Same sentinel/count-clamp/index-guard
    semantics — the trip count just gains a second exit condition."""
    vis_ref, cnt_ref, tile_id, K = cull
    raw = cnt_ref[tile_id]
    full = raw < 0
    count = jnp.where(full, ns, raw)
    base_idx = tile_id * K
    trips = (count + _CHUNK - 1) // _CHUNK

    def cond(state):
        k, c = state
        return (k < trips) & jnp.logical_not(done(c))

    def chunk(state):
        k, c = state
        base = k * _CHUNK
        for q in range(_CHUNK):
            jj = base + q
            ok = jj < count
            jj_safe = jnp.where(ok, jj, 0)
            j = jnp.where(full, jj_safe,
                          vis_ref[base_idx + jnp.minimum(jj_safe, K - 1)])
            c = body(j, c, ok)
        return k + 1, c

    _, carry = jax.lax.while_loop(cond, chunk, (jnp.int32(0), carry))
    return carry


def _tile_visibility(camera, scene, *, n_u, n_v, TW, TH, swap_xy, x_offset,
                     compat, K=None):
    """Conservative per-tile sphere visibility for the PRIMARY closest-hit sweep.

    For each pixel tile, bound its ray pencil by a cone through the four
    (±1-pixel-margined — covers AA half-offsets and the shared-sample pad row)
    corner directions; a sphere is kept iff its bounding ball meets the cone
    angularly (and, in compat mode, isn't entirely beyond the 999.0 far clip).
    The pencil of a planar pixel grid is convex, so the corner directions bound
    it exactly and a culled sphere provably misses every used ray of the tile:
    the culled sweep's closest hit is bit-identical to the full sweep. Bounce
    and shadow sweeps cannot use this cone (their origins scatter) and stay
    full. Returns visible-first index lists + counts as FLAT 1-D i32 arrays,
    shapes ``(n_u*n_v*(K or ns),)`` / ``(n_u*n_v,)`` — SMEM windows are
    allocated per row at ~512 B granularity (measured on v5e: an s32[1620,1]
    column costs 812 KB of the 1 MB SMEM), so 2-D tables are ruinous and the
    kernel indexes ``tile_id * K + slot`` into the flat list instead.

    ``K`` caps the per-tile list width. Tiles whose visible count exceeds ``K``
    get the sentinel count ``-1`` — the kernel falls back to sweeping all
    spheres for those tiles, so the cull stays conservative at any ``K``.
    """
    ns = scene.spheres.count
    focal, y0, dy, z0, dz = camera.grid_params(compat)
    u0 = (jnp.arange(n_u, dtype=jnp.float32) * TW)[:, None, None]  # (n_u,1,1)
    v0 = (jnp.arange(n_v, dtype=jnp.float32) * TH)[None, :, None]  # (1,n_v,1)
    cu = jnp.asarray([-1.0, -1.0, TW + 1.0, TW + 1.0], jnp.float32)
    cv = jnp.asarray([-1.0, TH + 1.0, -1.0, TH + 1.0], jnp.float32)
    u = u0 + cu[None, None, :]                                     # (n_u,n_v,4)
    v = v0 + cv[None, None, :]
    x_off = jnp.asarray(x_offset, jnp.float32)
    u, v = jnp.broadcast_arrays(u, v)                              # (n_u,n_v,4)
    if not swap_xy:
        gx, gy = u + x_off, v
    else:
        gx, gy = v + x_off, u
    p = jnp.stack([jnp.broadcast_to(focal, gx.shape),
                   y0 + gx * dy, z0 + gy * dz], axis=-1)           # (n_u,n_v,4,3)
    d = jnp.sum(camera.rotation * p[..., None, :], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    axis = jnp.sum(d, axis=2)
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)    # (n_u,n_v,3)
    cos_min = jnp.min(jnp.sum(d * axis[:, :, None, :], axis=-1), axis=2)
    theta = jnp.arccos(jnp.clip(cos_min, -1.0, 1.0)) + 1e-3

    w = scene.spheres.center[None, None] - camera.position          # (1,1,ns,3)
    dist = jnp.linalg.norm(w, axis=-1)                              # (1,1,ns)
    r = scene.spheres.radius[None, None]
    cos_a = jnp.sum(w * axis[:, :, None, :], axis=-1) / jnp.maximum(dist, 1e-12)
    alpha = jnp.arccos(jnp.clip(cos_a, -1.0, 1.0))                  # (n_u,n_v,ns)
    half = jnp.arcsin(jnp.clip(r / jnp.maximum(dist, 1e-12), 0.0, 1.0))
    visible = (dist <= r + 1e-3) | (alpha <= theta[..., None] + half + 1e-3)
    if compat:
        visible &= (dist - r) <= FAR
    visible = visible.reshape(n_u * n_v, ns)
    order = jnp.argsort(jnp.logical_not(visible).astype(jnp.int32),
                        axis=-1, stable=True).astype(jnp.int32)
    cnt = jnp.sum(visible, axis=-1, dtype=jnp.int32)
    if K is not None and K < ns:
        order = order[:, :K]
        cnt = jnp.where(cnt > K, jnp.int32(-1), cnt)
    return order.reshape(-1), cnt


# Spheres per Morton group (grouped bounce sweeps). 16 measured best at the
# 1000-sphere 1080p depth-2 scale (67.0 ms vs 69.3 at 32): finer groups admit
# tighter balls, and the doubled test count stays cheap relative to skipped
# member sweeps.
_GROUP_SIZE = 16


def _morton30(x, y, z):
    """30-bit Morton code from 10-bit quantized coordinates (u32)."""
    def spread(v):
        v = (v | (v << 16)) & jnp.uint32(0x030000FF)
        v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249249)
        return v
    return spread(x) | (spread(y) << 1) | (spread(z) << 2)


def _sphere_groups(centers, radii, group_size=None, order_from=None):
    """Spatially-clustered sphere groups for the runtime grouped bounce sweep.

    Morton-orders the sphere centers (10-bit quantization per axis over the
    scene AABB) and chunks the order into ``G = ceil(ns / group_size)``
    contiguous groups; returns ``(perm, bounds)``:

    * ``perm``: flat ``(G * group_size,)`` i32 sweep order (ORIGINAL sphere
      indices); pad slots past ``ns`` repeat index 0 and must be masked by the
      consumer's in-range guard — same contract as ``_culled_sphere_fold``.
    * ``bounds``: flat ``(G * 4,)`` f32 ``[cx, cy, cz, R]`` per group, with
      ``R`` inflated (relative + absolute slack) so every member ball is
      strictly inside: a ray — ANY origin and direction, which is what makes
      this usable for scattered bounce rays where the primary cone cull is
      unsound — that misses the group ball provably misses every member, so a
      skipped group changes nothing (the exactness argument of
      :func:`_grouped_sphere_fold`).

    Pure jnp (runs under jit with a traced scene); group count is static.
    """
    if group_size is None:
        group_size = _GROUP_SIZE
    ns = centers.shape[0]
    G = -(-ns // group_size)
    npad = G * group_size
    lo = jnp.min(centers, axis=0)
    span = jnp.maximum(jnp.max(centers, axis=0) - lo, 1e-6)
    q = jnp.clip(((centers - lo) / span * 1023.0), 0.0, 1023.0).astype(jnp.uint32)
    code = _morton30(q[:, 0], q[:, 1], q[:, 2])
    perm = jnp.argsort(code).astype(jnp.int32)                    # (ns,)
    perm_pad = jnp.concatenate(
        [perm, jnp.zeros((npad - ns,), jnp.int32)])               # (G*gs,)
    c_s = centers[perm_pad].reshape(G, group_size, 3)
    r_s = radii[perm_pad].reshape(G, group_size)
    valid = (jnp.arange(npad) < ns).reshape(G, group_size)
    w = valid.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)
    gc = jnp.sum(c_s * w[..., None], axis=1) / cnt                # (G, 3)
    dist = jnp.linalg.norm(c_s - gc[:, None, :], axis=-1) + r_s
    R = jnp.max(jnp.where(valid, dist, 0.0), axis=1)              # (G,)
    R = R * 1.001 + 1e-3          # conservative f32 slack (test is exact-free)
    if order_from is not None:
        # Visit groups roughly front-to-back from a reference point (the
        # camera): the closest-hit fold's t-prune then rejects far groups
        # once a near one has set every lane's best. Order-free semantics
        # (occlusion max / strict-< winner with the tie class) are unchanged;
        # members stay contiguous within their group.
        g_order = jnp.argsort(jnp.linalg.norm(
            gc - jnp.asarray(order_from, jnp.float32)[None, :], axis=-1))
        gc = gc[g_order]
        R = R[g_order]
        perm_pad = perm_pad.reshape(G, group_size)[g_order].reshape(-1)
    bounds = jnp.concatenate([gc, R[:, None]], axis=1).reshape(-1)
    return perm_pad, bounds.astype(jnp.float32)


def _grouped_sphere_fold(ns, body, refs, grp, ray, t_prune_ref=None,
                         t_prune_strict=True):
    """Fold ``body(j, carry, ok) -> carry`` over ALL spheres in Morton-group
    order, skipping whole groups whose bounding ball provably misses every
    lane's ray — the runtime cull for BOUNCE sweeps, where origins/directions
    scatter and the host-side primary cone (:func:`_tile_visibility`) is
    unsound.

    ``refs``: VMEM scratch refs carrying the fold state (``pl.when`` bodies
    cannot carry SSA values — the :func:`_any_hit_capsule` pattern). The
    caller initializes them; on return they hold the folded state. ``grp =
    (perm_ref, bnd_ref, G)`` (SMEM tables from :func:`_sphere_groups`);
    ``ray = (ox, oy, oz, dx, dy, dz, a, od, oo)`` hoisted sweep terms.

    Exactness: the group test is the root-form ray-ball test with NO far
    clip (conservative vs any member validity rule, compat or clean — a
    member hit at any positive t implies the enclosing ball is hit at some
    positive t); sweep ORDER is the Morton permutation, which moves
    exact-tie winners only (the documented near-tie class — ties between
    distinct spheres at bit-equal t). Pad slots carry ``ok=False``.

    ``t_prune_ref``: optional scratch ref holding a per-lane t bound. A
    member's hit t is >= the group ball's entry t (member ball inside the
    group ball; entry clamped at 0 for origin-inside lanes). With
    ``t_prune_strict=True`` (closest-hit folds) a group is kept only while
    ``entry < t``: the winner test is STRICT ``t_j < t``, so ``entry >= t``
    provably cannot improve any lane. With ``t_prune_strict=False``
    (attribute/adjoint folds masked by ``hit_obj``/``t_j == t``) the keep
    condition is ``entry <= t`` — the winning member satisfies it, and a
    skipped group provably contains no lane's winner. On dense scenes this
    prunes the groups behind the known hits.
    """
    perm_ref, bnd_ref, G = grp
    ox, oy, oz, dx, dy, dz, a, od, oo, inv2a = ray

    def gbody(g, _):
        b4 = 4 * g
        gx, gy, gz, gr = (bnd_ref[b4], bnd_ref[b4 + 1], bnd_ref[b4 + 2],
                          bnd_ref[b4 + 3])
        cd = gx * dx + gy * dy + gz * dz
        oc = gx * ox + gy * oy + gz * oz
        c = oo - 2.0 * oc + (gx * gx + gy * gy + gz * gz - gr * gr)
        b = 2.0 * (od - cd)
        disc = b * b - 4.0 * a * c
        sq = jnp.sqrt(jnp.where(disc >= 0.0, disc, 0.0))
        may = (disc >= 0.0) & ((-b + sq) > 0.0)
        if t_prune_ref is not None:
            entry = jnp.maximum((-b - sq) * inv2a, 0.0)
            bound = t_prune_ref[...]
            may &= (entry < bound) if t_prune_strict else (entry <= bound)

        @pl.when(jnp.max(may.astype(jnp.float32)) > 0.5)
        def _():
            carry = tuple(r[...] for r in refs)
            for q in range(_GROUP_SIZE):
                flat = g * _GROUP_SIZE + q
                j = perm_ref[flat]
                carry = body(j, carry, flat < ns)
            for r, v in zip(refs, carry):
                r[...] = v
        return 0

    jax.lax.fori_loop(0, G, gbody, 0)


def _closest_hit(sph, ns, pln, npl, ox, oy, oz, dx, dy, dz, *, compat, shape,
                 cull=None, grp=None, grp_refs=None):
    """Fused closest-hit over the SoA scene.

    Returns ``(t, ar, ag, ab, qx, qy, qz, is_plane)`` — ``q`` carries the hit
    sphere's center (normal computed after, from the hit point) or the hit plane's
    normal, selected per ray. Tie-break: strict ``<`` with spheres scanned first ==
    reference trace.py:22-39.
    """
    zeros = jnp.zeros(shape, jnp.float32)
    # compat far clip (999.0, reference trace.py:17) is enforced FOR FREE by the
    # strict `t_j < t` winner test when t starts at FAR — no per-object compare.
    t_init = FAR if compat else BIG
    t = jnp.full(shape, t_init, jnp.float32)
    ar, ag, ab = zeros, zeros, zeros
    qx, qy, qz = zeros, zeros, zeros
    is_pl = zeros  # f32 mask: Mosaic dislikes i1 carry vectors
    a = dx * dx + dy * dy + dz * dz
    inv2a = 1.0 / (2.0 * a)
    # Sweep-invariant hoists: b_j = 2(o.d - c_j.d), c_j = o.o - 2 o.c_j + (|c_j|^2
    # - r_j^2); o.d and o.o are computed once per sweep instead of per object.
    od = ox * dx + oy * dy + oz * dz
    oo = ox * ox + oy * oy + oz * oz

    def sphere_t(cx, cy, cz, r):
        cd = cx * dx + cy * dy + cz * dz
        oc = cx * ox + cy * oy + cz * oz
        b = 2.0 * (od - cd)
        c = oo - 2.0 * oc + (cx * cx + cy * cy + cz * cz - r * r)
        disc = b * b - 4.0 * a * c
        has = disc >= 0.0
        sq = jnp.sqrt(jnp.where(has, disc, 0.0))
        num_near = -b - sq
        num_far = -b + sq
        t_j = jnp.where(num_near > 0.0, num_near, num_far) * inv2a
        valid = has & (num_far > 0.0)  # far root >= near root always
        return t_j, valid

    def plane_t(px0, py0, pz0, nx, ny, nz):
        den = dx * nx + dy * ny + dz * nz
        den_safe = jnp.where(jnp.abs(den) > 1e-30, den, 1.0)
        num = (px0 - ox) * nx + (py0 - oy) * ny + (pz0 - oz) * nz
        t_j = num / den_safe
        eps = 1e-3 if compat else 1e-8
        valid = (jnp.abs(den) >= eps) & (t_j > 0.0)
        return t_j, valid

    def upd(state, t_j, valid, col, q, plane_flag):
        t, ar, ag, ab, qx, qy, qz, is_pl = state
        closer = valid & (t_j < t)
        t = jnp.where(closer, t_j, t)
        ar = jnp.where(closer, col[0], ar)
        ag = jnp.where(closer, col[1], ag)
        ab = jnp.where(closer, col[2], ab)
        qx = jnp.where(closer, q[0], qx)
        qy = jnp.where(closer, q[1], qy)
        qz = jnp.where(closer, q[2], qz)
        is_pl = jnp.where(closer, jnp.float32(plane_flag), is_pl)
        return t, ar, ag, ab, qx, qy, qz, is_pl

    def one_s(j, state, extra_valid=None):
        t_j, valid = sphere_t(sph[0, j], sph[1, j], sph[2, j], sph[3, j])
        if extra_valid is not None:
            valid = valid & extra_valid
        return upd(state, t_j, valid, (sph[4, j], sph[5, j], sph[6, j]),
                   (sph[0, j], sph[1, j], sph[2, j]), False)

    def one_p(j, state):
        t_j, valid = plane_t(pln[0, j], pln[1, j], pln[2, j],
                             pln[3, j], pln[4, j], pln[5, j])
        return upd(state, t_j, valid, (pln[6, j], pln[7, j], pln[8, j]),
                   (pln[3, j], pln[4, j], pln[5, j]), True)

    state = (t, ar, ag, ab, qx, qy, qz, is_pl)
    if cull is not None and ns > _UNROLL_LIMIT:
        # Primary sweep over this tile's visible-sphere index list only —
        # sentinel/count-clamp/index-guard semantics live in the shared
        # _culled_sphere_fold (one copy for forward + backward).
        state = _culled_sphere_fold(
            ns, lambda j, s, ok: one_s(j, s, extra_valid=ok), state, cull)
    elif grp is not None:
        # Bounce sweeps on rolled scenes: Morton-grouped fold with a runtime
        # whole-group ray-vs-ball skip (state via scratch — pl.when bodies
        # cannot carry SSA; refs are sliced to this chain's shape). refs[0]
        # is the running t — the fold prunes groups behind every lane's best.
        for r, v in zip(grp_refs, state):
            r[...] = v
        _grouped_sphere_fold(
            ns, lambda j, s, ok: one_s(j, s, extra_valid=ok), grp_refs, grp,
            (ox, oy, oz, dx, dy, dz, a, od, oo, inv2a),
            t_prune_ref=grp_refs[0])
        state = tuple(r[...] for r in grp_refs)
    else:
        state = _fold_objects(ns, one_s, state)
    state = _fold_objects(npl, one_p, state)
    return state


def _sphere_occ_cheap(cterm, g, a, inv_a, compat):
    """Sqrt-free sphere occlusion: segment-vs-ball closest-approach test.

    The ray hits the ball within the compat far clip iff the squared distance
    at the clamped closest-approach parameter ``tc = clamp(g/a, 0, FAR)`` is
    <= r^2, i.e. ``cterm <= tc*(2g - a*tc)`` (``g = d.(c-o)``, ``cterm =
    |o-c|^2 - r^2``). Exact vs the reference root-selection semantics
    (trace.py:92-96 + intersections.py:7-38) for every case — behind-origin,
    inside-sphere, far-clip — except spheres with radius >= FAR/2 whose far
    root can pass 999 while the segment is still inside (the caller falls back
    to the root-form sweep for such scenes; see ``render_image_pallas``), and
    exact-tie boundaries (strict ``<`` vs ``<=`` — measure-zero, same class as
    the kernel's documented near-tie pixel flips)."""
    tc = g * inv_a
    tc = jnp.clip(tc, 0.0, FAR) if compat else jnp.maximum(tc, 0.0)
    return cterm <= tc * (2.0 * g - a * tc)


def _any_hit(sph, ns, pln, npl, ox, oy, oz, dx, dy, dz, *, compat, shape,
             cheap=True):
    """Occlusion-only sweep (shadow rays) — single boolean carry."""
    occ = jnp.zeros(shape, jnp.float32)
    a = dx * dx + dy * dy + dz * dz
    inv2a = 1.0 / (2.0 * a)
    inv_a = inv2a + inv2a
    od = ox * dx + oy * dy + oz * dz
    oo = ox * ox + oy * oy + oz * oz

    def sphere_occ(occ, cx, cy, cz, r):
        cd = cx * dx + cy * dy + cz * dz
        oc = cx * ox + cy * oy + cz * oz
        c = oo - 2.0 * oc + (cx * cx + cy * cy + cz * cz - r * r)
        if cheap:
            valid = _sphere_occ_cheap(c, cd - od, a, inv_a, compat)
            return jnp.maximum(occ, valid.astype(jnp.float32))
        b = 2.0 * (od - cd)
        disc = b * b - 4.0 * a * c
        has = disc >= 0.0
        sq = jnp.sqrt(jnp.where(has, disc, 0.0))
        num_near = -b - sq
        num_far = -b + sq
        t_j = jnp.where(num_near > 0.0, num_near, num_far) * inv2a
        valid = has & (num_far > 0.0)  # far root >= near root always
        if compat:
            valid &= t_j < FAR
        return jnp.maximum(occ, valid.astype(jnp.float32))

    def plane_occ(occ, px0, py0, pz0, nx, ny, nz):
        den = dx * nx + dy * ny + dz * nz
        den_safe = jnp.where(jnp.abs(den) > 1e-30, den, 1.0)
        num = (px0 - ox) * nx + (py0 - oy) * ny + (pz0 - oz) * nz
        t_j = num / den_safe
        eps = 1e-3 if compat else 1e-8
        valid = (jnp.abs(den) >= eps) & (t_j > 0.0)
        if compat:
            valid &= t_j < FAR
        return jnp.maximum(occ, valid.astype(jnp.float32))

    # Planes first (a big ground plane saturates many lanes immediately), then
    # spheres with the tile-coherent early exit.
    occ = _fold_objects(
        npl, lambda j, o: plane_occ(o, pln[0, j], pln[1, j], pln[2, j],
                                    pln[3, j], pln[4, j], pln[5, j]), occ)
    occ = _fold_objects_early_exit(
        ns, lambda j, o: sphere_occ(o, sph[0, j], sph[1, j], sph[2, j],
                                    sph[3, j]), occ,
        done=lambda o: jnp.min(o) > 0.5)
    return occ


def _any_hit_multi(sph, ns, pln, npl, ox, oy, oz, dirs, *, compat, shape,
                   cheap=True):
    """Shadow occlusion for several unit directions from the SAME origins.

    Hoists every origin-only term (o.o, per-object o.c and |c|^2-r^2, per-plane
    numerators) out of the per-light loop — the per-(light, object) work drops
    to the direction-dependent part only. Small scenes unroll the object axis;
    large scenes chunk-unroll it with the same hoisting (the per-chunk sphere
    scalars and origin terms are computed once and reused by every light).
    ``cheap`` selects the sqrt-free segment test (see _sphere_occ_cheap)."""
    nl = len(dirs)
    oo = ox * ox + oy * oy + oz * oz
    eps = 1e-3 if compat else 1e-8
    a_l, inv2a_l, od_l = [], [], []
    for (dx, dy, dz) in dirs:
        a = dx * dx + dy * dy + dz * dz
        a_l.append(a)
        inv2a_l.append(1.0 / (2.0 * a))
        od_l.append(ox * dx + oy * dy + oz * dz)
    inva_l = [v + v for v in inv2a_l]

    def sphere_all_lights(occs, cx, cy, cz, r):
        oc = cx * ox + cy * oy + cz * oz
        cterm = oo - 2.0 * oc + (cx * cx + cy * cy + cz * cz - r * r)
        out = []
        for l, (dx, dy, dz) in enumerate(dirs):
            cd = cx * dx + cy * dy + cz * dz
            if cheap:
                valid = _sphere_occ_cheap(cterm, cd - od_l[l], a_l[l],
                                          inva_l[l], compat)
                out.append(jnp.maximum(occs[l], valid.astype(jnp.float32)))
                continue
            b = 2.0 * (od_l[l] - cd)
            disc = b * b - 4.0 * a_l[l] * cterm
            has = disc >= 0.0
            sq = jnp.sqrt(jnp.where(has, disc, 0.0))
            num_near = -b - sq
            num_far = -b + sq
            t_j = jnp.where(num_near > 0.0, num_near, num_far) * inv2a_l[l]
            valid = has & (num_far > 0.0)  # far root >= near root always
            if compat:
                valid &= t_j < FAR
            out.append(jnp.maximum(occs[l], valid.astype(jnp.float32)))
        return tuple(out)

    # Planes first (occlusion is order-free, and saturating lanes early lets
    # the sphere fold's tile-coherent exit fire sooner on rolled scenes).
    occs = [jnp.zeros(shape, jnp.float32) for _ in range(nl)]
    for j in range(npl):
        nx, ny, nz = pln[3, j], pln[4, j], pln[5, j]
        pnum = ((pln[0, j] - ox) * nx + (pln[1, j] - oy) * ny +
                (pln[2, j] - oz) * nz)
        for l, (dx, dy, dz) in enumerate(dirs):
            den = dx * nx + dy * ny + dz * nz
            den_safe = jnp.where(jnp.abs(den) > 1e-30, den, 1.0)
            t_j = pnum / den_safe
            valid = (jnp.abs(den) >= eps) & (t_j > 0.0)
            if compat:
                valid &= t_j < FAR
            occs[l] = jnp.maximum(occs[l], valid.astype(jnp.float32))

    def _all_saturated(occs):
        sat = jnp.min(occs[0]) > 0.5
        for o in occs[1:]:
            sat &= jnp.min(o) > 0.5
        return sat

    occs = _fold_objects_early_exit(
        ns, lambda j, o: sphere_all_lights(o, sph[0, j], sph[1, j], sph[2, j],
                                           sph[3, j]), tuple(occs),
        done=_all_saturated)
    return list(occs)


def _any_hit_multi_grouped(sph, ns, pln, npl, ox, oy, oz, dirs, grp, occ_refs,
                           *, compat, shape, cheap=True):
    """BOUNCE-level shadow occlusion over Morton groups with per-lane pruning.

    Same origin-term hoisting across lights as :func:`_any_hit_multi`, but
    the sphere axis runs in Morton-group order (``grp`` from
    :func:`_sphere_groups`, ORIGINAL indices) and a whole group is swept only
    when SOME lane (a) is not yet occluded for some light and (b) has that
    light's shadow ray hitting the group ball at a positive t before the
    compat range ends. Both prunes are conservative — occlusion accumulates
    as an order-free max, so results are bit-identical to the full sweep:

    * member inside the group ball => a member occlusion at t implies the
      ball is hit at some positive entry t' <= t, and under the compat far
      clip t < FAR implies entry < FAR;
    * an occluded lane (occ >= 1) cannot change (max-accumulation).

    Shadow rays aim AT a light, so few groups lie along them — the geometry
    this cull exists for. State lives in ``occ_refs`` (pl.when bodies cannot
    carry SSA values); combined with the saturation early exit in the
    while_loop condition. Pad slots carry ``ok=False``.
    """
    nl = len(dirs)
    perm_ref, bnd_ref, G = grp
    refs = occ_refs[:nl]
    oo = ox * ox + oy * oy + oz * oz
    eps = 1e-3 if compat else 1e-8
    a_l, inv2a_l, od_l = [], [], []
    for (dx, dy, dz) in dirs:
        a = dx * dx + dy * dy + dz * dz
        a_l.append(a)
        inv2a_l.append(1.0 / (2.0 * a))
        od_l.append(ox * dx + oy * dy + oz * dz)
    inva_l = [v + v for v in inv2a_l]

    # Planes first (saturate early), SSA, then park in the scratch refs.
    occs = [jnp.zeros(shape, jnp.float32) for _ in range(nl)]
    for j in range(npl):
        nx, ny, nz = pln[3, j], pln[4, j], pln[5, j]
        pnum = ((pln[0, j] - ox) * nx + (pln[1, j] - oy) * ny +
                (pln[2, j] - oz) * nz)
        for l, (dx, dy, dz) in enumerate(dirs):
            den = dx * nx + dy * ny + dz * nz
            den_safe = jnp.where(jnp.abs(den) > 1e-30, den, 1.0)
            t_j = pnum / den_safe
            valid = (jnp.abs(den) >= eps) & (t_j > 0.0)
            if compat:
                valid &= t_j < FAR
            occs[l] = jnp.maximum(occs[l], valid.astype(jnp.float32))
    for rr, v in zip(refs, occs):
        rr[...] = v

    def loop_cond(k):
        sat = jnp.min(refs[0][...]) > 0.5
        for rr in refs[1:]:
            sat &= jnp.min(rr[...]) > 0.5
        return (k < G) & jnp.logical_not(sat)

    def loop_body(k):
        b4 = 4 * k
        gx, gy, gz, gR = (bnd_ref[b4], bnd_ref[b4 + 1], bnd_ref[b4 + 2],
                          bnd_ref[b4 + 3])
        oc = gx * ox + gy * oy + gz * oz
        cterm = oo - 2.0 * oc + (gx * gx + gy * gy + gz * gz - gR * gR)
        may = None
        for l, (dx, dy, dz) in enumerate(dirs):
            cd = gx * dx + gy * dy + gz * dz
            b = 2.0 * (od_l[l] - cd)
            disc = b * b - 4.0 * a_l[l] * cterm
            sq = jnp.sqrt(jnp.where(disc >= 0.0, disc, 0.0))
            hit = (disc >= 0.0) & ((-b + sq) > 0.0)
            if compat:
                # entry <= any member's occluding t; t < FAR needed there
                hit &= ((-b - sq) * inv2a_l[l]) < FAR
            m = hit & (refs[l][...] < 0.5)
            may = m if may is None else (may | m)

        @pl.when(jnp.max(may.astype(jnp.float32)) > 0.5)
        def _():
            os_ = [rr[...] for rr in refs]
            for q in range(_GROUP_SIZE):
                flat = k * _GROUP_SIZE + q
                j = perm_ref[flat]
                ok = flat < ns
                cx, cy, cz, r = sph[0, j], sph[1, j], sph[2, j], sph[3, j]
                ocj = cx * ox + cy * oy + cz * oz
                c = oo - 2.0 * ocj + (cx * cx + cy * cy + cz * cz - r * r)
                for l, (dx, dy, dz) in enumerate(dirs):
                    cd = cx * dx + cy * dy + cz * dz
                    if cheap:
                        valid = _sphere_occ_cheap(c, cd - od_l[l], a_l[l],
                                                  inva_l[l], compat)
                    else:
                        bj = 2.0 * (od_l[l] - cd)
                        dj = bj * bj - 4.0 * a_l[l] * c
                        has = dj >= 0.0
                        sqj = jnp.sqrt(jnp.where(has, dj, 0.0))
                        nn, nf = -bj - sqj, -bj + sqj
                        t_j = jnp.where(nn > 0.0, nn, nf) * inv2a_l[l]
                        valid = has & (nf > 0.0)
                        if compat:
                            valid &= t_j < FAR
                    valid &= ok
                    os_[l] = jnp.maximum(os_[l], valid.astype(jnp.float32))
            for rr, v in zip(refs, os_):
                rr[...] = v
        return k + 1

    jax.lax.while_loop(loop_cond, loop_body, jnp.int32(0))
    return [rr[...] for rr in refs]


def _any_hit_listed(sph, ns, pln, npl, ox, oy, oz, dirs, lists, *, compat,
                    shape, cheap=True):
    """Level-0 shadow occlusion over the two-pass per-(tile,light) occluder
    lists (see :func:`_shadow_visibility_lists`).

    ``lists = (idx_ref, cnt_ref, row_base, K, nl)`` with ``row_base =
    tile_id * (depth+1) + trace_level``; light ``l``'s compact list lives at
    flat row ``row_base * nl + l``. ``sph`` must be the
    angular-size-SORTED geometry table (``sph_sh``) — the lists index it, so
    the ``-1`` overflow sentinel's full identity sweep degrades to exactly the
    sorted sweep :func:`_any_hit_multi` runs, early exit included (count ``0``
    -> the tile has no live primary hits and the sphere sweep vanishes).
    Unlike :func:`_any_hit_multi` there is no cross-light origin-term sharing
    — each light sweeps a different sphere subset — but K is a small fraction
    of ``ns``, which is the whole point."""
    idx_ref, cnt_ref, row_base, K, nl_total = lists
    occ0 = jnp.zeros(shape, jnp.float32)
    eps = 1e-3 if compat else 1e-8
    oo = ox * ox + oy * oy + oz * oz

    # Planes: unrolled with the per-light numerator hoist (same as
    # _any_hit_multi — plane counts are small by the caller's guard).
    occs = [occ0 for _ in dirs]
    for j in range(npl):
        nx, ny, nz = pln[3, j], pln[4, j], pln[5, j]
        pnum = ((pln[0, j] - ox) * nx + (pln[1, j] - oy) * ny +
                (pln[2, j] - oz) * nz)
        for l, (dx, dy, dz) in enumerate(dirs):
            den = dx * nx + dy * ny + dz * nz
            den_safe = jnp.where(jnp.abs(den) > 1e-30, den, 1.0)
            t_j = pnum / den_safe
            valid = (jnp.abs(den) >= eps) & (t_j > 0.0)
            if compat:
                valid &= t_j < FAR
            occs[l] = jnp.maximum(occs[l], valid.astype(jnp.float32))

    for l, (dx, dy, dz) in enumerate(dirs):
        a = dx * dx + dy * dy + dz * dz
        inv2a = 1.0 / (2.0 * a)
        inv_a = inv2a + inv2a
        od = ox * dx + oy * dy + oz * dz

        def body(j, occ, ok, dx=dx, dy=dy, dz=dz, a=a, inv2a=inv2a,
                 inv_a=inv_a, od=od):
            cx, cy, cz, r = sph[0, j], sph[1, j], sph[2, j], sph[3, j]
            cd = cx * dx + cy * dy + cz * dz
            oc = cx * ox + cy * oy + cz * oz
            c = oo - 2.0 * oc + (cx * cx + cy * cy + cz * cz - r * r)
            if cheap:
                valid = _sphere_occ_cheap(c, cd - od, a, inv_a, compat)
            else:
                b = 2.0 * (od - cd)
                disc = b * b - 4.0 * a * c
                has = disc >= 0.0
                sq = jnp.sqrt(jnp.where(has, disc, 0.0))
                num_near = -b - sq
                num_far = -b + sq
                t_j = jnp.where(num_near > 0.0, num_near, num_far) * inv2a
                valid = has & (num_far > 0.0)
                if compat:
                    valid &= t_j < FAR
            valid &= ok
            return jnp.maximum(occ, valid.astype(jnp.float32))

        occs[l] = _culled_sphere_fold_ee(
            ns, body, occs[l], (idx_ref, cnt_ref, row_base * nl_total + l, K),
            done=lambda o: jnp.min(o) > 0.5)
    return occs


def _any_hit_capsule(sph, ns, pln, npl, ox, oy, oz, dx, dy, dz, lx, ly, lz,
                     occ_ref, *, compat, shape, cheap=True):
    """Rolled-scene shadow sweep with a runtime swept-region cull per chunk.

    All shadow rays of this tile start at origins inside the tile's (unmasked)
    origin AABB and pass exactly through the point light, then CONTINUE past
    it — the reference's any-hit counts occluders at any ``0 < t < FAR``
    (unbounded in clean mode), so a sphere beyond the light still shadows
    (trace.py:17 semantics). The swept region is therefore the union of
    (a) the capsule of half-diagonal radius around segment box-center->light
    (the origin->light portions) and (b) the cone of lines through the light
    from points of the origin ball, extended ``FAR`` beyond it (the
    continuations). A sphere chunk whose members all miss both (by a
    conservative ``r``-Minkowski margin) cannot occlude any lane and its
    vector sweep is skipped via ``pl.when``; if the light sits inside (or
    within 2 half-diagonals of) the AABB the cone is ill-defined and the cull
    disables itself. The tests are scalar-unit work (dynamic SMEM reads);
    occlusion accumulates in a VMEM scratch ref because ``pl.when`` bodies
    cannot carry SSA values. Exact: skipped chunks provably contribute
    nothing (tests/test_pallas.py::test_pallas_shadow_cull_exact, incl. an
    occluder placed beyond the light).
    """
    occ = jnp.zeros(shape, jnp.float32)
    eps = 1e-3 if compat else 1e-8
    for j in range(npl):
        nx, ny, nz = pln[3, j], pln[4, j], pln[5, j]
        den = dx * nx + dy * ny + dz * nz
        den_safe = jnp.where(jnp.abs(den) > 1e-30, den, 1.0)
        num = (pln[0, j] - ox) * nx + (pln[1, j] - oy) * ny + (pln[2, j] - oz) * nz
        t_j = num / den_safe
        valid = (jnp.abs(den) >= eps) & (t_j > 0.0)
        if compat:
            valid &= t_j < FAR
        occ = jnp.maximum(occ, valid.astype(jnp.float32))
    occ_ref[...] = occ

    # tile origin AABB -> capsule axis (box center -> light), radius half-diag
    blo = (jnp.min(ox), jnp.min(oy), jnp.min(oz))
    bhi = (jnp.max(ox), jnp.max(oy), jnp.max(oz))
    bx, by, bz = ((blo[0] + bhi[0]) * 0.5, (blo[1] + bhi[1]) * 0.5,
                  (blo[2] + bhi[2]) * 0.5)
    ex, ey, ez = bhi[0] - bx, bhi[1] - by, bhi[2] - bz
    hdiag = jnp.sqrt(ex * ex + ey * ey + ez * ez)
    sx, sy, sz = lx - bx, ly - by, lz - bz
    ss = jnp.maximum(sx * sx + sy * sy + sz * sz, 1e-12)
    dlb = jnp.sqrt(ss)
    # beyond-the-light cone: unit axis away from the box, slope = the widest
    # angle a line through the light and the origin ball can make with it
    cull_ok = dlb > 2.0 * hdiag      # else cone ill-defined: cull nothing
    inv_dlb = 1.0 / dlb
    ux, uy, uz = sx * inv_dlb, sy * inv_dlb, sz * inv_dlb
    slope = hdiag / jnp.maximum(dlb - hdiag, 1e-6)
    rmink = jnp.sqrt(1.0 + slope * slope)   # r-Minkowski margin factor
    extent = FAR if compat else 1e9         # clean mode: unbounded range

    a = dx * dx + dy * dy + dz * dz
    inv2a = 1.0 / (2.0 * a)
    inv_a = inv2a + inv2a
    od = ox * dx + oy * dy + oz * dz
    oo = ox * ox + oy * oy + oz * oz

    def sphere_occ(o, cx, cy, cz, r):
        cd = cx * dx + cy * dy + cz * dz
        oc = cx * ox + cy * oy + cz * oz
        c = oo - 2.0 * oc + (cx * cx + cy * cy + cz * cz - r * r)
        if cheap:
            valid = _sphere_occ_cheap(c, cd - od, a, inv_a, compat)
            return jnp.maximum(o, valid.astype(jnp.float32))
        b = 2.0 * (od - cd)
        disc = b * b - 4.0 * a * c
        has = disc >= 0.0
        sq = jnp.sqrt(jnp.where(has, disc, 0.0))
        num_near = -b - sq
        num_far = -b + sq
        t_j = jnp.where(num_near > 0.0, num_near, num_far) * inv2a
        valid = has & (num_far > 0.0)
        if compat:
            valid &= t_j < FAR
        return jnp.maximum(o, valid.astype(jnp.float32))

    def visible(j):
        cx, cy, cz, r = sph[0, j], sph[1, j], sph[2, j], sph[3, j]
        wx, wy, wz = cx - bx, cy - by, cz - bz
        ws = wx * sx + wy * sy + wz * sz
        tt = jnp.clip(ws / ss, 0.0, 1.0)
        d2 = (wx * wx + wy * wy + wz * wz) - 2.0 * tt * ws + tt * tt * ss
        reach = r + hdiag + 1e-3
        near_seg = d2 <= reach * reach
        # past-the-light continuation: lateral distance from the cone axis
        # must exceed the cone's conservative allowance at this axial depth
        vx, vy, vz = cx - lx, cy - ly, cz - lz
        proj = vx * ux + vy * uy + vz * uz
        lat2 = jnp.maximum(vx * vx + vy * vy + vz * vz - proj * proj, 0.0)
        allow = proj * slope + (r + 1e-3) * rmink
        in_cone = ((proj > -r) & (proj < extent + r) &
                   (lat2 <= allow * allow) & (allow > 0.0))
        return near_seg | in_cone | ~cull_ok

    # while_loop with a scalar-only carry: combines the capsule cull with the
    # tile-coherent early exit (stop once every lane is occluded — monotone).
    def loop_cond(k):
        return (k < ns // _CHUNK) & (jnp.min(occ_ref[...]) < 0.5)

    def loop_body(k):
        base = k * _CHUNK
        vis = visible(base)
        for q in range(1, _CHUNK):
            vis = vis | visible(base + q)

        @pl.when(vis)
        def _():
            o = occ_ref[...]
            for q in range(_CHUNK):
                j = base + q
                o = sphere_occ(o, sph[0, j], sph[1, j], sph[2, j], sph[3, j])
            occ_ref[...] = o
        return k + 1

    jax.lax.while_loop(loop_cond, loop_body, jnp.int32(0))
    o = occ_ref[...]
    for j in range((ns // _CHUNK) * _CHUNK, ns):
        o = sphere_occ(o, sph[0, j], sph[1, j], sph[2, j], sph[3, j])
    return o


def _primary_geometry(sph, ns, pln, npl, ox, oy, oz, dx, dy, dz, *, compat,
                      shape, cull=None, grp=None, grp_refs=None):
    """Closest hit -> biased hit points + normals + hit albedo.

    Shared verbatim by :func:`_trace` and the two-pass shadow pipeline's hit
    AABB kernel (:func:`_hit_aabb_pallas`) — the AABB pass must produce the
    exact same biased hit points the shading pass will originate its level-0
    shadow rays from, or the per-(tile,light) occluder lists lose their
    conservative-coverage guarantee (so when the render pass runs the grouped
    bounce fold, the prepass must too — same ``grp`` tables, same order)."""
    t, ar, ag, ab, qx, qy, qz, is_pl = _closest_hit(
        sph, ns, pln, npl, ox, oy, oz, dx, dy, dz, compat=compat, shape=shape,
        cull=cull, grp=grp, grp_refs=grp_refs)
    alive = t < (FAR if compat else BIG * 0.5)
    ts = jnp.where(alive, t, 0.0)
    Px, Py, Pz = ox + ts * dx, oy + ts * dy, oz + ts * dz
    # Normal: plane -> q holds the normal; sphere -> q holds the center.
    sx, sy, sz = Px - qx, Py - qy, Pz - qz
    sn = _rnorm(sx, sy, sz)
    plane_hit = is_pl > 0.5
    nx = jnp.where(plane_hit, qx, sx * sn)
    ny = jnp.where(plane_hit, qy, sy * sn)
    nz = jnp.where(plane_hit, qz, sz * sn)
    Px, Py, Pz = Px + BIAS * nx, Py + BIAS * ny, Pz + BIAS * nz
    return alive, Px, Py, Pz, nx, ny, nz, ar, ag, ab


def _reflect_dir(dx, dy, dz, nx, ny, nz):
    """Normalized mirror direction ``d - 2(d.n)n`` (reference common.py:114-120).

    Shared by :func:`_trace` and the hit-extent prepass so bounce-chain
    geometry is bit-identical between the two passes."""
    ddn = dx * nx + dy * ny + dz * nz
    rx, ry, rz = dx - 2.0 * ddn * nx, dy - 2.0 * ddn * ny, dz - 2.0 * ddn * nz
    rn = _rnorm(rx, ry, rz)
    return rx * rn, ry * rn, rz * rn


def _make_hit_extent_kernel(*, W, H, TW, TH, ns, npl, compat, swap_xy,
                            chains, culled, vis_k, n_levels):
    """Pass 1 of the two-pass shadow pipeline: per-(tile, trace-level)
    alive-hit AABBs.

    For every sample chain the render kernel will evaluate (``chains`` =
    ``(shape, du, dv, row_lim, col_lim)`` tuples mirroring the shared-AA
    grids), run the SAME analytic ray-gen + culled closest-hit + bounce-chain
    geometry (:func:`_raygen` / :func:`_primary_geometry` / :func:`_reflect_dir`
    — bit-identical biased hit points at every trace level; level-0 sweeps
    take the cone cull, bounce sweeps are full, exactly like the render pass)
    and fold per-level masked min/max AABBs over the lanes whose shadow
    occlusion the render pass can actually consume: cumulative-alive (a lane
    dead at level ``l`` contributes weight 0 to every level ``>= l``), inside
    the global image (``[0, W-1] x [0, H-1]`` covers every consumed sample —
    edge pixels consume only their center sample, interior AA samples sit at
    half-offsets strictly inside), and within the chain's shared-row/col
    limits (pad rows past the +1 halo are discarded by the consumer and may
    hit cone-culled spheres, so they must not widen the AABB).

    Writes 8 SMEM f32 slots per (tile, level) at ``(tile_id*n_levels +
    level) * 8``: min xyz, max xyz, used-lane count, pad. ``n_levels`` may be
    < depth+1: deeper levels keep the plain sorted sweep and the prepass
    chain stops early. Grid steps write disjoint slots (TPU grids are
    sequential)."""
    def kernel(params, sph, pln, *rest):
        rest = list(rest)
        vis_cnt = (rest.pop(0), rest.pop(0)) if culled else None
        out_ref = rest[0]
        i = pl.program_id(0)
        j = pl.program_id(1)
        tile_id = i * pl.num_programs(1) + j
        cull = (vis_cnt[0], vis_cnt[1], tile_id, vis_k) if culled else None
        fu = (i * TW).astype(jnp.float32)
        fv = (j * TH).astype(jnp.float32)
        if not swap_xy:
            fu = fu + params[_P_X0]
        else:
            fv = fv + params[_P_X0]
        big = jnp.float32(BIG)
        mns = [[big] * 3 for _ in range(n_levels)]
        mxs = [[-big] * 3 for _ in range(n_levels)]
        tots = [jnp.float32(0.0)] * n_levels
        for (shp, du, dv, row_lim, col_lim) in chains:
            iu = jax.lax.broadcasted_iota(jnp.int32, shp, 0)
            iv = jax.lax.broadcasted_iota(jnp.int32, shp, 1)
            u = fu + du + iu.astype(jnp.float32)
            v = fv + dv + iv.astype(jnp.float32)
            px, py = (u, v) if not swap_xy else (v, u)
            inb = ((px >= 0.0) & (px <= W - 1.0) &
                   (py >= 0.0) & (py <= H - 1.0))
            if row_lim is not None:
                inb &= iu <= row_lim
            if col_lim is not None:
                inb &= iv <= col_lim
            ox, oy, oz, dx, dy, dz = _raygen(params, px, py)
            cum = None
            for level in range(n_levels):
                alive, Px, Py, Pz, nx, ny, nz, _ar, _ag, _ab = \
                    _primary_geometry(sph, ns, pln, npl, ox, oy, oz,
                                      dx, dy, dz, compat=compat, shape=shp,
                                      cull=cull if level == 0 else None)
                cum = alive if cum is None else (cum & alive)
                used = cum & inb
                for c, P in enumerate((Px, Py, Pz)):
                    mns[level][c] = jnp.minimum(
                        mns[level][c], jnp.min(jnp.where(used, P, big)))
                    mxs[level][c] = jnp.maximum(
                        mxs[level][c], jnp.max(jnp.where(used, P, -big)))
                tots[level] = tots[level] + jnp.sum(used.astype(jnp.float32))
                if level + 1 < n_levels:
                    dx, dy, dz = _reflect_dir(dx, dy, dz, nx, ny, nz)
                    ox = Px + BIAS * dx
                    oy = Py + BIAS * dy
                    oz = Pz + BIAS * dz
        for level in range(n_levels):
            base = (tile_id * n_levels + level) * 8
            for c in range(3):
                out_ref[base + c] = mns[level][c]
                out_ref[base + 3 + c] = mxs[level][c]
            out_ref[base + 6] = tots[level]
            out_ref[base + 7] = jnp.float32(0.0)

    return kernel


def _hit_extents_pallas(params, sph, pln, *, W, H, n_u, n_v, TW, TH, ns, npl,
                        compat, swap_xy, aliasing, culled, vis_tabs, vis_k,
                        interpret, n_levels):
    """Run the hit-extent pass; returns ``(n_tiles*n_levels, 8)`` f32 AABB
    rows, levels fastest."""
    if aliasing:
        # Union of all 9 AA sample positions == the 4 shared grids (centers,
        # both half-axes, corners) — identical for the shared and per-sample
        # kernels, which sample the same midpoint lattice (kernels.py:43-50).
        chains = (((TW, TH), 0.0, 0.0, None, None),
                  ((TW + 8, TH), -0.5, 0.0, TW, None),
                  ((TW, TH + 1), 0.0, -0.5, None, TH),
                  ((TW + 8, TH + 1), -0.5, -0.5, TW, TH))
    else:
        chains = (((TW, TH), 0.0, 0.0, None, None),)
    kernel = _make_hit_extent_kernel(W=W, H=H, TW=TW, TH=TH, ns=ns, npl=npl,
                                     compat=compat, swap_xy=swap_xy,
                                     chains=chains, culled=culled, vis_k=vis_k,
                                     n_levels=n_levels)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [smem(), smem(), smem()]
    args = [params, sph, pln]
    if culled:
        in_specs += [smem(), smem()]
        args += [vis_tabs[0], vis_tabs[1]]
    n_rows = n_u * n_v * n_levels
    out = pl.pallas_call(
        kernel,
        grid=(n_u, n_v),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows * 8,), jnp.float32),
        interpret=interpret,
    )(*args)
    return out.reshape(n_rows, 8)


def _shadow_visibility_lists(ext, lights, centers, radii, *, nl, K, compat,
                             to_sorted=None):
    """Per-(tile, light) conservative occluder lists from hit-extent AABBs.

    A sphere can occlude some level-0 shadow ray of a tile iff it meets the
    region swept by rays from points of the tile's hit AABB through the light,
    extended ``FAR`` beyond it (the reference's any-hit counts occluders at any
    ``0 < t < FAR`` along the unit ray — beyond the light still shadows,
    trace.py:92-96). Same capsule + beyond-the-light-cone test as the runtime
    cull (:func:`_any_hit_capsule`), evaluated host-side over all (tile, light,
    sphere) triples; tiles with no used hits cull everything (count 0 — sky
    tiles pay zero sphere sweeps). Overflowing rows get the ``-1`` sentinel
    (full sweep), so any ``K`` is conservative.

    Within a row, entries are ordered by apparent angular size from that
    light (``r / |c - L|``, descending) so the consumer's tile-coherent early
    exit saturates in the fewest chunks; ``to_sorted`` (original index ->
    position in the sorted ``sph_sh`` table) remaps entries so overflow rows'
    identity sweeps degrade to the plain sorted sweep.

    Returns flat ``(T*nl*K,)`` index and ``(T*nl,)`` count i32 tables; row
    ``tile_id * nl + l`` is light ``l``'s list for the tile."""
    lo, hi = ext[:, 0:3], ext[:, 3:6]                       # (T, 3)
    has = ext[:, 6] > 0.5                                   # (T,)
    b = 0.5 * (lo + hi)
    e = 0.5 * (hi - lo)
    hdiag = jnp.linalg.norm(e, axis=-1)                     # (T,)
    # Scale-aware slack: the b/e/hdiag arithmetic above rounds at ~0.5 ULP of
    # the coordinate MAGNITUDE, so a fixed absolute slack stops covering f32
    # rounding once scene coordinates reach ~1e4 and the conservative-coverage
    # proof would become merely probable. A few ULP of the largest
    # participating coordinate keeps it proven at any scale (== the old 1e-3
    # for scenes under ~500 units; demo scenes are ~10). Hitless rows carry
    # +/-BIG AABB sentinels and MUST NOT feed the scale (they cull to count 0
    # via `has` regardless).
    coord = jnp.where(has[:, None], jnp.maximum(jnp.abs(lo), jnp.abs(hi)), 0.0)
    scale = jnp.maximum(jnp.max(coord), jnp.max(jnp.abs(lights)))
    slack = jnp.maximum(jnp.float32(1e-3), jnp.float32(2e-6) * scale)
    s = lights[None, :, :] - b[:, None, :]                  # (T, nl, 3)
    ss = jnp.maximum(jnp.sum(s * s, axis=-1), 1e-12)        # (T, nl)
    dlb = jnp.sqrt(ss)
    cull_ok = dlb > 2.0 * hdiag[:, None]
    u = s / dlb[..., None]
    slope = hdiag[:, None] / jnp.maximum(dlb - hdiag[:, None], 1e-6)
    rmink = jnp.sqrt(1.0 + slope * slope)
    extent = FAR if compat else 1e9

    w = centers[None, None, :, :] - b[:, None, None, :]     # (T, 1, ns, 3)
    ws = jnp.sum(w * s[:, :, None, :], axis=-1)             # (T, nl, ns)
    tt = jnp.clip(ws / ss[:, :, None], 0.0, 1.0)
    d2 = (jnp.sum(w * w, axis=-1) - 2.0 * tt * ws + tt * tt * ss[:, :, None])
    reach = radii[None, None, :] + hdiag[:, None, None] + slack
    near_seg = d2 <= reach * reach

    v = centers[None, None, :, :] - lights[None, :, None, :]  # (1, nl, ns, 3)
    proj = jnp.sum(v * u[:, :, None, :], axis=-1)             # (T, nl, ns)
    lat2 = jnp.maximum(jnp.sum(v * v, axis=-1) - proj * proj, 0.0)
    allow = proj * slope[:, :, None] + (radii[None, None, :] + slack) * \
        rmink[:, :, None]
    in_cone = ((proj > -radii[None, None, :]) &
               (proj < extent + radii[None, None, :]) &
               (lat2 <= allow * allow) & (allow > 0.0))

    visible = (near_seg | in_cone | ~cull_ok[:, :, None]) & has[:, None, None]
    T = ext.shape[0]
    ns = centers.shape[0]
    # Visible-first, biggest-apparent-occluder-first within each row.
    ang = radii[None, :] / jnp.maximum(
        jnp.linalg.norm(centers[None, :, :] - lights[:, None, :], axis=-1),
        1e-6)                                               # (nl, ns)
    sortkey = jnp.where(visible, -ang[None, :, :], jnp.float32(BIG))
    visible = visible.reshape(T * nl, ns)
    order = jnp.argsort(sortkey.reshape(T * nl, ns), axis=-1).astype(jnp.int32)
    cnt = jnp.sum(visible, axis=-1, dtype=jnp.int32)
    if K < ns:
        order = order[:, :K]
        cnt = jnp.where(cnt > K, jnp.int32(-1), cnt)
    if to_sorted is not None:
        order = to_sorted[order]
    return order.reshape(-1), cnt


def _trace(params, sph, ns, pln, npl, lts, nl,
           ox, oy, oz, dx, dy, dz, *, compat, shape, cull=None,
           shadow_scratch=None, cheap_shadow=True, sph_sh=None,
           sh_lists=None, grp=None, grp_refs=None):
    """One shading evaluation == reference ``trace`` (trace.py:45-112), tile-wide.

    Returns ``(r, g, b, Px, Py, Pz, Rx, Ry, Rz, alive)``. ``cull`` (primary
    traces only) restricts the closest-hit sphere sweep to the tile's
    cone-visible list; ``shadow_scratch`` (a VMEM ref, rolled scenes) enables
    the runtime capsule cull for shadow sweeps; ``sh_lists`` (with this
    trace level's row base) routes shadow sweeps through the two-pass
    per-(tile,level,light) occluder lists (:func:`_any_hit_listed`); ``grp``
    + ``grp_refs`` (BOUNCE traces on rolled scenes) route the closest-hit
    sweep through the Morton-grouped runtime cull
    (:func:`_grouped_sphere_fold`)."""
    amb = params[_P_AMB]
    lamb = params[_P_LAMB]
    alive, Px, Py, Pz, nx, ny, nz, ar, ag, ab = _primary_geometry(
        sph, ns, pln, npl, ox, oy, oz, dx, dy, dz, compat=compat, shape=shape,
        cull=cull, grp=grp, grp_refs=grp_refs)
    r, g, b = amb * ar, amb * ag, amb * ab

    # Mirror reflection dir (hoisted above the light loop: clean-mode Phong
    # evaluates L.R per light; values identical either way).
    rx, ry, rz = _reflect_dir(dx, dy, dz, nx, ny, nz)

    if nl:
        # Shadow sweeps read the (4, ns) angular-size-sorted sphere table when
        # provided: occlusion accumulates order-free, and scanning the biggest
        # apparent occluders first makes the tile-coherent early exit fire in
        # fewer chunks. Results are bit-identical to the unsorted sweep.
        ssph = sph if sph_sh is None else sph_sh
        dirs = []
        for l in range(nl):
            lx, ly, lz = lts[0, l] - Px, lts[1, l] - Py, lts[2, l] - Pz
            ln = _rnorm(lx, ly, lz)
            dirs.append((lx * ln, ly * ln, lz * ln))
        if sh_lists is not None and npl <= _UNROLL_LIMIT:
            # Two-pass level-0 lists: sweep only this (tile, light)'s compact
            # occluder list (entries index the SORTED table, so overflow rows
            # degrade to the plain sorted sweep).
            occs = _any_hit_listed(ssph, ns, pln, npl, Px, Py, Pz, dirs,
                                   sh_lists, compat=compat, shape=shape,
                                   cheap=cheap_shadow)
        elif grp is not None and npl <= _UNROLL_LIMIT and nl <= 8:
            # Bounce levels with Morton groups: per-lane (ball-hit AND
            # not-yet-occluded) pruning — ORIGINAL index table (perm indexes
            # it); occlusion is order-free so the sorted table buys nothing
            # here. Reuses the closest-hit fold's state refs (done by now).
            occs = _any_hit_multi_grouped(sph, ns, pln, npl, Px, Py, Pz, dirs,
                                          grp, grp_refs, compat=compat,
                                          shape=shape, cheap=cheap_shadow)
        elif npl <= _UNROLL_LIMIT and (shadow_scratch is None or
                                       ns <= _UNROLL_LIMIT):
            occs = _any_hit_multi(ssph, ns, pln, npl, Px, Py, Pz, dirs,
                                  compat=compat, shape=shape,
                                  cheap=cheap_shadow)
        elif (shadow_scratch is not None and ns > _UNROLL_LIMIT
              and npl <= _UNROLL_LIMIT):  # capsule path unrolls its plane loop
            sref = (shadow_scratch if shadow_scratch.shape == shape
                    else shadow_scratch.at[0:shape[0], 0:shape[1]])
            occs = [_any_hit_capsule(ssph, ns, pln, npl, Px, Py, Pz,
                                     ldx, ldy, ldz,
                                     lts[0, l], lts[1, l], lts[2, l], sref,
                                     compat=compat, shape=shape,
                                     cheap=cheap_shadow)
                    for l, (ldx, ldy, ldz) in enumerate(dirs)]
        else:
            occs = [_any_hit(ssph, ns, pln, npl, Px, Py, Pz, lx, ly, lz,
                             compat=compat, shape=shape, cheap=cheap_shadow)
                    for (lx, ly, lz) in dirs]
        spec_sum = None
        for (lx, ly, lz), occ in zip(dirs, occs):
            lam = lamb * (lx * nx + ly * ny + lz * nz)
            lam = jnp.where((occ < 0.5) & (lam > 0.0), lam, 0.0)
            r, g, b = r + lam * ar, g + lam * ag, b + lam * ab
            if not compat:
                # Phong highlight (clean-mode extension == ops/shade.py:101-108;
                # the reference has no specular, SURVEY §2 comp. 9). pow via
                # masked exp/log: Mosaic-safe and NaN-free at sdot == 0.
                sdot = lx * rx + ly * ry + lz * rz
                smask = (occ < 0.5) & (sdot > 0.0)
                s_safe = jnp.where(smask, sdot, 1.0)
                p = jnp.where(smask,
                              jnp.exp(params[_P_SHIN] * jnp.log(s_safe)), 0.0)
                spec_sum = p if spec_sum is None else spec_sum + p
        if not compat and spec_sum is not None:
            phong = params[_P_SPEC] * spec_sum
            r, g, b = r + phong, g + phong, b + phong

    Px, Py, Pz = Px + BIAS * rx, Py + BIAS * ry, Pz + BIAS * rz

    zero = jnp.zeros(shape, jnp.float32)
    r = jnp.where(alive, r, zero)
    g = jnp.where(alive, g, zero)
    b = jnp.where(alive, b, zero)
    return r, g, b, Px, Py, Pz, rx, ry, rz, alive


def _raygen(params, px, py):
    """Analytic primary-ray generation from fractional pixel coords
    (reference kernels.py:16-23, camera.py:23-26). Shared by the render
    kernels and the two-pass hit-AABB kernel (bit-identical rays)."""
    pcx = params[_P_FOCAL]
    pcy = params[_P_Y0] + px * params[_P_DY]
    pcz = params[_P_Z0] + py * params[_P_DZ]
    R = params
    dx = R[_P_ROT + 0] * pcx + R[_P_ROT + 1] * pcy + R[_P_ROT + 2] * pcz
    dy = R[_P_ROT + 3] * pcx + R[_P_ROT + 4] * pcy + R[_P_ROT + 5] * pcz
    dz = R[_P_ROT + 6] * pcx + R[_P_ROT + 7] * pcy + R[_P_ROT + 8] * pcz
    dn = _rnorm(dx, dy, dz)
    return (params[_P_ORIGIN + 0], params[_P_ORIGIN + 1],
            params[_P_ORIGIN + 2], dx * dn, dy * dn, dz * dn)


def _sample_chain(params, sph, ns, pln, npl, lts, nl, px, py, *, depth, compat,
                  shape, cull=None, shadow_scratch=None, cheap_shadow=True,
                  sph_sh=None, bounce_scratch=None, sh_lists=None, grp=None,
                  grp_refs=None):
    """Full sample evaluation: fractional pixel coords -> (r, g, b).

    Analytic ray generation + the unrolled bounce chain (value-flow form).
    ``cull`` applies to the primary trace only; ``sh_lists`` carries the
    level-0 row base — bounce traces get their own level's row; ``grp`` (+
    state scratch ``grp_refs``, allocated at the widest chain shape and
    sliced down) gates BOUNCE closest-hit sweeps by Morton group."""
    ox, oy, oz, dx, dy, dz = _raygen(params, px, py)
    refl = params[_P_REFL]
    if grp_refs is not None:
        grp_refs = [ref if ref.shape == shape
                    else ref.at[0:shape[0], 0:shape[1]] for ref in grp_refs]

    def level_lists(level):
        if sh_lists is None:
            return None
        idx, cnt, base0, K, nl_t, nlev = sh_lists
        if level >= nlev:
            return None
        return (idx, cnt, base0 + level, K, nl_t)

    r, g, b, Px, Py, Pz, Rx, Ry, Rz, alive = _trace(
        params, sph, ns, pln, npl, lts, nl, ox, oy, oz, dx, dy, dz,
        compat=compat, shape=shape, cull=cull, shadow_scratch=shadow_scratch,
        cheap_shadow=cheap_shadow, sph_sh=sph_sh, sh_lists=level_lists(0))
    if bounce_scratch is not None and depth > 0:
        # Whole-tile bounce predication (same scheme as _make_kernel's no-AA
        # path): dead/sky tiles skip every bounce's intersection + shadow
        # sweep. State lives in VMEM scratch refs (lax.cond with vector
        # results does not legalize in Mosaic); the refs are allocated at the
        # widest chain shape and sliced down for narrower chains.
        refs = [ref if ref.shape == shape else ref.at[0:shape[0], 0:shape[1]]
                for ref in bounce_scratch]
        racc, gacc, bacc, sPx, sPy, sPz, sRx, sRy, sRz, sAl, sW = refs
        racc[...], gacc[...], bacc[...] = r, g, b
        sPx[...], sPy[...], sPz[...] = Px, Py, Pz
        sRx[...], sRy[...], sRz[...] = Rx, Ry, Rz
        sAl[...] = alive.astype(jnp.float32)
        sW[...] = jnp.full(shape, 1.0, jnp.float32)
        for bounce in range(depth):
            @pl.when(jnp.max(sAl[...]) > 0.5)
            def _bounce(bounce=bounce):
                alive_old = sAl[...]
                w = sW[...] * refl * alive_old
                sW[...] = w
                r2, g2, b2, Px2, Py2, Pz2, Rx2, Ry2, Rz2, alive2 = _trace(
                    params, sph, ns, pln, npl, lts, nl,
                    sPx[...], sPy[...], sPz[...],
                    sRx[...], sRy[...], sRz[...], compat=compat, shape=shape,
                    shadow_scratch=shadow_scratch, cheap_shadow=cheap_shadow,
                    sph_sh=sph_sh, sh_lists=level_lists(bounce + 1),
                    grp=grp, grp_refs=grp_refs)
                racc[...] += w * r2
                gacc[...] += w * g2
                bacc[...] += w * b2
                sPx[...], sPy[...], sPz[...] = Px2, Py2, Pz2
                sRx[...], sRy[...], sRz[...] = Rx2, Ry2, Rz2
                sAl[...] = alive_old * alive2.astype(jnp.float32)
        return racc[...], gacc[...], bacc[...]
    w = jnp.ones(shape, jnp.float32)
    for bounce in range(depth):
        w = w * refl * alive.astype(jnp.float32)
        r2, g2, b2, Px, Py, Pz, Rx, Ry, Rz, alive2 = _trace(
            params, sph, ns, pln, npl, lts, nl, Px, Py, Pz, Rx, Ry, Rz,
            compat=compat, shape=shape, shadow_scratch=shadow_scratch,
            cheap_shadow=cheap_shadow, sph_sh=sph_sh,
            sh_lists=level_lists(bounce + 1), grp=grp, grp_refs=grp_refs)
        r, g, b = r + w * r2, g + w * g2, b + w * b2
        alive = alive & alive2
    return r, g, b


def _make_kernel_aa_shared(*, W, H, TW, TH, depth, ns, npl, nl, compat,
                           swap_xy=False, culled=False, shadow_cull=False,
                           vis_k=0, cheap_shadow=True, shadow_sort=False,
                           predicate_bounces=False, shadow_listed=False,
                           sh_k=0, sh_levels=1, grouped=False, n_groups=0):
    """3x3-supersampled kernel with fully shared half-offset samples.

    The reference's AA samples are midpoints between adjacent pixel locations
    (kernels.py:43-50), so every half-offset sample is identical for 2 (edge
    midpoints) or 4 (corners) adjacent pixels. FOUR sample grids per tile
    replace nine per-pixel samples: centers ``C`` (TW, TH), the sublane-axis
    half grid ``UH`` (TW+8, TH), the lane-axis half grid ``V`` (TW, TH+1), and
    the corner grid ``UV`` (TW+8, TH+1) — each pixel then taps 1+2+2+4 entries.
    Unique sample positions are 4/9 of the naive count; the realized cost is
    ``1 + (TW+8)/TW * (1 + f) + f`` units where ``f = ceil((TH+1)/128)*128/TH``
    is the lane-padding factor of the +1 halo column (sublane padding is cheap,
    lane padding rounds to the 128-lane vreg) — 6.6u at TH=128, 4.84u at
    TH=640, vs 9u unshared. Results are bit-identical per sample; only the
    neighbor summation order differs from the per-sample kernel.

    ``swap_xy`` puts image y on sublanes and x on lanes — chosen when it wastes
    fewer padded lanes (e.g. 1920x1080: W is a lane multiple, H is not).
    """
    shape = (TW, TH)
    shape_w = (TW + 8, TH)       # +1 logical shared row, sublane-padded
    shape_v = (TW, TH + 1)       # +1 shared lane column
    shape_wv = (TW + 8, TH + 1)

    def kernel(params, sph, pln, lts, *rest):
        rest = list(rest)
        sph_sh = rest.pop(0) if shadow_sort else None
        vis_cnt = (rest.pop(0), rest.pop(0)) if culled else None
        sh_tabs = (rest.pop(0), rest.pop(0)) if shadow_listed else None
        grp_tabs = (rest.pop(0), rest.pop(0)) if grouped else None
        out_ref = rest.pop(0)
        shadow_ref = rest.pop(0) if shadow_cull else None
        bscratch = (tuple(rest.pop(0) for _ in range(11))
                    if (predicate_bounces and depth > 0) else None)
        grp_refs = ([rest.pop(0) for _ in range(8)] if grouped else None)
        grp = ((grp_tabs[0], grp_tabs[1], n_groups) if grouped else None)
        i = pl.program_id(0)
        j = pl.program_id(1)
        tile_id = i * pl.num_programs(1) + j
        cull = (vis_cnt[0], vis_cnt[1], tile_id, vis_k) if culled else None
        sh_lists = ((sh_tabs[0], sh_tabs[1], tile_id * sh_levels, sh_k,
                     nl, sh_levels) if shadow_listed else None)
        # su: sublane-axis pixel coordinate; sv: lane-axis pixel coordinate.
        fu = (i * TW).astype(jnp.float32)
        fv = (j * TH).astype(jnp.float32)
        if not swap_xy:
            fu = fu + params[_P_X0]
        else:
            fv = fv + params[_P_X0]
        def iotas(shp, du, dv):
            u = (fu + du +
                 jax.lax.broadcasted_iota(jnp.int32, shp, 0).astype(jnp.float32))
            v = (fv + dv +
                 jax.lax.broadcasted_iota(jnp.int32, shp, 1).astype(jnp.float32))
            return u, v

        su, sv = iotas(shape, 0.0, 0.0)

        def chain(shp, du, dv):
            u, v = iotas(shp, du, dv)
            px, py = (u, v) if not swap_xy else (v, u)
            return _sample_chain(params, sph, ns, pln, npl, lts, nl, px, py,
                                 depth=depth, compat=compat, shape=shp,
                                 cull=cull, shadow_scratch=shadow_ref,
                                 cheap_shadow=cheap_shadow, sph_sh=sph_sh,
                                 bounce_scratch=bscratch, sh_lists=sh_lists,
                                 grp=grp, grp_refs=grp_refs)

        C = chain(shape, 0.0, 0.0)
        UH = chain(shape_w, -0.5, 0.0)         # shared sublane-axis halves
        V = chain(shape_v, 0.0, -0.5)          # shared lane-axis halves
        UV = chain(shape_wv, -0.5, -0.5)       # shared corners (4-way)

        def nsum(c):
            return (UH[c][0:TW] + UH[c][1:TW + 1] +
                    V[c][:, 0:TH] + V[c][:, 1:TH + 1] +
                    UV[c][0:TW, 0:TH] + UV[c][1:TW + 1, 0:TH] +
                    UV[c][0:TW, 1:TH + 1] + UV[c][1:TW + 1, 1:TH + 1])

        nr, ng, nb = nsum(0), nsum(1), nsum(2)
        pr, pg, pb = C
        gx, gy = (su, sv) if not swap_xy else (sv, su)
        interior = ((gx >= 1.0) & (gx <= W - 2) & (gy >= 1.0) & (gy <= H - 2))
        inv9 = jnp.float32(1.0 / 9.0)
        if compat:
            # accumulation swap + store swap composed (see ops/render.py).
            out_ref[0] = jnp.where(interior, (pr + nr) * inv9, pr)
            out_ref[1] = jnp.where(interior, (pb + ng) * inv9, pb)
            out_ref[2] = jnp.where(interior, (pg + nb) * inv9, pg)
        else:
            out_ref[0] = jnp.where(interior, (pr + nr) * inv9, pr)
            out_ref[1] = jnp.where(interior, (pg + ng) * inv9, pg)
            out_ref[2] = jnp.where(interior, (pb + nb) * inv9, pb)

    return kernel


def _make_kernel(*, W, H, TW, TH, S, depth, ns, npl, nl, compat, aliasing,
                 predicate_bounces, swap_xy=False, culled=False,
                 shadow_cull=False, vis_k=0, cheap_shadow=True,
                 shadow_sort=False, shadow_listed=False, sh_k=0,
                 sh_levels=1, grouped=False, n_groups=0):
    shape = (TW, TH)

    def kernel(params, sph, pln, lts, *rest):
        rest = list(rest)
        sph_sh = rest.pop(0) if shadow_sort else None
        tile_id = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        if culled:
            vis, cnt = rest.pop(0), rest.pop(0)
            cull = (vis, cnt, tile_id, vis_k)
        else:
            cull = None
        if shadow_listed:
            sl_idx, sl_cnt = rest.pop(0), rest.pop(0)
            sh_lists = (sl_idx, sl_cnt, tile_id * sh_levels, sh_k, nl,
                        sh_levels)
        else:
            sh_lists = None
        grp_tabs = (rest.pop(0), rest.pop(0)) if grouped else None
        out_ref, *scratch = rest
        if grouped:
            grp_refs, scratch = scratch[-8:], scratch[:-8]
            grp = (grp_tabs[0], grp_tabs[1], n_groups)
        else:
            grp_refs, grp = None, None
        if shadow_cull:
            shadow_ref, scratch = scratch[-1], scratch[:-1]
        else:
            shadow_ref = None
        if depth > 0 and predicate_bounces:
            (racc, gacc, bacc, sPx, sPy, sPz, sRx, sRy, sRz, sAl, sW) = scratch
        i = pl.program_id(0)
        j = pl.program_id(1)
        s = pl.program_id(2)

        fu = (i * TW).astype(jnp.float32)
        fv = (j * TH).astype(jnp.float32)
        if not swap_xy:
            fu = fu + params[_P_X0]
        else:
            fv = fv + params[_P_X0]
        # iota must be integer-typed on TPU (Mosaic rejects float iota).
        su = fu + jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32)
        sv = fv + jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
        gx, gy = (su, sv) if not swap_xy else (sv, su)
        px = gx + params[_P_OFFS + 2 * s]
        py = gy + params[_P_OFFS + 2 * s + 1]

        # Analytic ray generation (reference kernels.py:16-23, camera.py:23-26).
        pcx = params[_P_FOCAL]
        pcy = params[_P_Y0] + px * params[_P_DY]
        pcz = params[_P_Z0] + py * params[_P_DZ]
        R = params
        dx = R[_P_ROT + 0] * pcx + R[_P_ROT + 1] * pcy + R[_P_ROT + 2] * pcz
        dy = R[_P_ROT + 3] * pcx + R[_P_ROT + 4] * pcy + R[_P_ROT + 5] * pcz
        dz = R[_P_ROT + 6] * pcx + R[_P_ROT + 7] * pcy + R[_P_ROT + 8] * pcz
        dn = _rnorm(dx, dy, dz)
        dx, dy, dz = dx * dn, dy * dn, dz * dn
        # Origin stays scalar: per-object o.c / o.o terms in the primary sweep
        # then run on the scalar unit, not the VPU.
        ox = params[_P_ORIGIN + 0]
        oy = params[_P_ORIGIN + 1]
        oz = params[_P_ORIGIN + 2]

        # sample(): primary trace + unrolled bounce chain (trace.py:115-133).
        refl = params[_P_REFL]

        def level_lists(level):
            if sh_lists is None:
                return None
            idx, cnt, base0, K, nl_t, nlev = sh_lists
            if level >= nlev:
                return None
            return (idx, cnt, base0 + level, K, nl_t)

        r, g, b, Px, Py, Pz, Rx, Ry, Rz, alive = _trace(
            params, sph, ns, pln, npl, lts, nl, ox, oy, oz, dx, dy, dz,
            compat=compat, shape=shape, cull=cull, shadow_scratch=shadow_ref,
            cheap_shadow=cheap_shadow, sph_sh=sph_sh, sh_lists=level_lists(0))
        if depth > 0 and predicate_bounces:
            # Whole-tile predication via pl.when + VMEM scratch accumulators:
            # sky/fully-dead tiles skip every bounce's intersection+shadow sweeps
            # (the CUDA analogue would be a warp-coherent early exit; here the
            # tile is the coherence unit). lax.cond with vector results does not
            # legalize in Mosaic, so state lives in scratch refs instead of SSA.
            racc[...], gacc[...], bacc[...] = r, g, b
            sPx[...], sPy[...], sPz[...] = Px, Py, Pz
            sRx[...], sRy[...], sRz[...] = Rx, Ry, Rz
            sAl[...] = alive.astype(jnp.float32)
            sW[...] = jnp.full(shape, 1.0, jnp.float32)
            for bounce in range(depth):
                @pl.when(jnp.max(sAl[...]) > 0.5)
                def _bounce(bounce=bounce):
                    alive_old = sAl[...]
                    w = sW[...] * refl * alive_old
                    sW[...] = w
                    r2, g2, b2, Px2, Py2, Pz2, Rx2, Ry2, Rz2, alive2 = _trace(
                        params, sph, ns, pln, npl, lts, nl,
                        sPx[...], sPy[...], sPz[...],
                        sRx[...], sRy[...], sRz[...], compat=compat, shape=shape,
                        shadow_scratch=shadow_ref, cheap_shadow=cheap_shadow,
                        sph_sh=sph_sh, sh_lists=level_lists(bounce + 1),
                        grp=grp, grp_refs=grp_refs)
                    racc[...] += w * r2
                    gacc[...] += w * g2
                    bacc[...] += w * b2
                    sPx[...], sPy[...], sPz[...] = Px2, Py2, Pz2
                    sRx[...], sRy[...], sRz[...] = Rx2, Ry2, Rz2
                    sAl[...] = alive_old * alive2.astype(jnp.float32)
            r, g, b = racc[...], gacc[...], bacc[...]
        elif depth > 0:
            # AA configs: measured faster without scratch traffic (most tiles keep
            # live lanes across all 9 samples, so the predicate rarely fires).
            w = jnp.ones(shape, jnp.float32)
            for bounce in range(depth):
                w = w * refl * alive.astype(jnp.float32)
                r2, g2, b2, Px, Py, Pz, Rx, Ry, Rz, alive2 = _trace(
                    params, sph, ns, pln, npl, lts, nl, Px, Py, Pz, Rx, Ry, Rz,
                    compat=compat, shape=shape, shadow_scratch=shadow_ref,
                    cheap_shadow=cheap_shadow, sph_sh=sph_sh,
                    sh_lists=level_lists(bounce + 1), grp=grp,
                    grp_refs=grp_refs)
                r, g, b = r + w * r2, g + w * g2, b + w * b2
                alive = alive & alive2

        if aliasing:
            interior = ((gx >= 1.0) & (gx <= W - 2) & (gy >= 1.0) & (gy <= H - 2))
        else:
            interior = None

        if S == 1:
            if compat:
                out_ref[0], out_ref[1], out_ref[2] = r, b, g  # store swap
            else:
                out_ref[0], out_ref[1], out_ref[2] = r, g, b
            return

        @pl.when(s == 0)
        def _init():
            # Primary sample: compat stores (R, B, G) — the store swap
            # (common.py:61-63) applied to the primary's channels.
            if compat:
                out_ref[0], out_ref[1], out_ref[2] = r, b, g
            else:
                out_ref[0], out_ref[1], out_ref[2] = r, g, b

        @pl.when(s > 0)
        def _acc():
            # Neighbor samples land unswapped under compat: the accumulation swap
            # (kernels.py:59-60) composed with the store swap cancels for them.
            m = interior.astype(jnp.float32)
            out_ref[0] += m * r
            out_ref[1] += m * g
            out_ref[2] += m * b

        @pl.when(s == S - 1)
        def _finalize():
            m = interior
            inv9 = jnp.float32(1.0 / 9.0)
            out_ref[0] = jnp.where(m, out_ref[0] * inv9, out_ref[0])
            out_ref[1] = jnp.where(m, out_ref[1] * inv9, out_ref[1])
            out_ref[2] = jnp.where(m, out_ref[2] * inv9, out_ref[2])

    return kernel


def _pack_params(camera, scene, compat, x_offset=0.0):
    focal, y0, dy, z0, dz = camera.grid_params(compat)
    m = scene.materials
    offs = jnp.asarray(AA_OFFSETS, jnp.float32).reshape(-1)
    return jnp.concatenate([
        camera.position.astype(jnp.float32),
        camera.rotation.astype(jnp.float32).reshape(-1),
        jnp.stack([focal, y0, dy, z0, dz]),
        jnp.stack([m.ambient.astype(jnp.float32), m.lambert.astype(jnp.float32),
                   m.reflection.astype(jnp.float32),
                   m.specular.astype(jnp.float32),
                   m.shininess.astype(jnp.float32)]),
        jnp.asarray(x_offset, jnp.float32)[None],
        offs,
    ])


def _shadow_cheap_ok(scene, compat) -> bool:
    """Static guard for the sqrt-free shadow test (_sphere_occ_cheap).

    Clean mode: always exact. Compat mode: exact unless some sphere has radius
    >= FAR/2 (only then can a shadow segment sit inside a ball whose selected
    far root exceeds the 999.0 clip — reference trace.py:17 semantics would
    report no occlusion there). Traced scenes (called under an outer jit with
    abstract values) can't be inspected and conservatively keep the root-form
    sweep."""
    if not compat:
        return True
    try:
        return bool(np.all(np.asarray(scene.spheres.radius) < 0.5 * FAR))
    except Exception:
        return False


_CULL_BUDGET = 160_000  # SMEM entries for the per-tile visibility tables


def _cull_capacity(ns: int, n_tiles: int) -> int:
    """Compact-list slots per tile for the primary cone cull.

    32 covers ~100-object scenes; denser scenes overflow too many tiles into
    sentinel full sweeps (1000 spheres @1080p: 24% of tiles at K=32, zero at
    K=64 with mean 16 visible), so the cap scales with the scene — then steps
    back DOWN while it busts the SMEM table budget (a large grid with a
    reduced K still beats no cull at all). The caller disables the cull
    entirely when even the floor capacity exceeds the budget."""
    vis_k = min(ns, 32 if ns <= 256 else 64 if ns <= 2048 else 128)
    while vis_k > 32 and n_tiles * vis_k > _CULL_BUDGET:
        vis_k //= 2
    return vis_k


_SH_BUDGET = 160_000  # SMEM entries for the per-(tile,light) shadow tables
# The cull and shadow tables share the ~1 MB SMEM space with the params/scene
# vectors; enforcing their budgets independently would admit a combined
# footprint of 2 x 640 KB and fail Mosaic allocation on dense scenes over
# large grids. The shadow tables are therefore carved out of what the cull
# table leaves of this combined cap (~800 KB, leaving headroom for the
# params/scene/sorted tables, which are O(ns) not O(tiles)).
_SMEM_TABLE_BUDGET = 200_000
# Default for shadow_lists=None: ON for rolled scenes, measured -4% (100-sphere
# no-AA) to -11% (1000-sphere no-AA) on chip at level-0-only lists. Bounce
# levels measured a clear LOSS (reflected hit points scatter, so bounce AABBs
# cover everything and the prepass bounce chain is pure cost: 1000-sphere
# no-AA 84 ms at levels=1 vs 132 ms at levels=3) — hence the levels=1 default.
_SHADOW_LISTS_AUTO = True
# Default for group_cull=None: Morton-grouped runtime skips for BOUNCE
# sweeps, ON for scenes of >= _GROUP_MIN_NS spheres (measured on v5e,
# 1080p depth-2, vs the plain rolled kernel: 1000-sphere 85.2 -> 67.0 ms
# no-AA / 551 -> 450 ms AA; but 100-sphere REGRESSES 11.8 -> 13.5 ms no-AA
# and 58.0 -> 65.8 ms AA — at that density the group tests + scratch state
# round trips outweigh the skipped members). The threshold sits between the
# two measured densities, aligned with _cull_capacity's first tier break.
# Auto requires depth > 0 (only bounce sweeps are gated) and skips
# interpret mode like the shadow lists.
_GROUP_CULL_AUTO = True
_GROUP_MIN_NS = 256


def _shadow_list_capacity(ns: int, n_rows: int,
                          budget: int = _SH_BUDGET) -> int:
    """Slots per (tile, light) row for the two-pass shadow occluder lists.

    Same scale-with-density/step-down-under-budget policy as
    :func:`_cull_capacity` but with a 16-slot floor (shadow rows are ``nl``x
    more numerous than primary rows, and an overflowed row only costs that
    row a full sweep). ``budget`` is what the cull table left of the combined
    ``_SMEM_TABLE_BUDGET`` (capped at ``_SH_BUDGET``)."""
    k = min(ns, 32 if ns <= 256 else 64 if ns <= 2048 else 128)
    while k > 16 and n_rows * k > budget:
        k //= 2
    return k


def _resolve_swap(w_out: int, h: int) -> bool:
    """Axis layout: True puts image y on sublanes / x on lanes. Picks the
    pairing that pads fewer 128-lane vreg columns (1080p: W=1920 is 15x128
    exact, H=1080 pads to 1152 -> swap). Single source of truth — the forward,
    backward, soft, and tile-policy resolvers must all agree or a sharded
    backward could disagree with its forward on image orientation."""
    waste = lambda n: (-(-n // 128) * 128 - n) / n
    return waste(w_out) < waste(h)


def _fit_tile_w(U: int, tile_w: int) -> int:
    """Shrink the sublane tile width when grid padding is gross: ``cdiv(U,
    TW)`` tiles sweep ``cdiv * TW`` columns, so TW=40 at U=128 pays for 160
    (25% waste). Per-tile overheads favor FAT tiles (soft step measured
    ~0.199 ms/col at TW=40 vs ~0.212 at TW=32 — a ~(1 + 14/TW) per-column
    model), so only shrink when the padding waste exceeds 10%, to the
    LARGEST multiple-of-8 TW' <= tile_w that minimizes padded columns.
    Reproduces both on-chip optima (ONCHIP_r05 soft_slab_accumulation:
    128^2 wants TW=32, 31.8 -> 27.1 ms direct; 512^2 keeps TW=40, its
    1.5%-pad fat tiles beat the exact-fit TW=32)."""
    tw = min(tile_w, U)
    padded = -(-U // tw) * tw
    if (padded - U) * 10 <= U:
        return tw
    best, best_padded = tw, padded
    cand = tw - tw % 8
    while cand >= 8:
        p = -(-U // cand) * cand
        if p < best_padded:
            best, best_padded = cand, p
        cand -= 8
    return best


def _auto_tiles(camera, scene, *, aliasing, aa_share, tile_w, tile_h,
                local_width):
    """Resolve ``None`` tile sizes to the measured-best v5e defaults.

    AA-shared kernels want a wide lane tile: the +1 halo column pads to the
    next 128-lane vreg, so the halo overhead factor is ceil((TH+1)/128)*128/TH
    — 2.0 at TH=128 but 1.33 at TH=384 (measured @1080p: 8.2 -> 7.9 ms demo,
    84 -> 69 ms 100-sphere). Rolled no-AA scenes prefer TW=72 (fewer, fatter
    tiles amortize per-tile sweeps; measured 11.7 -> 11.1 ms); the small-scene
    headline keeps (40, 128) (1.51 ms). TW72+TH640 exceeds scoped VMEM."""
    W, H = camera.resolution
    W_out = W if local_width is None else local_width
    swap = _resolve_swap(W_out, H)
    U, V = (H, W_out) if swap else (W_out, H)
    if tile_h is None:
        tile_h = 128
        if aliasing and aa_share:
            # 640 wins for small unrolled scenes (7.8 vs 8.0 ms @1080p) but
            # exceeds scoped VMEM with the rolled-scene bounce-predication
            # scratch, so it's only tried below the unroll limit
            cands = ((640, 384, 256, 512)
                     if scene.spheres.count <= _UNROLL_LIMIT
                     else (384, 256, 512))
            for th in cands:
                if V % th == 0:
                    tile_h = th
                    break
    if tile_w is None:
        tile_w = 40
        if (not aliasing) and scene.spheres.count > _UNROLL_LIMIT \
                and U % 72 == 0:
            tile_w = 72
    return tile_w, tile_h


def render_image_pallas(camera, scene, *, depth: int = 2, aliasing: bool = True,
                        compat: bool = True, tile_w: int | None = None,
                        tile_h: int | None = None,
                        interpret: bool = False, x_offset=0.0,
                        local_width: int | None = None,
                        aa_share: bool = True, cull: bool = True,
                        shadow_cull: bool = False,
                        cheap_shadow: bool | None = None,
                        shadow_lists: bool | None = None,
                        shadow_list_levels: int | None = None,
                        group_cull: bool | None = None) -> jnp.ndarray:
    """Fused-kernel render -> float ``(w, h, 3)`` image, matching
    :func:`..render.render_image` output bit-for-bit up to f32 reassociation.

    ``x_offset``/``local_width`` render a vertical slice ``[x_offset, x_offset +
    local_width)`` of the full image — ray generation is analytic in the *global*
    pixel index, so a shard_map over slices reproduces the whole image with zero
    halo communication (ray-DP; see parallel/render_sharded.py).

    ``cheap_shadow`` (default: auto via :func:`_shadow_cheap_ok`) selects the
    sqrt-free segment-form shadow sweeps; pass ``True`` explicitly when calling
    under an outer jit with ordinary (< FAR/2 radius) scenes.

    ``shadow_lists`` enables the two-pass shadow pipeline for rolled scenes:
    a hit-extent prepass (:func:`_hit_extents_pallas`) bounds each tile's
    shadow-ray origins, conservative per-(tile, level, light) occluder lists
    are compacted host-side (:func:`_shadow_visibility_lists`), and the
    render kernel's shadow sweeps scan only those lists
    (:func:`_any_hit_listed`). ``None`` = auto (ON for rolled scenes with
    shadows — measured -4..-11% on chip). ``shadow_list_levels`` bounds how
    many trace levels get lists (default 1 = level-0 only: primary hit
    points are tile-coherent so their AABBs cull well; reflected bounce
    origins scatter, so deeper lists measured a net loss — the prepass
    must then run the full bounce chain for AABBs that cull nothing)."""
    if cheap_shadow is None:
        cheap_shadow = _shadow_cheap_ok(scene, compat)
    tile_w, tile_h = _auto_tiles(camera, scene, aliasing=aliasing,
                                 aa_share=aa_share, tile_w=tile_w,
                                 tile_h=tile_h, local_width=local_width)
    return _render_image_pallas(
        camera, scene, depth=depth, aliasing=aliasing, compat=compat,
        tile_w=tile_w, tile_h=tile_h, interpret=interpret, x_offset=x_offset,
        local_width=local_width, aa_share=aa_share, cull=cull,
        shadow_cull=shadow_cull, cheap_shadow=cheap_shadow,
        shadow_lists=shadow_lists, shadow_list_levels=shadow_list_levels,
        group_cull=group_cull)


@functools.partial(jax.jit, static_argnames=("depth", "aliasing", "compat",
                                             "tile_w", "tile_h", "interpret",
                                             "local_width", "aa_share", "cull",
                                             "shadow_cull", "cheap_shadow",
                                             "shadow_lists",
                                             "shadow_list_levels",
                                             "group_cull"))
def _render_image_pallas(camera, scene, *, depth: int = 2, aliasing: bool = True,
                         compat: bool = True, tile_w: int = 40, tile_h: int = 128,
                         interpret: bool = False, x_offset=0.0,
                         local_width: int | None = None,
                         aa_share: bool = True, cull: bool = True,
                         shadow_cull: bool = False,
                         cheap_shadow: bool = True,
                         shadow_lists: bool | None = None,
                         shadow_list_levels: int | None = None,
                         group_cull: bool | None = None) -> jnp.ndarray:
    W, H = camera.resolution
    ns, npl, nl = scene.spheres.count, scene.planes.count, scene.lights.count
    S = len(AA_OFFSETS) if aliasing else 1
    W_out = W if local_width is None else local_width

    swap_xy = _resolve_swap(W_out, H)
    U = H if swap_xy else W_out   # sublane-axis extent
    V = W_out if swap_xy else H   # lane-axis extent
    TW = min(tile_w, U)
    TH = tile_h
    params = _pack_params(camera, scene, compat, x_offset)
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

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    n_u, n_v = pl.cdiv(U, TW), pl.cdiv(V, TH)
    # The visibility table is a FLAT 1-D full-array SMEM input: blocked SMEM
    # specs must obey the (8,128) rule, and 2-D SMEM windows allocate ~512 B
    # per ROW of the 1 MB SMEM space (measured on v5e: an s32[1620,1] column
    # costs 812 KB — see _tile_visibility). Per-tile lists are compacted to
    # K=32 slots (demo scenes peak at ~8 visible spheres/tile; overflow tiles
    # fall back to a full sweep via the -1 sentinel).
    vis_k = _cull_capacity(ns, n_u * n_v)
    culled = cull and ns > _UNROLL_LIMIT and n_u * n_v * vis_k <= _CULL_BUDGET
    sh_cull = shadow_cull and ns > _UNROLL_LIMIT
    # Rolled scenes: shadow sweeps scan a copy of the sphere table sorted by
    # max-over-lights apparent angular size (r / |c - L|, descending) so the
    # biggest occluders come first and the tile-coherent early exit saturates
    # in fewer chunks. Occlusion is an order-free max-accumulation — results
    # are bit-identical; only the while_loop trip count changes.
    shadow_sort = nl > 0 and ns > _UNROLL_LIMIT
    if shadow_sort:
        cen = scene.spheres.center.astype(jnp.float32)       # (ns, 3)
        rad = scene.spheres.radius.astype(jnp.float32)       # (ns,)
        lpos = scene.lights.position.astype(jnp.float32)     # (nl, 3)
        dist = jnp.linalg.norm(cen[:, None, :] - lpos[None, :, :], axis=-1)
        key = jnp.max(rad[:, None] / jnp.maximum(dist, 1e-6), axis=1)
        order = jnp.argsort(-key)
        sph_sh = sph[0:4][:, order]                          # (4, ns)
    if culled:
        vis_idx, vis_cnt = _tile_visibility(
            camera, scene, n_u=n_u, n_v=n_v, TW=TW, TH=TH, swap_xy=swap_xy,
            x_offset=x_offset, compat=compat, K=vis_k)
    # Two-pass level-0 shadow lists (see render_image_pallas docstring).
    # Auto skips interpret mode: the prepass doubles CPU-interpret trace time
    # and interpret is never a perf path; dedicated tests opt in explicitly.
    want_lists = ((_SHADOW_LISTS_AUTO and not interpret)
                  if shadow_lists is None else shadow_lists)
    sh_levels = 1 if shadow_list_levels is None else \
        max(1, min(depth + 1, shadow_list_levels))
    sh_rows = n_u * n_v * sh_levels * nl
    # Shadow tables get what the cull table leaves of the combined SMEM cap.
    sh_budget = min(_SH_BUDGET, _SMEM_TABLE_BUDGET -
                    (n_u * n_v * vis_k if culled else 0))
    sh_k = _shadow_list_capacity(ns, sh_rows, max(sh_budget, 1)) if nl else 0
    sh_listed = (want_lists and ns > _UNROLL_LIMIT and nl > 0
                 and npl <= _UNROLL_LIMIT and sh_rows * sh_k <= sh_budget)
    if sh_listed:
        ext = _hit_extents_pallas(
            params, sph, pln, W=W, H=H, n_u=n_u, n_v=n_v, TW=TW, TH=TH,
            ns=ns, npl=npl, compat=compat, swap_xy=swap_xy, aliasing=aliasing,
            culled=culled, vis_tabs=(vis_idx, vis_cnt) if culled else None,
            vis_k=vis_k, interpret=interpret, n_levels=sh_levels)
        # sh_listed implies shadow_sort (both require nl > 0, rolled spheres),
        # so `order` exists; lists index sph_sh positions.
        sl_idx, sl_cnt = _shadow_visibility_lists(
            ext, scene.lights.position.astype(jnp.float32),
            scene.spheres.center.astype(jnp.float32),
            scene.spheres.radius.astype(jnp.float32),
            nl=nl, K=sh_k, compat=compat,
            to_sorted=jnp.argsort(order).astype(jnp.int32))
    # Morton-grouped runtime cull for BOUNCE closest-hit sweeps (rolled
    # scenes; the host-side cone is unsound for scattered bounce rays).
    # sh_levels > 1 would need the grouped sweep order in the prepass's
    # bounce levels too (bit-identical hit points are the lists' coverage
    # contract) — the combination is excluded until bounce-level lists stop
    # being a measured loss.
    grouped = ((group_cull if group_cull is not None
                else (_GROUP_CULL_AUTO and not interpret
                      and ns >= _GROUP_MIN_NS))
               and ns > _UNROLL_LIMIT and depth > 0
               and not (sh_listed and sh_levels > 1))
    if grouped:
        grp_perm, grp_bnd = _sphere_groups(
            scene.spheres.center.astype(jnp.float32),
            scene.spheres.radius.astype(jnp.float32),
            order_from=camera.position)
        n_groups = grp_perm.shape[0] // _GROUP_SIZE
    else:
        n_groups = 0
    if aliasing and aa_share:
        # Dead-tile bounce predication pays off when sweeps are expensive
        # (rolled scenes); small scenes measured faster without the scratch
        # traffic — same tradeoff as the no-AA kernel's AA branch.
        aa_predicate = ns > _UNROLL_LIMIT and depth > 0
        kernel = _make_kernel_aa_shared(W=W, H=H, TW=TW, TH=TH, depth=depth,
                                        ns=ns, npl=npl, nl=nl, compat=compat,
                                        swap_xy=swap_xy, culled=culled,
                                        shadow_cull=sh_cull, vis_k=vis_k,
                                        cheap_shadow=cheap_shadow,
                                        shadow_sort=shadow_sort,
                                        predicate_bounces=aa_predicate,
                                        shadow_listed=sh_listed, sh_k=sh_k,
                                        sh_levels=sh_levels, grouped=grouped,
                                        n_groups=n_groups)
        in_specs = [smem(), smem(), smem(), smem()]
        args = [params, sph, pln, lts]
        if shadow_sort:
            in_specs.append(smem())
            args.append(sph_sh)
        if culled:
            in_specs += [smem(), smem()]
            args += [vis_idx, vis_cnt]
        if sh_listed:
            in_specs += [smem(), smem()]
            args += [sl_idx, sl_cnt]
        if grouped:
            in_specs += [smem(), smem()]
            args += [grp_perm, grp_bnd]
        # shared-sample chains run up to (TW+8, TH+1); the shadow-cull and
        # bounce-predication scratch refs are allocated at the widest chain
        # shape and sliced down for narrower chains
        scratch = [pltpu.VMEM((TW + 8, TH + 1), jnp.float32)] if sh_cull else []
        if aa_predicate:
            scratch += [pltpu.VMEM((TW + 8, TH + 1), jnp.float32)] * 11
        if grouped:
            scratch += [pltpu.VMEM((TW + 8, TH + 1), jnp.float32)] * 8
        out = pl.pallas_call(
            kernel,
            grid=(n_u, n_v),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((3, TW, TH), lambda i, j: (0, i, j)),
            out_shape=jax.ShapeDtypeStruct((3, U, V), jnp.float32),
            scratch_shapes=scratch,
            interpret=interpret,
        )(*args)
        return (jnp.transpose(out, (2, 1, 0)) if swap_xy
                else jnp.moveaxis(out, 0, -1))
    predicate_bounces = not aliasing
    kernel = _make_kernel(W=W, H=H, TW=TW, TH=TH, S=S, depth=depth, ns=ns,
                          npl=npl, nl=nl, compat=compat, aliasing=aliasing,
                          predicate_bounces=predicate_bounces, swap_xy=swap_xy,
                          culled=culled, shadow_cull=sh_cull, vis_k=vis_k,
                          cheap_shadow=cheap_shadow, shadow_sort=shadow_sort,
                          shadow_listed=sh_listed, sh_k=sh_k,
                          sh_levels=sh_levels, grouped=grouped,
                          n_groups=n_groups)
    grid = (n_u, n_v, S)
    in_specs = [smem(), smem(), smem(), smem()]
    args = [params, sph, pln, lts]
    if shadow_sort:
        in_specs.append(smem())
        args.append(sph_sh)
    if culled:
        in_specs += [smem(), smem()]
        args += [vis_idx, vis_cnt]
    if sh_listed:
        in_specs += [smem(), smem()]
        args += [sl_idx, sl_cnt]
    if grouped:
        in_specs += [smem(), smem()]
        args += [grp_perm, grp_bnd]
    scratch = ([pltpu.VMEM((TW, TH), jnp.float32)] * 11) if (depth > 0 and predicate_bounces) else []
    if sh_cull:
        scratch = scratch + [pltpu.VMEM((TW, TH), jnp.float32)]  # shadow cull
    if grouped:
        scratch = scratch + [pltpu.VMEM((TW, TH), jnp.float32)] * 8
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((3, TW, TH), lambda i, j, s: (0, i, j)),
        out_shape=jax.ShapeDtypeStruct((3, U, V), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    if swap_xy:
        return jnp.transpose(out, (2, 1, 0))
    return jnp.moveaxis(out, 0, -1)


# --- differentiable fast path -----------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def render_image_fast(camera, scene, depth: int = 2, aliasing: bool = True,
                      compat: bool = True):
    """Pallas forward + jnp-autodiff backward (SURVEY §7 hard part (b) fallback)."""
    return render_image_pallas(camera, scene, depth=depth, aliasing=aliasing,
                               compat=compat)


def _fwd(camera, scene, depth, aliasing, compat):
    out = render_image_pallas(camera, scene, depth=depth, aliasing=aliasing,
                              compat=compat)
    return out, (camera, scene)


def _bwd(depth, aliasing, compat, res, g):
    camera, scene = res
    nl = scene.lights.count
    if nl <= _UNROLL_LIMIT:
        # Fully fused backward (hand-derived adjoints incl. camera; AA via a
        # per-sample grid axis; rolled sphere AND plane loops for large
        # scenes).
        from .render_bwd import scene_grads_pallas
        scene_g, cam_g = scene_grads_pallas(camera, scene, g, depth=depth,
                                            compat=compat, return_camera=True,
                                            aliasing=aliasing)
        return cam_g, scene_g
    # Exotic light counts: XLA autodiff of the jnp path.
    from ..render import render_image
    _, vjp = jax.vjp(lambda c, s: render_image(c, s, depth=depth,
                                               aliasing=aliasing, compat=compat),
                     camera, scene)
    return vjp(g)


render_image_fast.defvjp(_fwd, _bwd)
