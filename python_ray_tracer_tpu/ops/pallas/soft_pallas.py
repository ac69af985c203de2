"""Fused Pallas kernel for the soft-visibility renderer (ops/soft.py).

Same math as :func:`..soft.render_rays_soft` — SoftRasterizer-style sigmoid
coverage, soft shadows as transmission products, front-to-back compositing —
fused into one Mosaic kernel over pixel tiles with analytic ray generation
(no pixel-grid input, scene in SMEM scalars, framebuffer tile in VMEM).

The jnp path sorts objects by blend depth and cumprods transmission
(soft.py:137-145). A per-lane sort is hostile to the VPU, so the kernel uses
the order-free identity

    w_i = alpha_i * prod_{j != i} (1 - alpha_j * [t_j < t_i  or
                                                  (t_j == t_i and j < i)])

which reproduces the sorted cumprod exactly, including argsort's stable
index-order tie-break (the ``j == i`` factor self-excludes: ``t_i < t_i`` is
false). O(K^2 + K^2 L) per ray like the jnp path. Scenes up to
``_SOFT_UNROLL_LIMIT`` objects unroll fully with all per-object tile state
cached in registers; larger scenes switch to a *rolled* form that holds O(1)
state and recomputes coverages inside chunk-unrolled ``fori_loop`` sweeps
(``render_pallas._fold_objects`` — the same machinery as the hard kernel's
rolled scenes). The recompute doubles coverage arithmetic but removes the
register/VMEM ceiling; product order matches the unrolled path (spheres
ascending, then planes), so rolled == unrolled to FMA-contraction ULPs.

Scope mirrors soft.py: clean-mode camera, primary visibility + ambient +
soft-shadowed Lambert, opaque planes, no mirror bounces. Differentiability:
:func:`render_image_soft_fast` wraps this forward in a ``custom_vjp`` whose
backward is the hand-derived fused adjoint kernel (soft_bwd.py) — the whole
soft ``value_and_grad`` runs at kernel speed (5.9x the jnp step at
100 spheres/128², 9.5x at 512²); scenes with >16 lights keep the old
jnp-autodiff backward.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .render_pallas import (_P_ORIGIN, _P_ROT, _P_FOCAL, _P_Y0, _P_DY, _P_Z0,
                            _P_DZ, _P_AMB, _P_LAMB, _UNROLL_LIMIT,
                            _fit_tile_w, _fold_objects, _pack_params, _rnorm,
                            _resolve_swap)

_SOFT_UNROLL_LIMIT = 24   # below: objects fully unrolled in registers;
                          # above: rolled folds with coverage recompute

# extra SMEM scalar appended after the standard params vector
_P_TAU_REL = 0


def _soft_cover(ox, oy, oz, dx, dy, dz, cx, cy, cz, r, tau, shape):
    """Per-sphere soft coverage + blend depth == soft.py:41-63, tile-wide."""
    Lx, Ly, Lz = cx - ox, cy - oy, cz - oz
    t_ca = Lx * dx + Ly * dy + Lz * dz
    LL = Lx * Lx + Ly * Ly + Lz * Lz
    d2 = LL - t_ca * t_ca
    d2_pos = d2 > 1e-12
    b = jnp.sqrt(jnp.where(d2_pos, d2, 1e-12))
    alpha = jax.nn.sigmoid(-(b - r) / (tau * r))
    alpha = jnp.where(t_ca > 0.0, alpha, 0.0)
    chord2 = r * r - d2
    inside = chord2 > 1e-12
    half_chord = jnp.sqrt(jnp.where(inside, chord2, 1.0))
    t = jnp.where(inside, t_ca - half_chord, t_ca)
    return alpha, jnp.maximum(t, 1e-4)


def _make_soft_kernel(*, W, H, TW, TH, ns, npl, nl, swap_xy, rolled=False):
    shape = (TW, TH)

    def kernel(params, sph, pln, lts, extra, out_ref):
        tau = extra[_P_TAU_REL]
        amb = params[_P_AMB]
        lamb = params[_P_LAMB]
        i = pl.program_id(0)
        j = pl.program_id(1)
        fu = (i * TW).astype(jnp.float32)
        fv = (j * TH).astype(jnp.float32)
        su = fu + jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32)
        sv = fv + jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
        px, py = (su, sv) if not swap_xy else (sv, su)

        pcx = params[_P_FOCAL]
        pcy = params[_P_Y0] + px * params[_P_DY]
        pcz = params[_P_Z0] + py * params[_P_DZ]
        R = params
        dx = R[_P_ROT + 0] * pcx + R[_P_ROT + 1] * pcy + R[_P_ROT + 2] * pcz
        dy = R[_P_ROT + 3] * pcx + R[_P_ROT + 4] * pcy + R[_P_ROT + 5] * pcz
        dz = R[_P_ROT + 6] * pcx + R[_P_ROT + 7] * pcy + R[_P_ROT + 8] * pcz
        dn = _rnorm(dx, dy, dz)
        dx, dy, dz = dx * dn, dy * dn, dz * dn
        ox = params[_P_ORIGIN + 0]
        oy = params[_P_ORIGIN + 1]
        oz = params[_P_ORIGIN + 2]

        def sphere_cover(k, Px, Py, Pz, Ddx, Ddy, Ddz):
            """Coverage of sphere ``k`` (static OR traced index — SMEM reads
            take both) along rays from P (scalar or tile) in direction D."""
            return _soft_cover(Px, Py, Pz, Ddx, Ddy, Ddz, sph[0, k],
                               sph[1, k], sph[2, k], sph[3, k], tau, shape)

        def transmission(Px, Py, Pz, Ldx, Ldy, Ldz):
            """prod_j (1 - alpha_j) along a shadow ray (soft.py:75-86)."""
            def body(k, vis):
                a_k, _ = sphere_cover(k, Px, Py, Pz, Ldx, Ldy, Ldz)
                return vis * (1.0 - a_k)
            return _fold_objects(ns, body, jnp.ones(shape, jnp.float32))

        def shade(Px, Py, Pz, Nx, Ny, Nz, ar, ag, ab):
            """ambient + soft-shadowed Lambert (soft.py:89-100)."""
            sr, sg, sb = amb * ar, amb * ag, amb * ab
            for l in range(nl):
                Lx, Ly, Lz = lts[0, l] - Px, lts[1, l] - Py, lts[2, l] - Pz
                ln = _rnorm(Lx, Ly, Lz)
                Lx, Ly, Lz = Lx * ln, Ly * ln, Lz * ln
                vis = transmission(Px, Py, Pz, Lx, Ly, Lz)
                lam = lamb * (Lx * Nx + Ly * Ny + Lz * Nz)
                lam = jnp.maximum(lam, 0.0) * vis
                sr, sg, sb = sr + lam * ar, sg + lam * ag, sb + lam * ab
            return sr, sg, sb

        def plane_cover(k):
            """Hard plane coverage + depth (static OR traced index — the
            rolled path folds planes like spheres)."""
            nx_, ny_, nz_ = pln[3, k], pln[4, k], pln[5, k]
            den = dx * nx_ + dy * ny_ + dz * nz_
            den_safe = jnp.where(jnp.abs(den) > 1e-8, den, 1.0)
            num = ((pln[0, k] - ox) * nx_ + (pln[1, k] - oy) * ny_ +
                   (pln[2, k] - oz) * nz_)
            t_k = jnp.maximum(num / den_safe, 1e-4)
            a_k = ((jnp.abs(den) > 1e-8) & (num / den_safe > 0.0)
                   ).astype(jnp.float32)
            return a_k, t_k

        def plane_rgb(k, t_k):
            Px, Py, Pz = ox + t_k * dx, oy + t_k * dy, oz + t_k * dz
            return shade(Px, Py, Pz, pln[3, k], pln[4, k], pln[5, k],
                         pln[6, k], pln[7, k], pln[8, k])

        def sphere_eval(k):
            """(alpha, t, shaded rgb) of sphere ``k`` (static or traced)."""
            a_k, t_k = sphere_cover(k, ox, oy, oz, dx, dy, dz)
            cx, cy, cz = sph[0, k], sph[1, k], sph[2, k]
            Px, Py, Pz = ox + t_k * dx, oy + t_k * dy, oz + t_k * dz
            nx_, ny_, nz_ = Px - cx, Py - cy, Pz - cz
            nn = _rnorm(nx_, ny_, nz_)
            rgb = shade(Px, Py, Pz, nx_ * nn, ny_ * nn, nz_ * nn,
                        sph[4, k], sph[5, k], sph[6, k])
            return a_k, t_k, rgb

        if not rolled:
            # Small scenes: cache every object's (alpha, t, rgb) tile in
            # registers, O(K^2) compositing over the cached lists.
            alphas, ts, rgbs = [], [], []
            for k in range(ns):
                a_k, t_k, rgb = sphere_eval(k)
                alphas.append(a_k)
                ts.append(t_k)
                rgbs.append(rgb)
            for k in range(npl):
                a_k, t_k = plane_cover(k)
                rgbs.append(plane_rgb(k, t_k))
                alphas.append(a_k)
                ts.append(t_k)

            # order-free front-to-back compositing (== sorted cumprod,
            # soft.py:137-145)
            out_r = jnp.zeros(shape, jnp.float32)
            out_g = jnp.zeros(shape, jnp.float32)
            out_b = jnp.zeros(shape, jnp.float32)
            K = len(alphas)
            for ii in range(K):
                w = alphas[ii]
                for jj in range(K):
                    if jj == ii:
                        continue
                    if jj < ii:
                        closer = ts[jj] <= ts[ii]   # ties: lower index wins
                    else:
                        closer = ts[jj] < ts[ii]
                    w = w * (1.0 - jnp.where(closer, alphas[jj], 0.0))
                sr, sg, sb = rgbs[ii]
                out_r += w * sr
                out_g += w * sg
                out_b += w * sb
            out_ref[0], out_ref[1], out_ref[2] = out_r, out_g, out_b
            return

        # Rolled scenes: O(1) register state — recompute coverages inside
        # chunk-unrolled folds. Product order matches the unrolled path
        # (spheres ascending, then planes); the j == i factor self-excludes
        # because t_i < t_i is false. Planes roll through the same
        # _fold_objects machinery (unrolling below the limit), so any plane
        # count works — the tie-break against a static-or-traced plane index
        # is the same boolean algebra as the sphere case. Below the limit
        # the per-tile plane covers are computed ONCE and closed over (the
        # common 1-ground-plane case must not pay a recompute per sphere).
        if npl <= _UNROLL_LIMIT:
            _pcache = [plane_cover(k) for k in range(npl)]

            def plane_at(k):
                return _pcache[k]
        else:
            plane_at = plane_cover

        def w_vs_spheres(i_idx, t_i, w):
            def body(jj, w):
                a_j, t_j = sphere_cover(jj, ox, oy, oz, dx, dy, dz)
                # select-on-bool-vectors does not legalize in Mosaic
                # (arith.select over i1): express the stable tie-break as
                # boolean algebra instead. j==i self-excludes (both false).
                closer = (t_j < t_i) | ((t_j <= t_i) & (jj < i_idx))
                return w * (1.0 - jnp.where(closer, a_j, 0.0))
            return _fold_objects(ns, body, w)

        def sphere_body(ii, carry):
            out_r, out_g, out_b = carry
            a_i, t_i, (sr, sg, sb) = sphere_eval(ii)
            w = w_vs_spheres(ii, t_i, a_i)

            def pbody(k, w):            # plane index ns+k > ii: strict <
                a_p, t_p = plane_at(k)
                return w * (1.0 - jnp.where(t_p < t_i, a_p, 0.0))
            w = _fold_objects(npl, pbody, w)
            return out_r + w * sr, out_g + w * sg, out_b + w * sb

        zero = jnp.zeros(shape, jnp.float32)
        out_r, out_g, out_b = _fold_objects(ns, sphere_body,
                                            (zero, zero, zero))

        def plane_body(kk, carry):
            out_r, out_g, out_b = carry
            a_i, t_i = plane_at(kk)
            sr, sg, sb = plane_rgb(kk, t_i)

            def body(jj, w):    # every sphere index < ns + kk: non-strict
                a_j, t_j = sphere_cover(jj, ox, oy, oz, dx, dy, dz)
                return w * (1.0 - jnp.where(t_j <= t_i, a_j, 0.0))
            w = _fold_objects(ns, body, a_i)

            def pbody(k2, w):   # stable index tie-break among planes
                a_j, t_j = plane_at(k2)
                closer = (t_j < t_i) | ((t_j <= t_i) & (k2 < kk))
                return w * (1.0 - jnp.where(closer, a_j, 0.0))
            w = _fold_objects(npl, pbody, w)
            return out_r + w * sr, out_g + w * sg, out_b + w * sb

        out_r, out_g, out_b = _fold_objects(npl, plane_body,
                                            (out_r, out_g, out_b))
        out_ref[0], out_ref[1], out_ref[2] = out_r, out_g, out_b

    return kernel


@functools.partial(jax.jit, static_argnames=("tile_w", "tile_h", "interpret",
                                             "rolled"))
def render_image_soft_pallas(camera, scene, *, tau=0.05, tile_w: int = 40,
                             tile_h: int = 128, interpret: bool = False,
                             rolled: bool | None = None) -> jnp.ndarray:
    """Fused soft render -> float ``(w, h, 3)``, matching
    :func:`..soft.render_image_soft` (clean orientation/channels).

    ``rolled``: None = auto (rolled folds above ``_SOFT_UNROLL_LIMIT``
    objects, fully unrolled below); pass explicitly to pin a path (tests,
    benchmarks)."""
    W, H = camera.resolution
    ns, npl, nl = scene.spheres.count, scene.planes.count, scene.lights.count
    if rolled is None:
        rolled = ns + npl > _SOFT_UNROLL_LIMIT
    params = _pack_params(camera, scene, False)   # clean-mode grid
    extra = jnp.asarray([tau], jnp.float32)
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

    swap_xy = _resolve_swap(W, H)
    U = H if swap_xy else W
    V = W if swap_xy else H
    TW = _fit_tile_w(U, tile_w)
    TH = tile_h
    kernel = _make_soft_kernel(W=W, H=H, TW=TW, TH=TH, ns=ns, npl=npl, nl=nl,
                               swap_xy=swap_xy, rolled=rolled)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(U, TW), pl.cdiv(V, TH)),
        in_specs=[smem()] * 5,
        out_specs=pl.BlockSpec((3, TW, TH), lambda i, j: (0, i, j)),
        out_shape=jax.ShapeDtypeStruct((3, U, V), jnp.float32),
        interpret=interpret,
    )(params, sph, pln, lts, extra)
    if swap_xy:
        return jnp.transpose(out, (2, 1, 0))
    return jnp.moveaxis(out, 0, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def render_image_soft_fast(camera, scene, tau: float = 0.05,
                           interpret: bool = False):
    """Pallas soft forward + fused Pallas backward (soft_bwd.py): the whole
    soft ``value_and_grad`` runs at kernel speed. Round 4's jnp-vjp backward
    made the training step a wash (199 vs 196 ms at 100 spheres / 128^2); the
    hand-derived adjoint kernel replaces it."""
    return render_image_soft_pallas(camera, scene, tau=tau,
                                    interpret=interpret)


def _fwd(camera, scene, tau, interpret):
    return (render_image_soft_pallas(camera, scene, tau=tau,
                                     interpret=interpret), (camera, scene))


def _bwd(tau, interpret, res, g):
    camera, scene = res
    if scene.lights.count > _UNROLL_LIMIT:
        # The adjoint kernel unrolls lights (register pressure bounds the
        # count); exotic light counts keep the old jnp-vjp backward, with
        # the row-chunk remat bound from the r4 form (the jnp soft path
        # materializes f32[rows, H, K, ns, nl]-class intermediates).
        from ..soft import render_image_soft
        W, H = camera.resolution
        ns = scene.spheres.count
        K = ns + scene.planes.count
        nl = scene.lights.count
        per_row = max(H * K * (ns * max(nl, 1) + K * 3), 1)
        chunk = max(1, min(W, (1 << 28) // per_row))   # ~256M f32 = 1 GB
        while W % chunk:
            chunk -= 1
        rc = None if chunk >= W else chunk
        _, vjp = jax.vjp(lambda c, s: render_image_soft(c, s, tau=tau,
                                                        row_chunk=rc),
                         camera, scene)
        return vjp(g)
    from .soft_bwd import soft_scene_grads_pallas
    scene_g, camera_g = soft_scene_grads_pallas(camera, scene, g, tau=tau,
                                                interpret=interpret,
                                                return_camera=True)
    return camera_g, scene_g


render_image_soft_fast.defvjp(_fwd, _bwd)
