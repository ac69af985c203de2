"""Fused Pallas backward for the soft-visibility renderer.

One Mosaic kernel turns an image cotangent into scene (+ camera) gradients at
kernel speed — or, in fused-loss form, renders, forms the MSE cotangent
in-registers against a target block, and reverse-sweeps, so a whole soft
training step is a single ``pallas_call``.

Why this exists: round 4 measured the soft training step as a WASH (199.3 ms
pallas-forward vs 196.1 ms jnp at 100 spheres / 128**2) because
``render_image_soft_fast``'s custom_vjp re-ran the jnp forward inside
``jax.vjp``. The soft math is smooth everywhere — no closest-hit argmin, no
occlusion selects (reference ray_tracing/trace.py:8-41 is the *hard* semantics
this renderer relaxes; the reference itself has no backward pass at all) — so
the adjoint is plain chain rule over the same rolled folds as the forward
kernel (soft_pallas.py). The key simplification: every exclusion-product
division cancels against the sigmoid derivative ``a(1-a)``. With ``x`` the
sigmoid pre-activation and ``c_ji`` the (piecewise-constant) depth-order
indicator:

  transmission  vis = prod_j (1 - a_j):
      dL/dx_j = -vis_bar * vis * a_j
  compositing   w_i = a_i * prod_{j != i} (1 - a_j * c_ji):
      own factor   dL/dx_i += w_bar * w_i * (1 - a_i)
      occluder     dL/dx_j -= w_bar * w_i * a_j          (where c_ji)

These identities are exact including sigmoid saturation (a_j == 1.0 in f32
forces both sides to zero), so the backward needs no guarded divides and no
O(K) exclusion products — just the forward values it recomputes anyway.

Structure mirrors render_bwd.py: each grid step recomputes its tile forward
with O(1) register state (an outer fold over primary objects with two inner
folds over occluders — ``render_pallas._fold_objects``, the same machinery as
the soft forward kernel's rolled path), reduces per-parameter adjoints to
scalars, and accumulates them into a flat SMEM output vector every grid step
revisits. Gradient layout == ``render_bwd.grad_layout`` (refl/spec/shin slots
stay zero: the soft scope has no mirror bounces and no Phong, ops/soft.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .render_pallas import (_fit_tile_w,
                            _P_ORIGIN, _P_ROT, _P_FOCAL, _P_Y0, _P_DY, _P_Z0,
                            _P_DZ, _P_AMB, _P_LAMB, _P_X0, _UNROLL_LIMIT,
                            _fold_objects, _pack_params, _rnorm, _resolve_swap)
from .render_bwd import grad_layout, unflatten_grads, _norm_adj

import os as _os
# Diagnosis hook (WRONG GRADIENTS — measurement only): replaces the per-slot
# full-tile reductions with a single-lane extract, keeping every adjoint
# chain live. Isolates the reduction share of the fused soft step's runtime.
if _os.environ.get("RT_SOFT_NO_REDUCE") == "1":
    def _vsum(vec):
        return vec[0, 0]
else:
    _vsum = jnp.sum

# Slab accumulation for the fold2 occluder adjoints (rolled scenes): instead
# of 4 full-tile reductions + SMEM scalar RMWs per (object, occluder) pair —
# measured at 73% of the fused step's runtime (ONCHIP_r05 single-lane-extract
# A/B: 32.3 -> 8.8 ms) — accumulate each occluder's (center, radius) partials
# as (4, TW, TH) tiles in a VMEM slab indexed by occluder and reduce each
# slot ONCE per grid step at flush time. DEFAULT ON since the on-chip A/B
# (benchmarks/soft_slab_ab.py, ONCHIP_r05): 31.8 -> 25.2 ms at 100
# spheres/128^2, grad parity 2.3e-6 rel. The win is 1.26x, not the stub
# floor's 3.7x — the per-pair (4, TW, TH) slab read-modify-write traffic
# replaces most of what the reductions cost (and the slab forces TW 40->32
# to fit scoped VMEM). RT_SOFT_SLAB_ACC=0 restores the direct reductions.
_SLAB_ACC = _os.environ.get("RT_SOFT_SLAB_ACC", "1") == "1"


def _make_soft_bwd_kernel(*, W, H, U, V, TW, TH, ns, npl, nl, swap_xy,
                          fused_loss, slab_acc=False):
    shape = (TW, TH)
    slots, n_grads = grad_layout(ns, npl, nl)
    if fused_loss:
        slots = dict(slots, loss=n_grads)
        n_grads += 1
    inv_denom = 1.0 / float(W * H * 3)

    k_amb = slots["amb"]
    k_lamb = slots["lamb"]
    k_light = lambda l, c: slots[("light", l, c)]
    k_cam = slots[("cam_pos", 0)]
    k_rot = slots[("rot", 0, 0)]
    k_fov = slots["fov"]

    def kernel(params, sph, pln, lts, extra, g_ref, out_ref, *scratch):
        gslab_ref = scratch[0] if slab_acc else None
        tau = extra[0]
        amb = params[_P_AMB]
        lamb = params[_P_LAMB]
        i_pid = pl.program_id(0)
        j_pid = pl.program_id(1)

        @pl.when((i_pid == 0) & (j_pid == 0))
        def _zero():
            if n_grads <= 64:
                for k in range(n_grads):
                    out_ref[k] = jnp.float32(0.0)
            else:
                def zbody(k, _):
                    out_ref[k] = jnp.float32(0.0)
                    return 0
                jax.lax.fori_loop(0, n_grads, zbody, 0)

        if slab_acc:
            # scratch persists across grid steps: zero this tile's slab
            def _zslab(j, _):
                gslab_ref[j] = jnp.zeros((4, TW, TH), jnp.float32)
                return 0
            jax.lax.fori_loop(0, ns, _zslab, 0)

        fu = (i_pid * TW).astype(jnp.float32)
        fv = (j_pid * TH).astype(jnp.float32)
        su = fu + jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32)
        sv = fv + jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
        # pad-lane mask in LOCAL slice coordinates; the global image-x adds
        # the shard's column offset (ray-DP sharding — render_bwd pattern)
        inb = (su < U) & (sv < V)
        if not swap_xy:
            px, py = su + params[_P_X0], sv
        else:
            px, py = sv + params[_P_X0], su

        # --- analytic ray generation (clean-mode grid, == soft_pallas) --------
        pcx = params[_P_FOCAL]
        pcy = params[_P_Y0] + px * params[_P_DY]
        pcz = params[_P_Z0] + py * params[_P_DZ]
        R = params
        rdx = R[_P_ROT + 0] * pcx + R[_P_ROT + 1] * pcy + R[_P_ROT + 2] * pcz
        rdy = R[_P_ROT + 3] * pcx + R[_P_ROT + 4] * pcy + R[_P_ROT + 5] * pcz
        rdz = R[_P_ROT + 6] * pcx + R[_P_ROT + 7] * pcy + R[_P_ROT + 8] * pcz
        dn = _rnorm(rdx, rdy, rdz)
        dx, dy, dz = rdx * dn, rdy * dn, rdz * dn
        ox = params[_P_ORIGIN + 0]
        oy = params[_P_ORIGIN + 1]
        oz = params[_P_ORIGIN + 2]

        zeros = jnp.zeros(shape, jnp.float32)

        def acc_sph(j, c, vec):
            out_ref[j * 7 + c] += _vsum(vec)

        def acc_pln(j, c, scalar):
            # plane slots sit right after the sphere block (grad_layout
            # order); j may be static or traced (rolled plane folds)
            out_ref[7 * ns + j * 9 + c] += scalar

        # --- soft sphere coverage: forward with adjoint residuals -------------
        def cover(Ox, Oy, Oz, Dx, Dy, Dz, cx, cy, cz, r, need_t):
            """Value chain == soft_pallas._soft_cover / soft.py:41-63."""
            Lx, Ly, Lz = cx - Ox, cy - Oy, cz - Oz
            t_ca = Lx * Dx + Ly * Dy + Lz * Dz
            LL = Lx * Lx + Ly * Ly + Lz * Lz
            d2 = LL - t_ca * t_ca
            d2p = d2 > 1e-12
            d2c = jnp.where(d2p, d2, 1e-12)
            b = jnp.sqrt(d2c)
            a = jax.nn.sigmoid(-(b - r) / (tau * r))
            a = jnp.where(t_ca > 0.0, a, 0.0)
            cv = dict(L=(Lx, Ly, Lz), t_ca=t_ca, d2p=d2p, d2c=d2c, b=b, a=a,
                      r=r, t=None, t_raw=None, inside=None, c2c=None)
            if need_t:
                chord2 = r * r - d2
                inside = chord2 > 1e-12
                c2c = jnp.where(inside, chord2, 1.0)
                hc = jnp.sqrt(c2c)
                t_raw = jnp.where(inside, t_ca - hc, t_ca)
                cv.update(t=jnp.maximum(t_raw, 1e-4), t_raw=t_raw,
                          inside=inside, c2c=c2c)
            return cv

        def cover_adj(cv, Dx, Dy, Dz, xbar, tbar):
            """Adjoint of ``cover``: cotangent ``xbar`` on the sigmoid
            pre-activation, ``tbar`` on the clamped blend depth. Returns
            (cbar3, rbar, obar3, dbar3)."""
            r = cv["r"]
            inv_tr = 1.0 / (tau * r)
            bbar = -xbar * inv_tr
            rbar = xbar * cv["b"] * inv_tr * (1.0 / r)
            d2bar = jnp.where(cv["d2p"],
                              bbar * 0.5 * jax.lax.rsqrt(cv["d2c"]), 0.0)
            if tbar is not None:
                t_rbar = jnp.where(cv["t_raw"] > 1e-4, tbar, 0.0)
                hcbar = jnp.where(cv["inside"], -t_rbar, 0.0)
                c2bar = hcbar * 0.5 * jax.lax.rsqrt(cv["c2c"])
                rbar = rbar + 2.0 * r * c2bar
                d2bar = d2bar - c2bar
                t_cabar = t_rbar - 2.0 * cv["t_ca"] * d2bar
            else:
                t_cabar = -2.0 * cv["t_ca"] * d2bar
            LLbar = d2bar
            Lx, Ly, Lz = cv["L"]
            Lbx = t_cabar * Dx + 2.0 * LLbar * Lx
            Lby = t_cabar * Dy + 2.0 * LLbar * Ly
            Lbz = t_cabar * Dz + 2.0 * LLbar * Lz
            dbx = t_cabar * Lx
            dby = t_cabar * Ly
            dbz = t_cabar * Lz
            return ((Lbx, Lby, Lbz), rbar, (-Lbx, -Lby, -Lbz), (dbx, dby, dbz))

        def cover_cam(j, need_t):
            return cover(ox, oy, oz, dx, dy, dz, sph[0, j], sph[1, j],
                         sph[2, j], sph[3, j], need_t)

        # --- opaque plane coverage (soft.py:66-72); static OR traced k --------
        def plane_cover(k):
            pnx, pny, pnz = pln[3, k], pln[4, k], pln[5, k]
            den = dx * pnx + dy * pny + dz * pnz
            den_ok = jnp.abs(den) > 1e-8
            den_safe = jnp.where(den_ok, den, 1.0)
            num = ((pln[0, k] - ox) * pnx + (pln[1, k] - oy) * pny +
                   (pln[2, k] - oz) * pnz)
            t_pre = num / den_safe
            a_p = (den_ok & (t_pre > 0.0)).astype(jnp.float32)
            return a_p, jnp.maximum(t_pre, 1e-4)

        # Below the unroll limit the per-tile plane covers are computed once
        # and closed over (sphere_prelude's plane factors run per outer
        # sphere — the common 1-plane case must not pay a recompute per i);
        # above it, plane folds recompute like sphere folds.
        if npl <= _UNROLL_LIMIT:
            _pcache = [plane_cover(k) for k in range(npl)]

            def plane_at(k):
                return _pcache[k]
        else:
            plane_at = plane_cover

        def light_geom(Px, Py, Pz):
            Ls = []
            for l in range(nl):
                wvx = lts[0, l] - Px
                wvy = lts[1, l] - Py
                wvz = lts[2, l] - Pz
                ww = wvx * wvx + wvy * wvy + wvz * wvz
                lrn = jax.lax.rsqrt(jnp.where(ww <= 1e-20, 1.0, ww))
                Ls.append((wvx * lrn, wvy * lrn, wvz * lrn, lrn))
            return Ls

        def fold1(mode, i_idx, t_i, w0, Px, Py, Pz, Ls):
            """One sweep over spheres: this object's compositing weight factors
            AND the per-light shadow transmissions, fused (shared SMEM reads).
            ``mode``: "sphere" uses the stable index tie-break; "plane" is
            non-strict for every sphere (sphere index < plane index)."""
            def body(j, carry):
                w = carry[0]
                vis = carry[1:]
                cv = cover_cam(j, need_t=True)
                a_j, t_j = cv["a"], cv["t"]
                if mode == "sphere":
                    closer = (t_j < t_i) | ((t_j <= t_i) & (j < i_idx))
                else:
                    closer = t_j <= t_i
                w = w * (1.0 - jnp.where(closer, a_j, 0.0))
                new_vis = []
                for l in range(nl):
                    Lx, Ly, Lz, _ = Ls[l]
                    cvS = cover(Px, Py, Pz, Lx, Ly, Lz, sph[0, j], sph[1, j],
                                sph[2, j], sph[3, j], need_t=False)
                    new_vis.append(vis[l] * (1.0 - cvS["a"]))
                return (w, *new_vis)
            out = _fold_objects(ns, body,
                                (w0, *([jnp.ones(shape, jnp.float32)] * nl)))
            return out[0], list(out[1:])

        def fold2(mode, i_idx, t_i, wbar_wi, Px, Py, Pz, Ls, vis_fac, init):
            """Adjoint sweep over spheres: per-occluder cotangents from this
            object's compositing weight (``wbar_wi = w_bar * w_i``) and from
            its per-light transmissions (``vis_fac[l] = -vis_bar_l * vis_l``).
            ``init/returns`` carry ``(dbar3, obar3, Pbar3, Lbar3 per light)``;
            sphere-parameter adjoints go straight to SMEM (one reduction per
            (object, occluder) pair — center+radius partials are summed as
            tiles across the compositing and all shadow terms first)."""
            def body(j, carry):
                dbx, dby, dbz, obx, oby, obz, Pbx, Pby, Pbz = carry[:9]
                Lb = list(carry[9:])
                cv = cover_cam(j, need_t=True)
                a_j, t_j = cv["a"], cv["t"]
                if mode == "sphere":
                    closer = (t_j < t_i) | ((t_j <= t_i) & (j < i_idx))
                else:
                    closer = t_j <= t_i
                xbar = -wbar_wi * jnp.where(closer, a_j, 0.0)
                (cbx, cby, cbz), rb, ob, db = cover_adj(cv, dx, dy, dz,
                                                        xbar, None)
                obx, oby, obz = obx + ob[0], oby + ob[1], obz + ob[2]
                dbx, dby, dbz = dbx + db[0], dby + db[1], dbz + db[2]
                for l in range(nl):
                    Lx, Ly, Lz, _ = Ls[l]
                    cvS = cover(Px, Py, Pz, Lx, Ly, Lz, sph[0, j], sph[1, j],
                                sph[2, j], sph[3, j], need_t=False)
                    xS = vis_fac[l] * cvS["a"]
                    (cSx, cSy, cSz), rS, oS, dS = cover_adj(cvS, Lx, Ly, Lz,
                                                            xS, None)
                    cbx, cby, cbz = cbx + cSx, cby + cSy, cbz + cSz
                    rb = rb + rS
                    Pbx, Pby, Pbz = Pbx + oS[0], Pby + oS[1], Pbz + oS[2]
                    Lb[3 * l + 0] += dS[0]
                    Lb[3 * l + 1] += dS[1]
                    Lb[3 * l + 2] += dS[2]
                if slab_acc:
                    gslab_ref[j] = gslab_ref[j] + jnp.stack(
                        [cbx, cby, cbz, rb])
                else:
                    acc_sph(j, 0, cbx)
                    acc_sph(j, 1, cby)
                    acc_sph(j, 2, cbz)
                    acc_sph(j, 3, rb)
                return (dbx, dby, dbz, obx, oby, obz, Pbx, Pby, Pbz, *Lb)
            return _fold_objects(ns, body, init)

        def shade_fwd(N, A, vis, Ls):
            """s = amb + sum_l relu(lamb * L.N) * vis_l; residuals for the
            adjoint. (rgb = s * A — the forward kernel's factored form.)"""
            nx_, ny_, nz_ = N
            ldotns, relus = [], []
            lam_sum = zeros
            for l in range(nl):
                Lx, Ly, Lz, _ = Ls[l]
                ldotn = Lx * nx_ + Ly * ny_ + Lz * nz_
                relu = jnp.maximum(lamb * ldotn, 0.0)
                lam_sum = lam_sum + relu * vis[l]
                ldotns.append(ldotn)
                relus.append(relu)
            return amb + lam_sum, ldotns, relus

        def obj_common(gr, gg, gb, w, s_val, A, N, vis, Ls, ldotns, relus):
            """Adjoint pieces shared by sphere and plane objects. Returns
            (wbar_wi, vis_fac, Nbar3, Lbar flat list, sbar, gA)."""
            car, cag, cab = A
            nx_, ny_, nz_ = N
            gA = gr * car + gg * cag + gb * cab
            wbar = s_val * gA
            sbar = w * gA
            wbar_wi = wbar * w
            out_ref[k_amb] += _vsum(sbar)
            lamb_acc = zeros
            Nbx, Nby, Nbz = zeros, zeros, zeros
            Lb = []
            vis_fac = []
            for l in range(nl):
                Lx, Ly, Lz, _ = Ls[l]
                visbar = sbar * relus[l]
                relubar = sbar * vis[l]
                pos = (lamb * ldotns[l]) > 0.0
                lamb_acc = lamb_acc + jnp.where(pos, relubar * ldotns[l], 0.0)
                ldotnbar = jnp.where(pos, relubar * lamb, 0.0)
                Nbx = Nbx + ldotnbar * Lx
                Nby = Nby + ldotnbar * Ly
                Nbz = Nbz + ldotnbar * Lz
                Lb += [ldotnbar * nx_, ldotnbar * ny_, ldotnbar * nz_]
                vis_fac.append(-visbar * vis[l])
            out_ref[k_lamb] += _vsum(lamb_acc)
            return wbar_wi, vis_fac, (Nbx, Nby, Nbz), Lb, sbar, gA

        def light_norm_adj(Ls, Lb, l, Pb):
            """L = wv * lrn normalize adjoint -> light-position slot + Pbar."""
            Lx, Ly, Lz, lrn = Ls[l]
            wvb = _norm_adj((Lx, Ly, Lz), lrn,
                            (Lb[3 * l + 0], Lb[3 * l + 1], Lb[3 * l + 2]))
            out_ref[k_light(l, 0)] += _vsum(wvb[0])
            out_ref[k_light(l, 1)] += _vsum(wvb[1])
            out_ref[k_light(l, 2)] += _vsum(wvb[2])
            return Pb[0] - wvb[0], Pb[1] - wvb[1], Pb[2] - wvb[2]

        # --- per-object forward prelude (shared by fwd pass and bwd sweep) ----
        def sphere_prelude(i_idx):
            cv = cover_cam(i_idx, need_t=True)
            t_i = cv["t"]
            Px, Py, Pz = ox + t_i * dx, oy + t_i * dy, oz + t_i * dz
            vx = Px - sph[0, i_idx]
            vy = Py - sph[1, i_idx]
            vz = Pz - sph[2, i_idx]
            vv = vx * vx + vy * vy + vz * vz
            nn = jax.lax.rsqrt(jnp.where(vv <= 1e-20, 1.0, vv))
            N = (vx * nn, vy * nn, vz * nn)
            Ls = light_geom(Px, Py, Pz)
            w, vis = fold1("sphere", i_idx, t_i, cv["a"], Px, Py, Pz, Ls)

            def pbody(k, w):              # plane index ns+k > i: strict
                a_p, t_p = plane_at(k)
                return w * (1.0 - jnp.where(t_p < t_i, a_p, 0.0))
            w = _fold_objects(npl, pbody, w)
            A = (sph[4, i_idx], sph[5, i_idx], sph[6, i_idx])
            s_val, ldotns, relus = shade_fwd(N, A, vis, Ls)
            return cv, t_i, (Px, Py, Pz), N, nn, Ls, w, vis, A, s_val, \
                ldotns, relus

        def plane_prelude(k):
            a_p, t_p = plane_at(k)
            Px, Py, Pz = ox + t_p * dx, oy + t_p * dy, oz + t_p * dz
            N = (pln[3, k], pln[4, k], pln[5, k])
            Ls = light_geom(Px, Py, Pz)
            w, vis = fold1("plane", ns + k, t_p, a_p, Px, Py, Pz, Ls)

            def pbody(k2, w):   # stable index tie-break; k2==k self-excludes
                a_2, t_2 = plane_at(k2)
                closer = (t_2 < t_p) | ((t_2 <= t_p) & (k2 < k))
                return w * (1.0 - jnp.where(closer, a_2, 0.0))
            w = _fold_objects(npl, pbody, w)
            A = (pln[6, k], pln[7, k], pln[8, k])
            s_val, ldotns, relus = shade_fwd(N, A, vis, Ls)
            return t_p, (Px, Py, Pz), N, Ls, w, vis, A, s_val, ldotns, relus

        # --- incoming cotangent (or fused in-kernel MSE) ----------------------
        if fused_loss:
            def fwd_sphere(i_idx, carry):
                o_r, o_g, o_b = carry
                _, _, _, _, _, _, w, _, A, s_val, _, _ = sphere_prelude(i_idx)
                return (o_r + w * s_val * A[0], o_g + w * s_val * A[1],
                        o_b + w * s_val * A[2])
            o_r, o_g, o_b = _fold_objects(ns, fwd_sphere, (zeros, zeros, zeros))

            def fwd_plane(kk, carry):
                o_r, o_g, o_b = carry
                _, _, _, _, w, _, A, s_val, _, _ = plane_prelude(kk)
                return (o_r + w * s_val * A[0], o_g + w * s_val * A[1],
                        o_b + w * s_val * A[2])
            o_r, o_g, o_b = _fold_objects(npl, fwd_plane, (o_r, o_g, o_b))
            d0 = jnp.where(inb, o_r - g_ref[0], 0.0)
            d1 = jnp.where(inb, o_g - g_ref[1], 0.0)
            d2_ = jnp.where(inb, o_b - g_ref[2], 0.0)
            out_ref[slots["loss"]] += _vsum(
                (d0 * d0 + d1 * d1 + d2_ * d2_)) * jnp.float32(inv_denom)
            sc = jnp.float32(2.0 * inv_denom)
            gr, gg, gb = sc * d0, sc * d1, sc * d2_
        else:
            gr = jnp.where(inb, g_ref[0], 0.0)
            gg = jnp.where(inb, g_ref[1], 0.0)
            gb = jnp.where(inb, g_ref[2], 0.0)

        # --- reverse sweep: spheres (rolled fold), then planes ----------------
        def sphere_iter(i_idx, carry):
            dbx, dby, dbz, obx, oby, obz = carry
            cv, t_i, P, N, nn, Ls, w, vis, A, s_val, ldotns, relus = \
                sphere_prelude(i_idx)
            Px, Py, Pz = P
            wbar_wi, vis_fac, Nb, Lb, _, _ = obj_common(
                gr, gg, gb, w, s_val, A, N, vis, Ls, ldotns, relus)
            acc_sph(i_idx, 4, w * s_val * gr)
            acc_sph(i_idx, 5, w * s_val * gg)
            acc_sph(i_idx, 6, w * s_val * gb)
            st = fold2("sphere", i_idx, t_i, wbar_wi, Px, Py, Pz, Ls, vis_fac,
                       (dbx, dby, dbz, obx, oby, obz, zeros, zeros, zeros,
                        *Lb))
            dbx, dby, dbz, obx, oby, obz = st[:6]
            Pb = st[6:9]
            Lb = list(st[9:])
            for l in range(nl):
                Pb = light_norm_adj(Ls, Lb, l, Pb)
            # normal chain: N = (P - c) * nn
            vb = _norm_adj(N, nn, Nb)
            Pbx = Pb[0] + vb[0]
            Pby = Pb[1] + vb[1]
            Pbz = Pb[2] + vb[2]
            # P = o + t d
            obx, oby, obz = obx + Pbx, oby + Pby, obz + Pbz
            tbar = Pbx * dx + Pby * dy + Pbz * dz
            dbx = dbx + t_i * Pbx
            dby = dby + t_i * Pby
            dbz = dbz + t_i * Pbz
            # own coverage + depth adjoint
            xbar_i = wbar_wi * (1.0 - cv["a"])
            (cbx, cby, cbz), rb, ob, db = cover_adj(cv, dx, dy, dz, xbar_i,
                                                    tbar)
            acc_sph(i_idx, 0, cbx - vb[0])
            acc_sph(i_idx, 1, cby - vb[1])
            acc_sph(i_idx, 2, cbz - vb[2])
            acc_sph(i_idx, 3, rb)
            return (dbx + db[0], dby + db[1], dbz + db[2],
                    obx + ob[0], oby + ob[1], obz + ob[2])

        dbx, dby, dbz, obx, oby, obz = _fold_objects(
            ns, sphere_iter, (zeros, zeros, zeros, zeros, zeros, zeros))

        def plane_iter(kk, carry):
            dbx, dby, dbz, obx, oby, obz = carry
            t_p, P, N, Ls, w, vis, A, s_val, ldotns, relus = plane_prelude(kk)
            Px, Py, Pz = P
            wbar_wi, vis_fac, Nb, Lb, _, _ = obj_common(
                gr, gg, gb, w, s_val, A, N, vis, Ls, ldotns, relus)
            acc_pln(kk, 6, _vsum(w * s_val * gr))
            acc_pln(kk, 7, _vsum(w * s_val * gg))
            acc_pln(kk, 8, _vsum(w * s_val * gb))
            st = fold2("plane", ns + kk, t_p, wbar_wi, Px, Py, Pz, Ls, vis_fac,
                       (dbx, dby, dbz, obx, oby, obz, zeros, zeros, zeros,
                        *Lb))
            dbx, dby, dbz, obx, oby, obz = st[:6]
            Pb = st[6:9]
            Lb = list(st[9:])
            for l in range(nl):
                Pb = light_norm_adj(Ls, Lb, l, Pb)
            Pbx, Pby, Pbz = Pb
            # P = o + t d  (opaque plane alpha is an indicator: no alpha grad)
            obx, oby, obz = obx + Pbx, oby + Pby, obz + Pbz
            tbar = Pbx * dx + Pby * dy + Pbz * dz
            dbx = dbx + t_p * Pbx
            dby = dby + t_p * Pby
            dbz = dbz + t_p * Pbz
            # t = max(num / den_safe, 1e-4) chain (matches jnp _plane_cover
            # guards: den grad masked by |den| > 1e-8, num grad unmasked)
            pnx, pny, pnz = N
            den = dx * pnx + dy * pny + dz * pnz
            den_ok = jnp.abs(den) > 1e-8
            den_safe = jnp.where(den_ok, den, 1.0)
            num = ((pln[0, kk] - ox) * pnx + (pln[1, kk] - oy) * pny +
                   (pln[2, kk] - oz) * pnz)
            t_pre = num / den_safe
            inv_den = 1.0 / den_safe
            t_m = jnp.where(t_pre > 1e-4, tbar, 0.0)
            numbar = t_m * inv_den
            denbar = jnp.where(den_ok, -(t_m * t_pre) * inv_den, 0.0)
            nb_sum = _vsum(numbar)
            acc_pln(kk, 0, nb_sum * pnx)
            acc_pln(kk, 1, nb_sum * pny)
            acc_pln(kk, 2, nb_sum * pnz)
            obx = obx - numbar * pnx
            oby = oby - numbar * pny
            obz = obz - numbar * pnz
            acc_pln(kk, 3, _vsum(denbar * dx + Nb[0]) + nb_sum * (pln[0, kk] - ox))
            acc_pln(kk, 4, _vsum(denbar * dy + Nb[1]) + nb_sum * (pln[1, kk] - oy))
            acc_pln(kk, 5, _vsum(denbar * dz + Nb[2]) + nb_sum * (pln[2, kk] - oz))
            dbx = dbx + denbar * pnx
            dby = dby + denbar * pny
            dbz = dbz + denbar * pnz
            return (dbx, dby, dbz, obx, oby, obz)

        dbx, dby, dbz, obx, oby, obz = _fold_objects(
            npl, plane_iter, (dbx, dby, dbz, obx, oby, obz))

        if slab_acc:
            # flush: one reduction per (occluder, slot) per grid step instead
            # of one per (object, occluder) pair
            def _flush(j, _):
                blk = gslab_ref[j]
                for c in range(4):
                    out_ref[j * 7 + c] += jnp.sum(blk[c])
                return 0
            jax.lax.fori_loop(0, ns, _flush, 0)

        # --- camera adjoints: d = normalize(R @ p), o = position --------------
        out_ref[k_cam + 0] += _vsum(obx)
        out_ref[k_cam + 1] += _vsum(oby)
        out_ref[k_cam + 2] += _vsum(obz)
        ub = _norm_adj((dx, dy, dz), dn, (dbx, dby, dbz))
        pv = (pcx, pcy, pcz)
        for rr in range(3):
            for cc in range(3):
                out_ref[k_rot + 3 * rr + cc] += _vsum(ub[rr] * pv[cc])
        focal_bar = (R[_P_ROT + 0] * ub[0] + R[_P_ROT + 3] * ub[1] +
                     R[_P_ROT + 6] * ub[2])
        dfdf = -(1.0 + pcx * pcx) * jnp.float32(3.14159265358979 / 360.0)
        out_ref[k_fov] += _vsum(focal_bar) * dfdf

    return kernel, n_grads


@functools.partial(jax.jit, static_argnames=("tile_w", "tile_h", "interpret",
                                             "return_camera", "fused_loss",
                                             "local_width"))
def _soft_grads_pallas(camera, scene, g_or_target, tau, *, tile_w: int = 40,
                       tile_h: int = 128, interpret: bool = False,
                       return_camera: bool = False, fused_loss: bool = False,
                       x_offset=0.0, local_width: int | None = None):
    W, H = camera.resolution
    W_out = W if local_width is None else local_width
    ns, npl, nl = scene.spheres.count, scene.planes.count, scene.lights.count
    assert nl <= _UNROLL_LIMIT, (
        "soft backward keeps lights unrolled — use the jnp path")
    params = _pack_params(camera, scene, False, x_offset)  # clean-mode grid
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

    swap_xy = _resolve_swap(W_out, H)
    U = H if swap_xy else W_out
    V = W_out if swap_xy else H
    TW = _fit_tile_w(U, tile_w)
    TH = tile_h
    slab_acc = _SLAB_ACC and ns > _UNROLL_LIMIT
    if slab_acc:
        # The (ns, 4, TW, TH) f32 slab plus the kernel's working set must fit
        # the ~16 MB scoped-VMEM ceiling (TW=40/ns=100 measured 104 KB over).
        # Budget the slab at ~6.8 MB and shrink the tile width to fit —
        # sublane granularity is 8; below TW=8 the slab can't pay for itself,
        # so fall back to the direct per-pair reductions.
        tw_fit = 6_800_000 // (ns * 4 * TH * 4)
        tw_fit -= tw_fit % 8
        if tw_fit >= 8:
            TW = min(TW, tw_fit)
        else:
            slab_acc = False
    kernel, n_grads = _make_soft_bwd_kernel(W=W, H=H, U=U, V=V, TW=TW, TH=TH,
                                            ns=ns, npl=npl, nl=nl,
                                            swap_xy=swap_xy,
                                            fused_loss=fused_loss,
                                            slab_acc=slab_acc)
    g_chw = jnp.moveaxis(g_or_target.astype(jnp.float32), -1, 0)
    if swap_xy:
        g_chw = jnp.transpose(g_chw, (0, 2, 1))
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    flat = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(U, TW), pl.cdiv(V, TH)),
        in_specs=[smem()] * 5 + [pl.BlockSpec((3, TW, TH),
                                              lambda i, j: (0, i, j))],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n_grads,), jnp.float32),
        scratch_shapes=([pltpu.VMEM((ns, 4, TW, TH), jnp.float32)]
                        if slab_acc else []),
        interpret=interpret,
    )(params, sph, pln, lts, extra, g_chw)
    return unflatten_grads(flat, ns, npl, nl, camera,
                           return_camera=return_camera, fused_loss=fused_loss)


def soft_scene_grads_pallas(camera, scene, g_image, *, tau: float = 0.05,
                            tile_w: int = 40, tile_h: int = 128,
                            interpret: bool = False,
                            return_camera: bool = False):
    """Fused soft backward: image cotangent ``(w, h, 3)`` -> scene-gradient
    pytree (+ camera with ``return_camera``). Matches ``jax.vjp`` of the jnp
    soft path (ops/soft.py) to f32 reassociation tolerance."""
    return _soft_grads_pallas(camera, scene, g_image, tau, tile_w=tile_w,
                              tile_h=tile_h, interpret=interpret,
                              return_camera=return_camera, fused_loss=False)


def soft_loss_and_grads_pallas(camera, scene, target, *, tau: float = 0.05,
                               tile_w: int = 40, tile_h: int = 128,
                               interpret: bool = False,
                               return_camera: bool = False,
                               x_offset=0.0, local_width: int | None = None):
    """Fully-fused soft training step: ONE kernel renders each tile, forms the
    MSE loss/cotangent against ``target`` in-registers, and reverse-sweeps.
    Returns ``(loss, scene_grads)`` (+ camera grads with ``return_camera``).

    On a vertical slice (``x_offset``/``local_width`` — ray-DP sharding) the
    loss partial carries the GLOBAL mean denominator, so shard partials psum
    to the full-image MSE (train.soft_value_and_grad_sharded), exactly like
    the hard path's fused step."""
    return _soft_grads_pallas(camera, scene, target, tau, tile_w=tile_w,
                              tile_h=tile_h, interpret=interpret,
                              return_camera=return_camera, fused_loss=True,
                              x_offset=x_offset, local_width=local_width)
