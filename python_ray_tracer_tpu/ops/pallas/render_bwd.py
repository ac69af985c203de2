"""Fused Pallas backward kernel: scene-parameter gradients at kernel speed.

Hand-derived reverse-mode adjoints of the full render chain (closest-hit ->
normal -> ambient/Lambert/shadows -> mirror-bounce recursion), fused into one
``pallas_call``. The reference has no backward pass at all; the XLA-autodiff
backward of the jnp path (ops/render.py) is correct but ~35x slower than the
forward kernel — this kernel is SURVEY §7 step 5's "custom VJP pairing a fused
backward kernel".

Design:
  * Each grid step recomputes its tile's forward chain keeping all residuals in
    SSA registers (depth <= ~4 unrolled — no checkpointing, no HBM residuals),
    reads the incoming image cotangent block, then runs the reverse sweep.
  * Per-parameter adjoints are lane-masked vector expressions reduced to scalars
    and accumulated into a flat SMEM *output* vector that every grid step
    revisits (index_map ignores the grid position): zeroed at the first step,
    ``+=`` thereafter — a single-core sequential-grid reduction.
  * Closest-hit distance adjoints come from the implicit function theorem:
    ``f(t) = a t^2 + b t + c = 0  =>  dt = -(t^2 da + t db + dc) / (2 a t + b)``
    — no differentiating through the root formula's cancellation-prone sqrt.
    Grazing hits (|2at+b| ~ 0) are clamped to zero adjoint (the a.e. gradient).

Scope (fall back to XLA autodiff otherwise — see ``scene_grads``):
  * gradients w.r.t. the scene pytree (sphere center/radius/albedo, plane
    origin/normal/albedo, light positions, ambient/lambert/reflection, and in
    clean mode Phong specular/shininess) plus, via ``return_camera=True``, the
    camera (position/rotation/fov);
  * no-AA or 9x-AA (per-sample grid axis), any static depth;
  * unrolled light counts (<= 16); spheres AND planes may be rolled (any
    count — plane folds switch to chunk-unrolled ``fori_loop`` with dynamic
    SMEM gradient stores above the limit, same machinery as spheres).

Gradient layout (flat f32 vector): ``[spheres (7*Ns: cx,cy,cz,r,ar,ag,ab)...,
planes (9*Np: ox,oy,oz,nx,ny,nz,ar,ag,ab)..., lights (3*Nl)..., amb, lamb,
refl, spec, shin, cam_pos (3), rot (9), fov]``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .render_pallas import (_P_ORIGIN, _P_ROT, _P_FOCAL, _P_Y0, _P_DY, _P_Z0,
                            _P_DZ, _P_AMB, _P_LAMB, _P_REFL, _P_SPEC, _P_SHIN,
                            _P_X0, _P_OFFS,
                            AA_OFFSETS, _pack_params, _UNROLL_LIMIT, FAR, BIAS,
                            BIG, _rnorm, _fold_objects, _sphere_occ_cheap,
                            _shadow_cheap_ok, _resolve_swap, _tile_visibility,
                            _cull_capacity, _culled_sphere_fold, _CULL_BUDGET,
                            _CHUNK, _culled_sphere_fold_ee, _hit_extents_pallas,
                            _shadow_visibility_lists, _shadow_list_capacity,
                            _SH_BUDGET, _SMEM_TABLE_BUDGET, _SHADOW_LISTS_AUTO,
                            _any_hit_listed, _grouped_sphere_fold,
                            _any_hit_multi_grouped, _sphere_groups,
                            _GROUP_SIZE, _GROUP_CULL_AUTO, _GROUP_MIN_NS)

_DEN_EPS = 1e-6   # grazing-hit clamp for implicit-function t adjoints

import os as _os
_ATTR_SLABS = _os.environ.get("RT_AA_ATTR_SLABS", "1") != "0"  # bench A/B hook


def _vsum(x):
    return jnp.sum(x)


def _norm_adj(u, rn, ubar):
    """Adjoint of u = v * rn, rn = 1/|v|: given ubar, return vbar.

    ``u`` is the normalized vector (tuple of 3), ``rn`` the stored reciprocal
    norm. vbar = rn * (ubar - u * (u . ubar)).
    """
    ux, uy, uz = u
    bx, by, bz = ubar
    dot = ux * bx + uy * by + uz * bz
    return (rn * (bx - ux * dot), rn * (by - uy * dot), rn * (bz - uz * dot))


def _jf32(j, off=0):
    """Static-or-traced object index -> f32 (for ``hit_obj`` compares)."""
    return (jnp.float32(off + j) if isinstance(j, int)
            else (off + j).astype(jnp.float32))


def _fold_spheres(ns, body, carry):
    """Fold ``body(j, carry) -> carry`` over the sphere axis: Python-unrolled for
    small scenes (module-local limit — tests force-unroll by patching it),
    chunk-unrolled ``fori_loop`` (dynamic SMEM reads, f32 index compares,
    dynamic SMEM gradient stores) for large ones."""
    if ns <= _UNROLL_LIMIT:
        for j in range(ns):
            carry = body(j, carry)
        return carry
    return _fold_objects(ns, body, carry)


def _attr_planes(npl, pln, ns, hit_obj, carry):
    """Plane half of the hit-attribute accumulation (rolled-capable)."""
    def _attr_pln(j, carry):
        ar, ag, ab, qx, qy, qz, is_pl = carry
        m = (hit_obj == _jf32(j, ns)).astype(jnp.float32)
        ar += m * pln[6, j]
        ag += m * pln[7, j]
        ab += m * pln[8, j]
        qx += m * pln[3, j]
        qy += m * pln[4, j]
        qz += m * pln[5, j]
        is_pl += m
        return ar, ag, ab, qx, qy, qz, is_pl
    return _fold_objects(npl, _attr_pln, carry)


def _fold_spheres_culled(ns, body, carry, cull):
    """Fold ``body(j, carry, ok) -> carry`` over the PRIMARY trace's spheres,
    restricted to this tile's compact visible list when ``cull`` is present.

    Exactness (same cone as the forward kernel, ``_tile_visibility``): a culled
    sphere provably misses every primary ray of the tile, so it can never win
    the closest hit, never match ``hit_obj``, and therefore every masked adjoint
    it would accumulate is identically zero — the fold itself is bit-exact
    (asserted at the jnp level by
    ``tests/test_pallas_bwd.py::test_bwd_cull_fold_bitexact_jnp``, including
    the shared-AA pad rows, whose rays CAN hit culled spheres but carry zero
    cotangent). Whole-KERNEL cull-vs-nocull comparisons are tolerance-only:
    the two program variants compile with different fusion/reduction
    association, which was measured to move camera/light slot totals by ~1
    ULP even though every per-chain value is bit-identical. Bounce-level
    sweeps must stay full (reflected origins/directions scatter out of the
    cone), as must shadow-occlusion folds (shadow rays start at hit points).

    The sweep itself is ``render_pallas._culled_sphere_fold`` — the SAME code
    object the forward closest-hit uses (sentinel count -1 -> identity full
    sweep, in-range guard ``ok`` that the body must honor), so forward and
    backward sweep semantics cannot drift apart.
    """
    if cull is None:
        return _fold_spheres(ns, lambda j, c: body(j, c, None), carry)
    return _culled_sphere_fold(ns, body, carry, cull)


def _fwd_trace_res(params, sph, ns, pln, npl, lts, nl, o, d, *, compat, shape,
                   cheap_shadow=True, cull=None, sh_lists=None, pre=None,
                   grp=None, grp_refs=None):
    """Forward trace storing every residual the reverse sweep needs.

    ``cull`` (primary trace only): per-tile compact visible-sphere list for the
    closest-hit and hit-attribute folds — see :func:`_fold_spheres_culled`.
    ``sh_lists = (idx_ref, cnt_ref, row_base, K, nl)`` (primary trace only)
    routes the shadow-occlusion sphere folds through the two-pass
    per-(tile, light) occluder lists (render_pallas._shadow_visibility_lists,
    built here in ORIGINAL index order — no sorted table in the backward).
    Exact: occlusion is an order-free max of per-sphere indicators computed
    with the same arithmetic as the full fold, and a listed-out sphere
    provably misses every level-0 shadow ray of the tile (the prepass AABB
    bounds this kernel's own biased hit points bit-exactly). Bounce-level
    occlusion always sweeps all spheres (shadow rays scatter).

    ``pre = dict(t=..., hit_obj=..., attr=(ar, ag, ab, qx, qy, qz),
    occs=[...])`` replays residuals this trace already computed earlier in
    the same kernel (the fused-AA training step's phase A): the closest-hit
    sweep, the plane closest-hit loop, the hit-ATTRIBUTE fold (albedo +
    center/normal come from the ``attr`` slabs; ``is_pl`` reduces to
    ``hit_obj >= ns``), and the shadow-occlusion sweep — all per-object work
    — are skipped, and the trace reduces to elementwise shading
    recomputation. ``sh_lists``/``cull`` are unused under ``pre``.

    ``grp``/``grp_refs`` (BOUNCE traces on rolled scenes): the closest-hit,
    hit-attribute, and shadow-occlusion sphere folds run Morton-grouped with
    runtime whole-group skips (render_pallas._grouped_sphere_fold /
    _any_hit_multi_grouped — same conservative ball/entry/saturation prunes
    as the forward kernel, so masks and sums are bit-identical to the full
    folds). ``grp_refs``: >= 8 scratch refs sliced to ``shape``.
    """
    ox, oy, oz = o
    dx, dy, dz = d
    amb = params[_P_AMB]
    lamb = params[_P_LAMB]

    zeros = jnp.zeros(shape, jnp.float32)
    a = dx * dx + dy * dy + dz * dz
    if pre is not None:
        t, hit_obj = pre["t"], pre["hit_obj"]
    else:
        # compat far clip enforced by the strict winner test via t-init at FAR
        # (reference trace.py:17,26) — no per-object compare.
        t = jnp.full(shape, FAR if compat else BIG, jnp.float32)
        hit_obj = jnp.full(shape, -1.0, jnp.float32)  # index into [spheres++planes]
        # Hoisted like the forward kernel's _closest_hit (render_pallas.py) — and
        # the `* inv2a` form must MATCH it bit-for-bit: the two-pass shadow-list
        # prepass bounds shadow-ray origins with _primary_geometry's hit points,
        # so this recompute has to land on the exact same roots (a near-tie winner
        # flip would move a biased origin by ~2*BIAS, within the list builder's
        # 1e-3 slack — but identical arithmetic removes the class entirely).
        inv2a = 1.0 / (2.0 * a)
        od = ox * dx + oy * dy + oz * dz
        oo = ox * ox + oy * oy + oz * oz

        # --- closest hit, tracking the winning object index -------------------
        def _ch_body(j, carry, ok=None):
            t, hit_obj = carry
            cx, cy, cz, r = sph[0, j], sph[1, j], sph[2, j], sph[3, j]
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
            if ok is not None:
                valid = valid & ok
            closer = valid & (t_j < t)
            t = jnp.where(closer, t_j, t)
            jf = jnp.float32(j) if isinstance(j, int) else j.astype(jnp.float32)
            hit_obj = jnp.where(closer, jf, hit_obj)
            return t, hit_obj
        if grp is not None and cull is None:
            # Bounce closest hit: Morton-grouped with the strict t-prune
            # (same fold + semantics as the forward kernel's grouped path).
            grp_refs[0][...] = t
            grp_refs[1][...] = hit_obj
            _grouped_sphere_fold(
                ns, _ch_body, grp_refs[0:2], grp,
                (ox, oy, oz, dx, dy, dz, a, od, oo, inv2a),
                t_prune_ref=grp_refs[0])
            t, hit_obj = grp_refs[0][...], grp_refs[1][...]
        else:
            t, hit_obj = _fold_spheres_culled(ns, _ch_body, (t, hit_obj),
                                              cull)
        def _ch_pln(j, carry):
            t, hit_obj = carry
            nx, ny, nz = pln[3, j], pln[4, j], pln[5, j]
            den = dx * nx + dy * ny + dz * nz
            den_safe = jnp.where(jnp.abs(den) > 1e-30, den, 1.0)
            num = ((pln[0, j] - ox) * nx + (pln[1, j] - oy) * ny +
                   (pln[2, j] - oz) * nz)
            t_j = num / den_safe
            eps = 1e-3 if compat else 1e-8
            valid = (jnp.abs(den) >= eps) & (t_j > 0.0)
            closer = valid & (t_j < t)
            t = jnp.where(closer, t_j, t)
            hit_obj = jnp.where(closer, _jf32(j, ns), hit_obj)
            return t, hit_obj
        t, hit_obj = _fold_objects(npl, _ch_pln, (t, hit_obj))

    alive = hit_obj >= 0.0
    ts = jnp.where(alive, t, 0.0)
    Px, Py, Pz = ox + ts * dx, oy + ts * dy, oz + ts * dz

    # --- hit attributes via masked accumulation -------------------------------
    ar = zeros
    ag = zeros
    ab = zeros
    qx, qy, qz = zeros, zeros, zeros  # sphere center or plane normal
    is_pl = zeros
    def _attr_body(j, carry, ok=None):
        ar, ag, ab, qx, qy, qz = carry
        jf = jnp.float32(j) if isinstance(j, int) else j.astype(jnp.float32)
        hit_j = (hit_obj == jf)
        if ok is not None:  # mask out-of-range cull slots (they re-read index 0)
            hit_j = hit_j & ok
        m = hit_j.astype(jnp.float32)
        ar += m * sph[4, j]
        ag += m * sph[5, j]
        ab += m * sph[6, j]
        qx += m * sph[0, j]
        qy += m * sph[1, j]
        qz += m * sph[2, j]
        return ar, ag, ab, qx, qy, qz
    if pre is not None and "attr" in pre:
        # Phase-C replay: attributes come from the phase-A slabs (bit-equal
        # by construction) and the plane flag reduces to the index test —
        # the whole attribute fold is skipped.
        ar, ag, ab, qx, qy, qz = pre["attr"]
        is_pl = (hit_obj >= jnp.float32(ns)).astype(jnp.float32)
    elif grp is not None and cull is None:
        # Grouped attr fold: keep condition entry <= t (non-strict — the
        # winning member satisfies it; a skipped group provably holds no
        # lane's winner). Prune bound is ts: 0 on dead lanes, so their
        # groups all skip — nothing accumulates there anyway.
        g_od = ox * dx + oy * dy + oz * dz
        g_oo = ox * ox + oy * oy + oz * oz
        g_inv2a = 1.0 / (2.0 * a)
        for r_, v_ in zip(grp_refs[0:6], (ar, ag, ab, qx, qy, qz)):
            r_[...] = v_
        grp_refs[6][...] = ts
        _grouped_sphere_fold(ns, _attr_body, grp_refs[0:6], grp,
                             (ox, oy, oz, dx, dy, dz, a, g_od, g_oo, g_inv2a),
                             t_prune_ref=grp_refs[6], t_prune_strict=False)
        ar, ag, ab, qx, qy, qz = (r_[...] for r_ in grp_refs[0:6])
        ar, ag, ab, qx, qy, qz, is_pl = _attr_planes(
            npl, pln, ns, hit_obj, (ar, ag, ab, qx, qy, qz, is_pl))
    else:
        ar, ag, ab, qx, qy, qz = _fold_spheres_culled(
            ns, _attr_body, (ar, ag, ab, qx, qy, qz), cull)
        ar, ag, ab, qx, qy, qz, is_pl = _attr_planes(
            npl, pln, ns, hit_obj, (ar, ag, ab, qx, qy, qz, is_pl))

    plane_hit = is_pl > 0.5
    vx, vy, vz = Px - qx, Py - qy, Pz - qz
    # Guard: on plane-hit lanes q is a *normal* (P-q can vanish) and rsqrt(0)=inf
    # would turn the masked-out branch's zero cotangent into NaN in the reverse
    # sweep (inf * 0). Same double-where guard on every reciprocal norm.
    vv = vx * vx + vy * vy + vz * vz
    srn = jax.lax.rsqrt(jnp.where(plane_hit | (vv <= 1e-20), 1.0, vv))
    nx = jnp.where(plane_hit, qx, vx * srn)
    ny = jnp.where(plane_hit, qy, vy * srn)
    nz = jnp.where(plane_hit, qz, vz * srn)

    Pbx, Pby, Pbz = Px + BIAS * nx, Py + BIAS * ny, Pz + BIAS * nz

    # --- reflection direction (hoisted: clean-mode Phong needs L.R) -----------
    ddn = dx * nx + dy * ny + dz * nz
    wxr, wyr, wzr = dx - 2.0 * ddn * nx, dy - 2.0 * ddn * ny, dz - 2.0 * ddn * nz
    wwr = wxr * wxr + wyr * wyr + wzr * wzr
    rrn = jax.lax.rsqrt(jnp.where(wwr <= 1e-20, 1.0, wwr))
    Rx, Ry, Rz = wxr * rrn, wyr * rrn, wzr * rrn

    has_spec = (not compat) and nl > 0
    shin = params[_P_SHIN]
    spec_sum = zeros

    # --- lights: dirs, occlusion (no grad), lambert masks ---------------------
    # Origin-only terms (|Pb|^2, per-object o.c and |c|^2-r^2, per-plane
    # numerators) are hoisted ACROSS the light loop — same restructure as the
    # forward kernel's _any_hit_multi, so the recomputed occlusion masks match
    # the forward's bit-for-bit while the per-(light, object) work drops to the
    # direction-dependent part. No gradient flows through occlusion.
    dirs, lrns = [], []
    a_l, inv2a_l, inva_l, od_l = [], [], [], []
    for l in range(nl):
        wx, wy, wz = lts[0, l] - Pbx, lts[1, l] - Pby, lts[2, l] - Pbz
        ww = wx * wx + wy * wy + wz * wz
        lrn = jax.lax.rsqrt(jnp.where(ww <= 1e-20, 1.0, ww))
        Lx, Ly, Lz = wx * lrn, wy * lrn, wz * lrn
        dirs.append((Lx, Ly, Lz))
        lrns.append(lrn)
        # NOT `a` — that name is the PRIMARY ray's d.d, stored in res["a"] for
        # the implicit-function t-adjoints; rebinding it here would silently
        # feed the last light's |L|^2 into every t-gradient denominator
        # (~1 ULP today because both are unit-normalized, arbitrarily wrong
        # the moment either stops being).
        la = Lx * Lx + Ly * Ly + Lz * Lz
        a_l.append(la)
        inv2a_l.append(1.0 / (2.0 * la))
        inva_l.append(inv2a_l[-1] + inv2a_l[-1])
        od_l.append(Pbx * Lx + Pby * Ly + Pbz * Lz)
    oo = Pbx * Pbx + Pby * Pby + Pbz * Pbz
    occs = [jnp.zeros(shape, jnp.float32) for _ in range(nl)]
    if pre is not None:
        occs = list(pre["occs"])
    elif nl and grp is not None:
        # Grouped bounce shadow sweep — per-member arithmetic matches
        # _occ_body expression-for-expression and occlusion is an order-free
        # max, so the masks are bit-identical to the full fold's.
        occs = _any_hit_multi_grouped(sph, ns, pln, npl, Pbx, Pby, Pbz, dirs,
                                      grp, grp_refs, compat=compat,
                                      shape=shape, cheap=cheap_shadow)
    elif nl and sh_lists is not None:
        # Two-pass level-0 lists: THE SAME code object as the forward kernel's
        # listed sweep (list/sentinel sweep semantics must live once — the
        # _fold_spheres_culled rule). Its per-sphere arithmetic matches
        # _occ_body below expression-for-expression, so the accumulated occ
        # masks are bit-identical to the full sweep's; it also seeds plane
        # occlusion before the sphere folds, letting the early exit fire on
        # plane-shadowed tiles.
        occs = _any_hit_listed(sph, ns, pln, npl, Pbx, Pby, Pbz, dirs,
                               sh_lists, compat=compat, shape=shape,
                               cheap=cheap_shadow)
    elif nl:
        def _occ_body(j, occs):
            cx, cy, cz, r = sph[0, j], sph[1, j], sph[2, j], sph[3, j]
            oc = cx * Pbx + cy * Pby + cz * Pbz
            c = oo - 2.0 * oc + (cx * cx + cy * cy + cz * cz - r * r)
            out = []
            for l, (Lx, Ly, Lz) in enumerate(dirs):
                cd = cx * Lx + cy * Ly + cz * Lz
                if cheap_shadow:
                    valid = _sphere_occ_cheap(c, cd - od_l[l], a_l[l],
                                              inva_l[l], compat)
                    out.append(jnp.maximum(occs[l], valid.astype(jnp.float32)))
                    continue
                b = 2.0 * (od_l[l] - cd)
                disc = b * b - 4.0 * a_l[l] * c
                has = disc >= 0.0
                sq = jnp.sqrt(jnp.where(has, disc, 0.0))
                nn, nf = -b - sq, -b + sq
                t_j = jnp.where(nn > 0.0, nn, nf) * inv2a_l[l]
                valid = has & (nf > 0.0)  # far root >= near root always
                if compat:
                    valid &= t_j < FAR
                out.append(jnp.maximum(occs[l], valid.astype(jnp.float32)))
            return tuple(out)
        occs = list(_fold_spheres(ns, _occ_body, tuple(occs)))
        eps = 1e-3 if compat else 1e-8

        def _occ_pln(j, occs):
            pnx, pny, pnz = pln[3, j], pln[4, j], pln[5, j]
            num = ((pln[0, j] - Pbx) * pnx + (pln[1, j] - Pby) * pny +
                   (pln[2, j] - Pbz) * pnz)
            out = []
            for l, (Lx, Ly, Lz) in enumerate(dirs):
                den = Lx * pnx + Ly * pny + Lz * pnz
                den_safe = jnp.where(jnp.abs(den) > 1e-30, den, 1.0)
                t_j = num / den_safe
                valid = (jnp.abs(den) >= eps) & (t_j > 0.0)
                if compat:
                    valid &= t_j < FAR
                out.append(jnp.maximum(occs[l], valid.astype(jnp.float32)))
            return tuple(out)
        occs = list(_fold_objects(npl, _occ_pln, tuple(occs)))
    lam_sum = zeros
    light_res = []
    for l in range(nl):
        Lx, Ly, Lz = dirs[l]
        lrn = lrns[l]
        occ = occs[l]
        ldotn = Lx * nx + Ly * ny + Lz * nz
        m_l = ((occ < 0.5) & (ldotn > 0.0)).astype(jnp.float32)
        lam_sum = lam_sum + m_l * ldotn
        if has_spec:
            # Phong residuals: p = sdot**shin via masked exp/log (== forward
            # kernel and ops/shade.py — NaN-free at sdot == 0).
            sdot = Lx * Rx + Ly * Ry + Lz * Rz
            smask = (occ < 0.5) & (sdot > 0.0)
            s_safe = jnp.where(smask, sdot, 1.0)
            logs = jnp.log(s_safe)
            p_l = jnp.where(smask, jnp.exp(shin * logs), 0.0)
            spec_sum = spec_sum + p_l
            light_res.append((Lx, Ly, Lz, lrn, m_l, ldotn, s_safe, logs, p_l))
        else:
            light_res.append((Lx, Ly, Lz, lrn, m_l, ldotn, None, None, None))

    shade = amb + lamb * lam_sum
    alive_f = alive.astype(jnp.float32)
    if has_spec:
        spec_term = params[_P_SPEC] * spec_sum
        r_out = alive_f * (shade * ar + spec_term)
        g_out = alive_f * (shade * ag + spec_term)
        b_out = alive_f * (shade * ab + spec_term)
    else:
        r_out = alive_f * shade * ar
        g_out = alive_f * shade * ag
        b_out = alive_f * shade * ab

    o_next = (Pbx + BIAS * Rx, Pby + BIAS * Ry, Pbz + BIAS * Rz)

    res = dict(o=(ox, oy, oz), d=(dx, dy, dz), a=a, t=t, hit_obj=hit_obj,
               alive=alive, alive_f=alive_f, P=(Px, Py, Pz),
               q=(qx, qy, qz), plane_hit=plane_hit, v=(vx, vy, vz), srn=srn,
               n=(nx, ny, nz), Pb=(Pbx, Pby, Pbz), lights=light_res,
               lam_sum=lam_sum, albedo=(ar, ag, ab), shade=shade, ddn=ddn,
               w_refl=(wxr, wyr, wzr), rrn=rrn, R=(Rx, Ry, Rz),
               spec_sum=spec_sum, occs=occs)
    return (r_out, g_out, b_out), o_next, (Rx, Ry, Rz), alive, res


def _bwd_trace(params, sph, ns, pln, npl, lts, nl, res, gbar, obar_next,
               dbar_next, acc, acc_sph, acc_pln, *, compat, cull=None,
               grp=None, grp_refs=None):
    """Reverse sweep of one trace.

    ``gbar``: (gr, gg, gb) cotangent on this trace's rgb output.
    ``obar_next``/``dbar_next``: cotangents on the next-bounce origin and
    direction (zeros for the last trace). ``acc(slot, vec)`` accumulates the
    lane-sum of ``vec`` into flat-grad ``slot``. Returns (obar, dbar) for the
    previous bounce. ``cull`` (primary trace only) restricts the sphere adjoint
    fold to the tile's visible list — exact, see :func:`_fold_spheres_culled`.
    """
    amb = params[_P_AMB]
    lamb = params[_P_LAMB]
    gr, gg, gb = gbar
    ox, oy, oz = res["o"]
    dx, dy, dz = res["d"]
    Px, Py, Pz = res["P"]
    Pbx, Pby, Pbz = res["Pb"]
    nx, ny, nz = res["n"]
    ar, ag, ab = res["albedo"]
    alive_f = res["alive_f"]
    shade = res["shade"]
    hit_obj = res["hit_obj"]
    t = jnp.where(res["alive"], res["t"], 0.0)

    # rgb = alive * (shade * albedo + specular * spec_sum)
    gdota = gr * ar + gg * ag + gb * ab           # (g . A)
    shade_bar = alive_f * gdota
    abar = (alive_f * shade * gr, alive_f * shade * gg, alive_f * shade * gb)

    # materials
    acc("amb", shade_bar)
    acc("lamb", shade_bar * res["lam_sum"])
    lam_sum_bar = shade_bar * lamb

    has_spec = (not compat) and nl > 0
    if has_spec:
        specular = params[_P_SPEC]
        shin = params[_P_SHIN]
        gsum = gr + gg + gb     # white highlight adds to every channel
        spec_sum_bar = alive_f * specular * gsum
        acc("spec", alive_f * gsum * res["spec_sum"])
        shin_bar = jnp.zeros_like(gr)

    # reflection direction / next-bounce chain:
    #   o_next = Pb + BIAS*R ; d_next = R  (+ clean-mode Phong: L_l . R)
    onx, ony, onz = obar_next
    Rbar_x = BIAS * onx + dbar_next[0]
    Rbar_y = BIAS * ony + dbar_next[1]
    Rbar_z = BIAS * onz + dbar_next[2]
    Pb_bar_x, Pb_bar_y, Pb_bar_z = onx, ony, onz

    # lights first (they contribute to Rbar through the Phong term):
    # lam_sum = sum_l m_l (L_l . n); spec_sum = sum_l p_l; L = normalize(lpos - Pb)
    Rux, Ruy, Ruz = res["R"]
    light_nbar_x = jnp.zeros_like(gr)
    light_nbar_y = jnp.zeros_like(gr)
    light_nbar_z = jnp.zeros_like(gr)
    for l in range(nl):
        Lx, Ly, Lz, lrn, m_l, ldotn, s_safe, logs, p_l = res["lights"][l]
        chi = lam_sum_bar * m_l
        Lbar_x, Lbar_y, Lbar_z = chi * nx, chi * ny, chi * nz
        light_nbar_x += chi * Lx
        light_nbar_y += chi * Ly
        light_nbar_z += chi * Lz
        if has_spec:
            # p = sdot**shin (masked); dp/dsdot = shin * p / sdot, 0 off-mask
            # (p_l is already 0 there and s_safe is 1).
            sdot_bar = spec_sum_bar * shin * p_l / s_safe
            Lbar_x += sdot_bar * Rux
            Lbar_y += sdot_bar * Ruy
            Lbar_z += sdot_bar * Ruz
            Rbar_x += sdot_bar * Lx
            Rbar_y += sdot_bar * Ly
            Rbar_z += sdot_bar * Lz
            shin_bar += spec_sum_bar * p_l * logs
        vbx, vby, vbz = _norm_adj((Lx, Ly, Lz), lrn,
                                  (Lbar_x, Lbar_y, Lbar_z))
        acc(("light", l, 0), vbx)
        acc(("light", l, 1), vby)
        acc(("light", l, 2), vbz)
        Pb_bar_x -= vbx
        Pb_bar_y -= vby
        Pb_bar_z -= vbz
    if has_spec:
        acc("shin", shin_bar)

    # R = normalize(w), w = d - 2 (d.n) n
    wbx, wby, wbz = _norm_adj(res["R"], res["rrn"], (Rbar_x, Rbar_y, Rbar_z))
    ndotwb = nx * wbx + ny * wby + nz * wbz
    ddn = res["ddn"]
    dbar_x = wbx - 2.0 * ndotwb * nx
    dbar_y = wby - 2.0 * ndotwb * ny
    dbar_z = wbz - 2.0 * ndotwb * nz
    nbar_x = -2.0 * (ndotwb * dx + ddn * wbx) + light_nbar_x
    nbar_y = -2.0 * (ndotwb * dy + ddn * wby) + light_nbar_y
    nbar_z = -2.0 * (ndotwb * dz + ddn * wbz) + light_nbar_z

    # Pb = P + BIAS*n
    P_bar_x, P_bar_y, P_bar_z = Pb_bar_x, Pb_bar_y, Pb_bar_z
    nbar_x += BIAS * Pb_bar_x
    nbar_y += BIAS * Pb_bar_y
    nbar_z += BIAS * Pb_bar_z

    # normal: sphere n = normalize(P - c); plane n = q (parameter directly)
    plane_hit = res["plane_hit"]
    ph = plane_hit.astype(jnp.float32)
    sp = alive_f * (1.0 - ph)
    plm = alive_f * ph
    vbx, vby, vbz = _norm_adj((jnp.where(plane_hit, 0.0, nx),
                               jnp.where(plane_hit, 0.0, ny),
                               jnp.where(plane_hit, 0.0, nz)), res["srn"],
                              (nbar_x * sp, nbar_y * sp, nbar_z * sp))
    P_bar_x += vbx
    P_bar_y += vby
    P_bar_z += vbz
    # sphere-center part of the normal: c appears as P - c
    cbar_n = (-vbx, -vby, -vbz)
    # plane-normal parameter cotangent
    pn_bar = (nbar_x * plm, nbar_y * plm, nbar_z * plm)

    # P = o + t d
    obar_x, obar_y, obar_z = P_bar_x, P_bar_y, P_bar_z
    tbar = P_bar_x * dx + P_bar_y * dy + P_bar_z * dz
    dbar_x += t * P_bar_x
    dbar_y += t * P_bar_y
    dbar_z += t * P_bar_z

    # t adjoints via implicit function theorem, masked per winning object.
    a = res["a"]
    od = ox * dx + oy * dy + oz * dz
    oo = ox * ox + oy * oy + oz * oz

    def _sph_bwd(j, carry, ok=None):
        obar_x, obar_y, obar_z, dbar_x, dbar_y, dbar_z = carry
        jf = jnp.float32(j) if isinstance(j, int) else j.astype(jnp.float32)
        hit_j = (hit_obj == jf) & res["alive"]
        if ok is not None:  # mask out-of-range cull slots (they re-read index 0)
            hit_j = hit_j & ok
        m = hit_j.astype(jnp.float32)
        mt = m * tbar
        cx, cy, cz, r = sph[0, j], sph[1, j], sph[2, j], sph[3, j]
        b = 2.0 * (od - (cx * dx + cy * dy + cz * dz))
        den = 2.0 * a * t + b
        inv_den = jnp.where(jnp.abs(den) > _DEN_EPS, 1.0 / den, 0.0)
        # dt = -(t^2 da + t db + dc) / den
        abar_q = -mt * t * t * inv_den
        bbar = -mt * t * inv_den
        cbar = -mt * inv_den
        # a = d.d
        dbar_x += 2.0 * dx * abar_q
        dbar_y += 2.0 * dy * abar_q
        dbar_z += 2.0 * dz * abar_q
        # b = 2 (o - c).d
        obar_x += 2.0 * dx * bbar
        obar_y += 2.0 * dy * bbar
        obar_z += 2.0 * dz * bbar
        dbar_x += 2.0 * (ox - cx) * bbar
        dbar_y += 2.0 * (oy - cy) * bbar
        dbar_z += 2.0 * (oz - cz) * bbar
        ccx = -2.0 * dx * bbar
        ccy = -2.0 * dy * bbar
        ccz = -2.0 * dz * bbar
        # c = |o - c|^2 - r^2
        obar_x += 2.0 * (ox - cx) * cbar
        obar_y += 2.0 * (oy - cy) * cbar
        obar_z += 2.0 * (oz - cz) * cbar
        ccx += -2.0 * (ox - cx) * cbar
        ccy += -2.0 * (oy - cy) * cbar
        ccz += -2.0 * (oz - cz) * cbar
        rbar = -2.0 * r * cbar
        # center also appears in the normal (masked by hit == j)
        acc_sph(j, 0, ccx + m * cbar_n[0])
        acc_sph(j, 1, ccy + m * cbar_n[1])
        acc_sph(j, 2, ccz + m * cbar_n[2])
        acc_sph(j, 3, rbar)
        acc_sph(j, 4, m * abar[0])
        acc_sph(j, 5, m * abar[1])
        acc_sph(j, 6, m * abar[2])
        return obar_x, obar_y, obar_z, dbar_x, dbar_y, dbar_z

    if grp is not None and cull is None:
        # Grouped adjoint fold (bounce traces): every term _sph_bwd
        # accumulates is masked by ``hit_obj == j [& alive]``, so a group
        # containing no lane's winner contributes exact zeros — skip it by
        # the same ball test with the non-strict entry <= t keep condition
        # (t is 0 on dead lanes: their groups all skip, correctly).
        g_inv2a = 1.0 / (2.0 * a)
        for r_, v_ in zip(grp_refs[0:6], (obar_x, obar_y, obar_z,
                                          dbar_x, dbar_y, dbar_z)):
            r_[...] = v_
        grp_refs[6][...] = t
        _grouped_sphere_fold(ns, _sph_bwd, grp_refs[0:6], grp,
                             (ox, oy, oz, dx, dy, dz, a, od, oo, g_inv2a),
                             t_prune_ref=grp_refs[6], t_prune_strict=False)
        obar_x, obar_y, obar_z, dbar_x, dbar_y, dbar_z = \
            (r_[...] for r_ in grp_refs[0:6])
    else:
        obar_x, obar_y, obar_z, dbar_x, dbar_y, dbar_z = _fold_spheres_culled(
            ns, _sph_bwd, (obar_x, obar_y, obar_z, dbar_x, dbar_y, dbar_z),
            cull)
    def _pln_bwd(j, carry):
        obar_x, obar_y, obar_z, dbar_x, dbar_y, dbar_z = carry
        m = ((hit_obj == _jf32(j, ns)) & res["alive"]).astype(jnp.float32)
        mt = m * tbar
        pnx, pny, pnz = pln[3, j], pln[4, j], pln[5, j]
        den = dx * pnx + dy * pny + dz * pnz
        inv_den = jnp.where(jnp.abs(den) > _DEN_EPS, 1.0 / den, 0.0)
        # t = num / den, num = n.(p0 - o)
        num_bar = mt * inv_den
        den_bar = -mt * t * inv_den
        p0x, p0y, p0z = pln[0, j], pln[1, j], pln[2, j]
        acc_pln(j, 0, pnx * num_bar)
        acc_pln(j, 1, pny * num_bar)
        acc_pln(j, 2, pnz * num_bar)
        obar_x -= pnx * num_bar
        obar_y -= pny * num_bar
        obar_z -= pnz * num_bar
        nb_x = (p0x - ox) * num_bar + dx * den_bar + m * pn_bar[0]
        nb_y = (p0y - oy) * num_bar + dy * den_bar + m * pn_bar[1]
        nb_z = (p0z - oz) * num_bar + dz * den_bar + m * pn_bar[2]
        acc_pln(j, 3, nb_x)
        acc_pln(j, 4, nb_y)
        acc_pln(j, 5, nb_z)
        dbar_x += pnx * den_bar
        dbar_y += pny * den_bar
        dbar_z += pnz * den_bar
        acc_pln(j, 6, m * abar[0])
        acc_pln(j, 7, m * abar[1])
        acc_pln(j, 8, m * abar[2])
        return obar_x, obar_y, obar_z, dbar_x, dbar_y, dbar_z

    obar_x, obar_y, obar_z, dbar_x, dbar_y, dbar_z = _fold_objects(
        npl, _pln_bwd, (obar_x, obar_y, obar_z, dbar_x, dbar_y, dbar_z))

    return (obar_x, obar_y, obar_z), (dbar_x, dbar_y, dbar_z)


def grad_layout(ns, npl, nl):
    """Slot index map for the flat gradient vector."""
    slots = {}
    k = 0
    for j in range(ns):
        for c in range(7):
            slots[("sph", j, c)] = k
            k += 1
    for j in range(npl):
        for c in range(9):
            slots[("pln", j, c)] = k
            k += 1
    for l in range(nl):
        for c in range(3):
            slots[("light", l, c)] = k
            k += 1
    slots["amb"] = k
    slots["lamb"] = k + 1
    slots["refl"] = k + 2
    slots["spec"] = k + 3
    slots["shin"] = k + 4
    k += 5
    for c in range(3):
        slots[("cam_pos", c)] = k
        k += 1
    for r in range(3):
        for c in range(3):
            slots[("rot", r, c)] = k
            k += 1
    slots["fov"] = k
    return slots, k + 1


def _make_bwd_kernel(*, W, H, U, V, TW, TH, depth, ns, npl, nl, compat,
                     swap_xy=False, aliasing=False, aa_share=False,
                     cheap_shadow=True, culled=False, vis_k=0,
                     shadow_listed=False, sh_k=0, fused_loss=False,
                     grouped=False, n_groups=0):
    # W, H: full-image extent (AA border semantics are global). U, V: the
    # local swap-resolved grid extent — W of this shard's slice, not the
    # image, when rendering a vertical slice (ray-DP sharding).
    shape = (TW, TH)
    shape_w = (TW + 8, TH)   # +1 logical shared-sample row, padded to sublanes
    slots, n_grads = grad_layout(ns, npl, nl)
    fused_aa = fused_loss and aliasing
    if fused_loss:
        # Fully-fused training step: the image block input is the TARGET, the
        # kernel forms the MSE cotangent from its own recomputed forward chain
        # and accumulates the loss partial sum((out-target)^2)/denom into one
        # extra slot. The AA layout needs the 9-sample average before any
        # cotangent exists, so the fused-AA form runs three phases per tile:
        # (A) the six shared-sample chains forward, storing compact per-bounce
        # residuals (raw t, hit_obj, occlusion masks — the outputs of every
        # per-OBJECT sweep) into VMEM scratch while accumulating the stored
        # tile combine; (B) loss/cotangent from the combine vs the target
        # block; (C) the six reverse chains, replaying the stored residuals so
        # the recompute is elementwise shading only. Keeping full residuals of
        # all six chains live instead would spill scoped VMEM (the reason
        # aa_share needs TW=24 already); t/hit_obj/occ per bounce is the
        # minimal set that removes all per-object forward work from phase C.
        assert not aliasing or aa_share, "fused AA requires the shared layout"
        slots = dict(slots, loss=n_grads)
        n_grads += 1
    per_sample = aliasing and not aa_share
    # Phase-A residual kinds: t, hit_obj, [attr (ar, ag, ab, qx, qy, qz)],
    # occ[l]. The attr slabs buy phase C out of the hit-attribute fold — a
    # win only when that fold is expensive (rolled scenes): at demo scale
    # (ns=6) the 6 extra slab round-trips per (chain, bounce) measured
    # SLOWER than the near-free unrolled fold (17.9 -> 19.4 ms @1080p), at
    # ns > _UNROLL_LIMIT the fold is a chunk-rolled sweep and the slabs win
    # (RT_AA_ATTR_SLABS=0 disables, for A/B measurement only).
    attr_slabs = ns > _UNROLL_LIMIT and _ATTR_SLABS
    n_kinds = (8 if attr_slabs else 2) + nl
    inv_denom = 1.0 / float(W * H * 3)   # GLOBAL mean denominator (slices sum)

    def kernel(params, sph, pln, lts, *rest):
        rest = list(rest)
        vis_cnt = (rest.pop(0), rest.pop(0)) if culled else None
        sh_tabs = (rest.pop(0), rest.pop(0)) if shadow_listed else None
        grp_tabs = (rest.pop(0), rest.pop(0)) if grouped else None
        gstate_ref = rest.pop() if grouped else None  # trailing VMEM scratch
        res_ref = rest.pop() if fused_aa else None
        g_ref, out_ref = rest
        grp = (grp_tabs[0], grp_tabs[1], n_groups) if grouped else None

        def grefs_for(shp):
            if not grouped:
                return None
            return [gstate_ref.at[i, 0:shp[0], 0:shp[1]] for i in range(8)]

        def rres(chain_id, bounce, kind, shp):
            """Phase-A residual slab view for (chain, bounce, kind), sliced to
            the chain's shape (slabs are allocated at the widest chain)."""
            k = (chain_id * (depth + 1) + bounce) * n_kinds + kind
            return res_ref.at[k, 0:shp[0], 0:shp[1]]
        i = pl.program_id(0)
        j = pl.program_id(1)
        smp = pl.program_id(2) if per_sample else 0
        tile_id = i * pl.num_programs(1) + j
        # Level-0 cone cull (same table semantics as the forward kernel):
        # applied to the primary trace's closest-hit/attr/adjoint folds only.
        cull = (vis_cnt[0], vis_cnt[1], tile_id, vis_k) if culled else None
        # Level-0 two-pass shadow lists (original index order, 1 level —
        # row_base is just the tile id; see _fwd_trace_res).
        sh_lists = ((sh_tabs[0], sh_tabs[1], tile_id, sh_k, nl)
                    if shadow_listed else None)

        first = (i == 0) & (j == 0)
        if per_sample:
            first = first & (smp == 0)

        @pl.when(first)
        def _zero():
            if n_grads <= 64:
                for k in range(n_grads):
                    out_ref[k] = jnp.float32(0.0)
            else:
                def zbody(k, _):
                    out_ref[k] = jnp.float32(0.0)
                    return 0
                jax.lax.fori_loop(0, n_grads, zbody, 0)

        # Lane partials are accumulated per (slot, chain-shape): the shared-AA
        # path runs chains of two shapes, which cannot share one running vector.
        acc_vals = {}

        def acc(slot, vec):
            key = (slots[slot], vec.shape)
            acc_vals[key] = acc_vals.get(key, 0.0) + vec

        if ns <= _UNROLL_LIMIT:
            def acc_sph(j, c, vec):
                acc(("sph", j, c), vec)
        else:
            # Rolled scenes: per-object slots are dynamic — reduce to a scalar
            # and accumulate straight into the SMEM output at a traced index.
            def acc_sph(j, c, vec):
                out_ref[j * 7 + c] += _vsum(vec)

        if npl <= _UNROLL_LIMIT:
            def acc_pln(j, c, vec):
                acc(("pln", j, c), vec)
        else:
            # Rolled planes (same machinery as rolled spheres; plane slots
            # start right after the sphere block — grad_layout order).
            def acc_pln(j, c, vec):
                out_ref[7 * ns + j * 9 + c] += _vsum(vec)

        fu_l = (i * TW).astype(jnp.float32)
        fv_l = (j * TH).astype(jnp.float32)
        iota_u = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32)
        iota_v = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
        # Pad-lane mask in LOCAL grid coordinates: with a slice offset the
        # global coordinate is x_offset + local, so a global-W test would let
        # a middle shard's pad lanes through.
        inb = ((fu_l + iota_u) < U) & ((fv_l + iota_v) < V)
        fu = fu_l + params[_P_X0] if not swap_xy else fu_l
        fv = fv_l + params[_P_X0] if swap_xy else fv_l
        su = fu + iota_u
        sv = fv + iota_v
        gx, gy = (su, sv) if not swap_xy else (sv, su)

        R = params
        refl = params[_P_REFL]

        def raygen(px, py, shp):
            pcx = params[_P_FOCAL]
            pcy = params[_P_Y0] + px * params[_P_DY]
            pcz = params[_P_Z0] + py * params[_P_DZ]
            dx = R[_P_ROT + 0] * pcx + R[_P_ROT + 1] * pcy + R[_P_ROT + 2] * pcz
            dy = R[_P_ROT + 3] * pcx + R[_P_ROT + 4] * pcy + R[_P_ROT + 5] * pcz
            dz = R[_P_ROT + 6] * pcx + R[_P_ROT + 7] * pcy + R[_P_ROT + 8] * pcz
            dn = _rnorm(dx, dy, dz)
            d0 = (dx * dn, dy * dn, dz * dn)
            o0 = (jnp.full(shp, params[_P_ORIGIN + 0], jnp.float32),
                  jnp.full(shp, params[_P_ORIGIN + 1], jnp.float32),
                  jnp.full(shp, params[_P_ORIGIN + 2], jnp.float32))
            return o0, d0, dn, (pcx, pcy, pcz)

        def fwd_chain_store(px, py, shp, chain_id):
            """Fused-AA phase A: one chain's forward combine, storing the raw
            closest-hit/occlusion residuals per bounce so phase C's reverse
            replay (``pre``) skips every per-object sweep. Everything except
            (t, hit_obj, occs, rgb) is dead here and compiled away."""
            o_cur, d_cur, _, _ = raygen(px, py, shp)
            gr_v = grefs_for(shp)
            aliveprod = jnp.ones(shp, jnp.float32)
            weight = jnp.ones(shp, jnp.float32)
            out = [jnp.zeros(shp, jnp.float32) for _ in range(3)]
            for bounce in range(depth + 1):
                rgb, o_next, d_next, alive, res = _fwd_trace_res(
                    params, sph, ns, pln, npl, lts, nl, o_cur, d_cur,
                    compat=compat, shape=shp, cheap_shadow=cheap_shadow,
                    cull=cull if bounce == 0 else None,
                    sh_lists=sh_lists if bounce == 0 else None,
                    grp=grp if bounce > 0 else None, grp_refs=gr_v)
                rres(chain_id, bounce, 0, shp)[...] = res["t"]
                rres(chain_id, bounce, 1, shp)[...] = res["hit_obj"]
                occ0 = 2
                if attr_slabs:
                    for k_, v_ in enumerate(res["albedo"] + res["q"]):
                        rres(chain_id, bounce, 2 + k_, shp)[...] = v_
                    occ0 = 8
                for l in range(nl):
                    rres(chain_id, bounce, occ0 + l, shp)[...] = res["occs"][l]
                for c in range(3):
                    out[c] = out[c] + weight * rgb[c]
                aliveprod = aliveprod * res["alive_f"]
                weight = aliveprod * (refl ** (bounce + 1))
                o_cur, d_cur = o_next, d_next
            return out

        def run_chain(px, py, gimg, shp, target=None, chain_id=0,
                      replay=False):
            """Recompute the forward bounce chain at fractional pixel coords
            (px, py), then reverse-sweep it against the cotangent ``gimg`` —
            or, with ``target`` (fused_loss mode), against the MSE cotangent
            formed in-kernel from the chain's own forward combine. With
            ``replay`` (fused-AA phase C) the per-object sweep results come
            from the phase-A scratch slabs instead of being recomputed."""
            # --- forward chain with residuals ---------------------------------
            o0, d0, dn, pc = raygen(px, py, shp)
            pcx, pcy, pcz = pc
            gr_v = grefs_for(shp)

            traces = []
            o_cur, d_cur = o0, d0
            aliveprod = jnp.ones(shp, jnp.float32)  # prod of alive before i
            weight = jnp.ones(shp, jnp.float32)
            for bounce in range(depth + 1):
                pre = None
                if replay:
                    occ0 = 8 if attr_slabs else 2
                    pre = dict(
                        t=rres(chain_id, bounce, 0, shp)[...],
                        hit_obj=rres(chain_id, bounce, 1, shp)[...],
                        occs=[rres(chain_id, bounce, occ0 + l, shp)[...]
                              for l in range(nl)])
                    if attr_slabs:
                        pre["attr"] = tuple(
                            rres(chain_id, bounce, 2 + k_, shp)[...]
                            for k_ in range(6))
                rgb, o_next, d_next, alive, res = _fwd_trace_res(
                    params, sph, ns, pln, npl, lts, nl, o_cur, d_cur,
                    compat=compat, shape=shp, cheap_shadow=cheap_shadow,
                    cull=cull if bounce == 0 else None,
                    sh_lists=(sh_lists if bounce == 0 and pre is None
                              else None), pre=pre,
                    grp=grp if bounce > 0 else None, grp_refs=gr_v)
                traces.append(dict(rgb=rgb, res=res, weight=weight,
                                   aliveprod=aliveprod, bounce=bounce))
                aliveprod = aliveprod * res["alive_f"]
                weight = aliveprod * (refl ** (bounce + 1))
                o_cur, d_cur = o_next, d_next

            if target is not None:
                # Fused MSE: combine the chain into the stored-layout image
                # (compat stores (r, b, g) — the forward kernel's store swap),
                # diff against the target block, accumulate the loss partial,
                # and form the cotangent. Pad lanes (inb) contribute nothing.
                # The combine matches the forward kernel's sample() up to f32
                # association (shade*albedo factoring — ULP class).
                out_rgb = [jnp.zeros(shp, jnp.float32) for _ in range(3)]
                for tr in traces:
                    for c in range(3):
                        out_rgb[c] = out_rgb[c] + tr["weight"] * tr["rgb"][c]
                stored = ((out_rgb[0], out_rgb[2], out_rgb[1]) if compat
                          else tuple(out_rgb))
                d = [jnp.where(inb, stored[c] - target[c], 0.0)
                     for c in range(3)]
                acc("loss", (d[0] * d[0] + d[1] * d[1] + d[2] * d[2])
                    * jnp.float32(inv_denom))
                g_st = [jnp.float32(2.0 * inv_denom) * dc for dc in d]
                gr_img, gg_img, gb_img = ((g_st[0], g_st[2], g_st[1])
                                          if compat else tuple(g_st))
            else:
                gr_img, gg_img, gb_img = gimg

            # reflection-coefficient adjoint: w_i = refl^i * aliveprod_i
            refl_bar = jnp.zeros(shp, jnp.float32)
            for tr in traces[1:]:
                i_b = tr["bounce"]
                gdotrgb = (gr_img * tr["rgb"][0] + gg_img * tr["rgb"][1] +
                           gb_img * tr["rgb"][2])
                # d(refl^i)/drefl = i * refl^(i-1)
                refl_bar += (i_b * (refl ** (i_b - 1))) * tr["aliveprod"] * gdotrgb
            acc("refl", refl_bar)

            # --- reverse sweep over the bounce chain --------------------------
            zero3 = (jnp.zeros(shp, jnp.float32),) * 3
            obar, dbar = zero3, zero3
            for tr in reversed(traces):
                w = tr["weight"]
                gbar = (w * gr_img, w * gg_img, w * gb_img)
                obar, dbar = _bwd_trace(params, sph, ns, pln, npl, lts, nl,
                                        tr["res"], gbar, obar, dbar, acc,
                                        acc_sph, acc_pln, compat=compat,
                                        cull=cull if tr["bounce"] == 0 else None,
                                        grp=grp if tr["bounce"] > 0 else None,
                                        grp_refs=gr_v)
            # --- camera adjoints from the primary trace's (obar, dbar) --------
            # position: origin is broadcast, so its cotangent is the lane sum.
            acc(("cam_pos", 0), obar[0])
            acc(("cam_pos", 1), obar[1])
            acc(("cam_pos", 2), obar[2])
            # direction: d = normalize(R @ p), p = (focal, y0+px*dy, z0+py*dz).
            ubx, uby, ubz = _norm_adj(d0, dn, dbar)
            pvec = (jnp.full(shp, pcx, jnp.float32), pcy, pcz)
            for rr, ub in enumerate((ubx, uby, ubz)):
                for cc in range(3):
                    acc(("rot", rr, cc), ub * pvec[cc])
            # focal feeds p[0]; fov via focal = cot(fov_rad/2):
            #   dfocal/dfov = -(1 + focal^2) * pi/360.
            focal_bar = (R[_P_ROT + 0] * ubx + R[_P_ROT + 3] * uby +
                         R[_P_ROT + 6] * ubz)
            dfdf = -(1.0 + pcx * pcx) * jnp.float32(3.14159265358979 / 360.0)
            acc("fov", focal_bar * dfdf)

        # --- incoming cotangent ----------------------------------------------
        # ``inb`` (computed above in local coordinates) masks lanes beyond the
        # true slice extent: partial tiles are padded and the pad region of the
        # cotangent block is uninitialized memory — it would otherwise flow
        # into the scalar reductions.
        # where-select, not multiply: pad memory can hold NaN/inf on hardware
        # and NaN * 0 == NaN. (The fused_loss path masks inside run_chain
        # instead — its g_ref block is the raw target.)
        if not fused_loss:
            g0 = jnp.where(inb, g_ref[0], 0.0)
            g1 = jnp.where(inb, g_ref[1], 0.0)
            g2 = jnp.where(inb, g_ref[2], 0.0)

        if fused_loss and not aliasing:
            # g_ref holds the TARGET block (stored layout); the cotangent is
            # formed in-kernel. Pad memory is masked inside run_chain.
            run_chain(gx, gy, None, shape,
                      target=(g_ref[0], g_ref[1], g_ref[2]))
        elif not aliasing:
            if compat:
                gimg = (g0, g2, g1)  # out = (r, b, g) store swap
            else:
                gimg = (g0, g1, g2)
            run_chain(gx, gy, gimg, shape)
        elif per_sample:
            # AA combine adjoint: interior pixels average 9 samples (1/9 each);
            # border pixels take only the center sample. Under compat, the
            # primary sample's channels land store-swapped while neighbor
            # samples land unswapped (see ops/render.py docstring).
            interior = ((gx >= 1.0) & (gx <= W - 2) & (gy >= 1.0) &
                        (gy <= H - 2))
            inv9 = jnp.float32(1.0 / 9.0)
            is_primary = smp == 0
            w_int = jnp.where(interior, inv9, jnp.where(is_primary, 1.0, 0.0))
            if compat:
                # primary: (r,b,g) mapping; neighbors: (r,g,b) mapping
                gimg = (g0 * w_int,
                        jnp.where(is_primary, g2, g1) * w_int,
                        jnp.where(is_primary, g1, g2) * w_int)
            else:
                gimg = (g0 * w_int, g1 * w_int, g2 * w_int)
            px = gx + params[_P_OFFS + 2 * smp]
            py = gy + params[_P_OFFS + 2 * smp + 1]
            run_chain(px, py, gimg, shape)
        else:
            # Shared-sample AA (mirrors _make_kernel_aa_shared): 6 chains replace
            # 9 per-pixel samples. A shared half-offset sample's cotangent is the
            # sum of its two adjacent pixels' neighbor weights; boundary samples
            # recomputed by the adjacent tile receive that tile's share there.
            interior = ((gx >= 1.0) & (gx <= W - 2) & (gy >= 1.0) &
                        (gy <= H - 2))
            inv9 = jnp.float32(1.0 / 9.0)
            suw = (fu - 0.5 + jax.lax.broadcasted_iota(
                jnp.int32, shape_w, 0).astype(jnp.float32))
            svw = fv + jax.lax.broadcasted_iota(
                jnp.int32, shape_w, 1).astype(jnp.float32)

            def chain(u, v, gimg, shp, chain_id=0, replay=False):
                px, py = (u, v) if not swap_xy else (v, u)
                run_chain(px, py, gimg, shp, chain_id=chain_id, replay=replay)

            if fused_aa:
                # Phase A: the six chains forward, residuals to scratch, AA
                # combine accumulated. Chain positions/shapes MUST match the
                # phase-C reverse calls below — the scratch slabs align by
                # (chain_id, bounce). The neighbor sum mirrors the forward
                # kernel's nsum (_make_kernel_aa_shared): a shared su-half
                # sample at row k feeds pixel k (-0.5 side) and k-1 (+0.5).
                def fchain(u, v, shp, chain_id):
                    px, py = (u, v) if not swap_xy else (v, u)
                    return fwd_chain_store(px, py, shp, chain_id)

                C = fchain(su, sv, shape, 0)
                UH = fchain(suw, svw, shape_w, 1)
                VL = fchain(su, sv - 0.5, shape, 2)
                VR = fchain(su, sv + 0.5, shape, 3)
                UVL = fchain(suw, svw - 0.5, shape_w, 4)
                UVR = fchain(suw, svw + 0.5, shape_w, 5)

                def nsum(c):
                    return (UH[c][0:TW] + UH[c][1:TW + 1] + VL[c] + VR[c] +
                            UVL[c][0:TW] + UVL[c][1:TW + 1] +
                            UVR[c][0:TW] + UVR[c][1:TW + 1])

                pr, pg, pb = C
                nr, ng, nb = nsum(0), nsum(1), nsum(2)
                # Stored layout == the forward kernel's store: compat swaps
                # G/B (accumulation swap composed with the store swap).
                if compat:
                    stored = (jnp.where(interior, (pr + nr) * inv9, pr),
                              jnp.where(interior, (pb + ng) * inv9, pb),
                              jnp.where(interior, (pg + nb) * inv9, pg))
                else:
                    stored = (jnp.where(interior, (pr + nr) * inv9, pr),
                              jnp.where(interior, (pg + ng) * inv9, pg),
                              jnp.where(interior, (pb + nb) * inv9, pb))
                # Phase B: loss partial + cotangent vs the target block
                # (g_ref). Pad lanes (inb) contribute nothing.
                dt = [jnp.where(inb, stored[c] - g_ref[c], 0.0)
                      for c in range(3)]
                acc("loss", (dt[0] * dt[0] + dt[1] * dt[1] + dt[2] * dt[2])
                    * jnp.float32(inv_denom))
                g0, g1, g2 = (jnp.float32(2.0 * inv_denom) * dc for dc in dt)

            w_nb = jnp.where(interior, inv9, 0.0)
            w_c = jnp.where(interior, inv9, 1.0)
            if compat:
                g_center = (g0 * w_c, g2 * w_c, g1 * w_c)
                gw = (g0 * w_nb, g1 * w_nb, g2 * w_nb)
            else:
                g_center = (g0 * w_c, g1 * w_c, g2 * w_c)
                gw = (g0 * w_nb, g1 * w_nb, g2 * w_nb)

            # shared-grid cotangent: sample k at su = fu - 0.5 + k feeds pixel
            # u = k (its -0.5 sample) and u = k-1 (its +0.5 sample).
            # (concatenate, not jnp.pad: lax.pad does not legalize in Mosaic)
            z1 = jnp.zeros((1, TH), jnp.float32)
            z7 = jnp.zeros((7, TH), jnp.float32)
            z8 = jnp.zeros((8, TH), jnp.float32)

            def shared_cot(c):
                return (jnp.concatenate([c, z8], axis=0) +
                        jnp.concatenate([z1, c, z7], axis=0))

            gsh = tuple(shared_cot(c) for c in gw)

            # Phase C (or, two-pass, the whole backward): reverse sweeps.
            chain(su, sv, g_center, shape, 0, fused_aa)    # centers
            chain(suw, svw, gsh, shape_w, 1, fused_aa)     # shared su-halves
            chain(su, sv - 0.5, gw, shape, 2, fused_aa)    # lane-halves
            chain(su, sv + 0.5, gw, shape, 3, fused_aa)
            chain(suw, svw - 0.5, gsh, shape_w, 4, fused_aa)  # shared corners
            chain(suw, svw + 0.5, gsh, shape_w, 5, fused_aa)

        # --- reduce lane partials into the flat SMEM accumulator --------------
        per_slot = {}
        for (k, _shp) in sorted(acc_vals, key=lambda t: (t[0], t[1])):
            per_slot.setdefault(k, []).append(_vsum(acc_vals[(k, _shp)]))
        for k in sorted(per_slot):
            total = per_slot[k][0]
            for v in per_slot[k][1:]:
                total = total + v
            out_ref[k] += total

    return kernel, n_grads


def scene_grads_pallas(camera, scene, g_image, *, depth: int = 2,
                       compat: bool = True, tile_w: int | None = None,
                       tile_h: int = 128,
                       interpret: bool = False, return_camera: bool = False,
                       aliasing: bool = False, aa_share: bool | None = None,
                       cheap_shadow: bool | None = None, cull: bool = True,
                       x_offset=0.0, local_width: int | None = None,
                       shadow_lists: bool | None = None,
                       group_cull: bool | None = None):
    """Fused backward (see _scene_grads_pallas). This un-jitted wrapper
    resolves the sqrt-free shadow-sweep guard while the scene is concrete and
    the measured-best tile/sharing defaults: AA cotangents run as shared
    sample chains at a narrow TW=24 tile (16.6 ms @1080p depth-2 on v5e vs
    22 ms for the per-sample grid axis — the sharing only wins once the tile
    is narrow enough that the chain residuals don't spill scoped VMEM; at
    TW=40 it loses 34 vs 24 ms and can fail to compile)."""
    if cheap_shadow is None:
        cheap_shadow = _shadow_cheap_ok(scene, compat)
    if aa_share is None:
        aa_share = aliasing
    if tile_w is None:
        tile_w = 24 if (aliasing and aa_share) else 40
    return _scene_grads_pallas(camera, scene, g_image, depth=depth,
                               compat=compat, tile_w=tile_w, tile_h=tile_h,
                               interpret=interpret, return_camera=return_camera,
                               aliasing=aliasing, aa_share=aa_share,
                               cheap_shadow=cheap_shadow, cull=cull,
                               x_offset=x_offset, local_width=local_width,
                               shadow_lists=shadow_lists,
                               group_cull=group_cull)


def loss_and_scene_grads_pallas(camera, scene, target, *, depth: int = 2,
                                compat: bool = True, aliasing: bool = False,
                                tile_w: int | None = None, tile_h: int = 128,
                                interpret: bool = False,
                                return_camera: bool = False,
                                cheap_shadow: bool | None = None,
                                cull: bool = True, x_offset=0.0,
                                local_width: int | None = None,
                                shadow_lists: bool | None = None,
                                group_cull: bool | None = None):
    """Fully-fused training step: ONE kernel renders each tile's forward
    chain, forms the MSE loss/cotangent against the ``target`` image
    in-registers, and reverse-sweeps — no separate forward render, no
    image/cotangent HBM round trip. Returns ``(loss_partial, scene_grads)``
    (+ camera grads with ``return_camera``); on a vertical slice the loss
    partial is ``sum(diff^2)/denom`` with the GLOBAL denominator, so shard
    partials psum to the full-image mean (train.pallas_value_and_grad_sharded).

    With ``aliasing`` (the reference driver's default, main.py:12) the kernel
    runs the shared-sample AA layout in three phases per tile — six forward
    chains storing compact sweep residuals to VMEM scratch + AA combine, MSE
    cotangent, six reverse chains replaying the residuals (see
    ``_make_bwd_kernel``).

    The in-kernel forward combine factors shading as ``(amb + lamb*sum) *
    albedo`` where the render kernel accumulates per-light terms — equal in
    exact arithmetic, ~1 ULP apart in f32, so loss/grads match the two-pass
    ``render + scene_grads_pallas`` to tolerance, not bit-for-bit."""
    if cheap_shadow is None:
        cheap_shadow = _shadow_cheap_ok(scene, compat)
    if tile_w is None:
        tile_w = 24 if aliasing else 40
    return _scene_grads_pallas(camera, scene, target, depth=depth,
                               compat=compat, tile_w=tile_w, tile_h=tile_h,
                               interpret=interpret, return_camera=return_camera,
                               aliasing=aliasing, aa_share=aliasing,
                               cheap_shadow=cheap_shadow, cull=cull,
                               x_offset=x_offset, local_width=local_width,
                               shadow_lists=shadow_lists, fused_loss=True,
                               group_cull=group_cull)


@functools.partial(jax.jit, static_argnames=("depth", "compat", "tile_w",
                                             "tile_h", "interpret",
                                             "return_camera", "aliasing",
                                             "aa_share", "cheap_shadow",
                                             "cull", "local_width",
                                             "shadow_lists", "fused_loss",
                                             "group_cull"))
def _scene_grads_pallas(camera, scene, g_image, *, depth: int = 2,
                        compat: bool = True, tile_w: int = 40, tile_h: int = 128,
                        interpret: bool = False, return_camera: bool = False,
                        aliasing: bool = False, aa_share: bool = False,
                        cheap_shadow: bool = True, cull: bool = True,
                        x_offset=0.0, local_width: int | None = None,
                        shadow_lists: bool | None = None,
                        fused_loss: bool = False,
                        group_cull: bool | None = None):
    """Fused backward: cotangent image ``(w, h, 3)`` -> scene-gradient pytree.

    Matches ``jax.vjp`` of the jnp path. With ``return_camera=True`` also
    returns the camera-gradient pytree (position/rotation/fov). ``aa_share=True``
    runs the AA cotangents as 6 shared sample chains per tile (6.75/9 of the
    per-sample arithmetic, same sublane sharing as the forward kernel). The
    full residual set of a chain plus every gradient partial stays live across
    all six chains, so the sharing only wins when the tile is narrow enough
    not to spill scoped VMEM: at TW=40 it loses (34 vs 22 ms @1080p depth-2 on
    v5e, and can fail to compile), at TW=24 it wins (16.6 ms). The public
    wrapper picks TW/sharing accordingly.
    """
    W, H = camera.resolution
    W_out = W if local_width is None else local_width
    ns, npl, nl = scene.spheres.count, scene.planes.count, scene.lights.count
    assert nl <= _UNROLL_LIMIT, (
        "fused backward needs an unrolled light count")
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

    swap_xy = _resolve_swap(W_out, H)
    U = H if swap_xy else W_out
    V = W_out if swap_xy else H
    TW = min(tile_w, U)
    TH = tile_h
    n_u, n_v = pl.cdiv(U, TW), pl.cdiv(V, TH)
    # Level-0 cone cull: same conservative per-tile visibility table as the
    # forward kernel (recomputed here — the backward's tile geometry differs).
    vis_k = _cull_capacity(ns, n_u * n_v)
    culled = cull and ns > _UNROLL_LIMIT and n_u * n_v * vis_k <= _CULL_BUDGET
    if culled:
        vis_idx, vis_cnt = _tile_visibility(
            camera, scene, n_u=n_u, n_v=n_v, TW=TW, TH=TH, swap_xy=swap_xy,
            x_offset=x_offset, compat=compat, K=vis_k)
    # Level-0 two-pass shadow lists, recomputed for the backward's own tile
    # geometry and sample chains (same prepass as the forward — the AABB
    # chains are a superset of both kernels' sample positions). Lists stay in
    # ORIGINAL index order (the backward has no sorted shadow table);
    # overflow rows degrade to the plain full sweep. Auto skips interpret
    # mode, like the forward.
    want_lists = ((_SHADOW_LISTS_AUTO and not interpret)
                  if shadow_lists is None else shadow_lists)
    sh_rows = n_u * n_v * nl
    # Shadow tables get what the cull table leaves of the combined SMEM cap
    # (same carve-out as the forward resolver).
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
            vis_k=vis_k, interpret=interpret, n_levels=1)
        sl_idx, sl_cnt = _shadow_visibility_lists(
            ext, scene.lights.position.astype(jnp.float32),
            scene.spheres.center.astype(jnp.float32),
            scene.spheres.radius.astype(jnp.float32),
            nl=nl, K=sh_k, compat=compat, to_sorted=None)
    # Morton-grouped runtime cull for the bounce folds (closest-hit recompute,
    # attr, occlusion, and reverse adjoints) — mirrors the forward kernel's
    # resolver; nl <= 8 because the grouped shadow sweep parks one occ mask
    # per light in the 8 state slabs.
    grouped = ((group_cull if group_cull is not None
                else (_GROUP_CULL_AUTO and not interpret
                      and ns >= _GROUP_MIN_NS))
               and ns > _UNROLL_LIMIT and depth > 0 and nl <= 8
               and npl <= _UNROLL_LIMIT)  # grouped shadow sweep unrolls planes
    if grouped:
        grp_perm, grp_bnd = _sphere_groups(
            scene.spheres.center.astype(jnp.float32),
            scene.spheres.radius.astype(jnp.float32),
            order_from=camera.position)
        n_groups = grp_perm.shape[0] // _GROUP_SIZE
    else:
        n_groups = 0
    kernel, n_grads = _make_bwd_kernel(W=W, H=H, U=U, V=V, TW=TW, TH=TH,
                                       depth=depth,
                                       ns=ns, npl=npl, nl=nl, compat=compat,
                                       swap_xy=swap_xy, aliasing=aliasing,
                                       aa_share=aa_share,
                                       cheap_shadow=cheap_shadow,
                                       culled=culled, vis_k=vis_k,
                                       shadow_listed=sh_listed, sh_k=sh_k,
                                       fused_loss=fused_loss, grouped=grouped,
                                       n_groups=n_groups)
    g_chw = jnp.moveaxis(g_image.astype(jnp.float32), -1, 0)  # (3, W, H)
    if swap_xy:
        g_chw = jnp.transpose(g_chw, (0, 2, 1))               # (3, H, W)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    if aliasing and not aa_share:
        grid = (n_u, n_v, len(AA_OFFSETS))
        g_spec = pl.BlockSpec((3, TW, TH), lambda i, j, s2: (0, i, j))
    else:
        grid = (n_u, n_v)
        g_spec = pl.BlockSpec((3, TW, TH), lambda i, j: (0, i, j))
    in_specs = [smem(), smem(), smem(), smem()]
    args = [params, sph, pln, lts]
    if culled:
        in_specs += [smem(), smem()]
        args += [vis_idx, vis_cnt]
    if sh_listed:
        in_specs += [smem(), smem()]
        args += [sl_idx, sl_cnt]
    if grouped:
        in_specs += [smem(), smem()]
        args += [grp_perm, grp_bnd]
    in_specs.append(g_spec)
    args.append(g_chw)
    scratch = []
    if fused_loss and aliasing:
        # Phase-A residual slabs: (t, hit_obj, [attr x6 on rolled scenes],
        # occ[l]) x (depth+1) bounces x 6 chains, allocated at the widest
        # chain shape (TW+8, TH). Demo scene (nl=3, depth=2) at TW=24/TH=128:
        # 90 slabs ~1.4 MB; rolled scenes add the attr kinds (198 slabs,
        # ~3.2 MB) to buy phase C out of the chunk-rolled attribute fold.
        n_kinds_alloc = (8 if (ns > _UNROLL_LIMIT and _ATTR_SLABS)
                         else 2) + nl
        scratch = [pltpu.VMEM((n_kinds_alloc * (depth + 1) * 6, TW + 8, TH),
                              jnp.float32)]
    if grouped:
        # Grouped-fold state slabs (8 reusable (TW+8, TH) rows); the kernel
        # pops this LAST, so it must follow the fused-AA slab.
        scratch = scratch + [pltpu.VMEM((8, TW + 8, TH), jnp.float32)]
    flat = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n_grads,), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)

    return unflatten_grads(flat, ns, npl, nl, camera,
                           return_camera=return_camera, fused_loss=fused_loss)


def unflatten_grads(flat, ns, npl, nl, camera, *, return_camera, fused_loss):
    """Flat SMEM gradient vector (``grad_layout`` order, + trailing loss slot
    when ``fused_loss``) -> scene / camera gradient pytrees. Shared by the hard
    (this module) and soft (soft_bwd.py) fused backward kernels."""
    n_grads = flat.shape[0]
    loss = flat[n_grads - 1] if fused_loss else None
    sph_g = flat[:7 * ns].reshape(ns, 7) if ns else jnp.zeros((0, 7))
    off = 7 * ns
    pln_g = flat[off:off + 9 * npl].reshape(npl, 9) if npl else jnp.zeros((0, 9))
    off += 9 * npl
    lts_g = flat[off:off + 3 * nl].reshape(nl, 3) if nl else jnp.zeros((0, 3))
    off += 3 * nl

    from ...models.scene import Scene, Spheres, Planes, Lights, Materials
    from ...models.camera import Camera
    scene_g = Scene(
        spheres=Spheres(center=sph_g[:, 0:3], radius=sph_g[:, 3],
                        albedo=sph_g[:, 4:7]),
        planes=Planes(origin=pln_g[:, 0:3], normal=pln_g[:, 3:6],
                      albedo=pln_g[:, 6:9]),
        lights=Lights(position=lts_g),
        materials=Materials(ambient=flat[off], lambert=flat[off + 1],
                            reflection=flat[off + 2],
                            specular=flat[off + 3],
                            shininess=flat[off + 4]),
    )
    if not return_camera:
        return (loss, scene_g) if fused_loss else scene_g
    off += 5
    camera_g = Camera(position=flat[off:off + 3],
                      rotation=flat[off + 3:off + 12].reshape(3, 3),
                      fov=flat[off + 12], resolution=camera.resolution)
    return (loss, scene_g, camera_g) if fused_loss else (scene_g, camera_g)
