"""Fused backward kernel vs jax.grad of the jnp path (interpret mode)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import python_ray_tracer_tpu as rt
from python_ray_tracer_tpu.ops.pallas.render_bwd import scene_grads_pallas
from python_ray_tracer_tpu import train


def _grads(cam, scene, depth, wh_target_scale=0.9):
    target = rt.render_image(cam, scene, depth=depth, aliasing=False,
                             compat=True) * wh_target_scale
    img, vjp_fn = jax.vjp(
        lambda s: rt.render_image(cam, s, depth=depth, aliasing=False,
                                  compat=True), scene)
    g_img = 2.0 * (img - target) / img.size
    g_ref = vjp_fn(g_img)[0]
    g_ker = scene_grads_pallas(cam, scene, g_img, depth=depth, compat=True,
                               tile_w=8, tile_h=32, interpret=True)
    return g_ker, g_ref


# Demo-scene interpret traces cost 40-65 s each on this host (tracing scales
# with the unrolled object/light count); the fast suite covers the same
# adjoint machinery on a small scene in test_bwd_small_scene_parity_and_slices.
@pytest.mark.slow
@pytest.mark.parametrize("wh,depth", [(24, 1), (32, 2)])
def test_bwd_matches_autodiff(demo_scene, wh, depth):
    cam = rt.default_camera((wh, wh))
    g_ker, g_ref = _grads(cam, demo_scene, depth)

    # Geometry grads: a.e. gradient with grazing-hit clamp — a few silhouette
    # pixels differ from XLA's sqrt-path values; totals agree to a few percent.
    for a, b in [(g_ker.spheres.center, g_ref.spheres.center),
                 (g_ker.spheres.radius, g_ref.spheres.radius),
                 (g_ker.lights.position, g_ref.lights.position)]:
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-12)
        assert rel < 5e-2, rel
    # Smooth grads: tight agreement.
    for a, b in [(g_ker.spheres.albedo, g_ref.spheres.albedo),
                 (g_ker.planes.albedo, g_ref.planes.albedo),
                 (g_ker.planes.origin, g_ref.planes.origin),
                 (g_ker.planes.normal, g_ref.planes.normal)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-7)
    for name in ("ambient", "lambert", "reflection"):
        a = float(getattr(g_ker.materials, name))
        b = float(getattr(g_ref.materials, name))
        assert a == pytest.approx(b, rel=1e-3, abs=1e-8), name


@pytest.mark.slow
def test_bwd_specular_matches_autodiff(demo_scene):
    """Clean-mode Phong: fused adjoints for specular/shininess (and the extra
    L.R chains into lights/normals) vs jax.grad (VERDICT r1 #4: these slots
    were hard-coded zero)."""
    scene = dataclasses.replace(
        demo_scene, materials=rt.Materials.build(specular=0.6, shininess=8.0))
    cam = rt.default_camera((24, 24))
    target = rt.render_image(cam, scene, depth=1, aliasing=False,
                             compat=False) * 0.9
    img, vjp_fn = jax.vjp(
        lambda s: rt.render_image(cam, s, depth=1, aliasing=False,
                                  compat=False), scene)
    g_img = 2.0 * (img - target) / img.size
    g_ref = vjp_fn(g_img)[0]
    g_ker = scene_grads_pallas(cam, scene, g_img, depth=1, compat=False,
                               tile_w=8, tile_h=32, interpret=True)
    for name in ("specular", "shininess", "ambient", "lambert", "reflection"):
        a = float(getattr(g_ker.materials, name))
        b = float(getattr(g_ref.materials, name))
        assert a == pytest.approx(b, rel=2e-3, abs=1e-8), (name, a, b)
    assert abs(float(g_ker.materials.specular)) > 0.0
    # the Phong term feeds extra chains into light/normal/geometry adjoints
    for a, b in [(g_ker.lights.position, g_ref.lights.position),
                 (g_ker.spheres.center, g_ref.spheres.center)]:
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-12)
        assert rel < 5e-2, rel
    np.testing.assert_allclose(np.asarray(g_ker.spheres.albedo),
                               np.asarray(g_ref.spheres.albedo),
                               rtol=1e-3, atol=1e-7)


@pytest.mark.slow  # shares test_bwd_matches_autodiff's traced program; see above
def test_bwd_no_nan_partial_tiles(demo_scene):
    """Non-tile-aligned resolutions must mask padded cotangent lanes."""
    cam = rt.default_camera((24, 24))  # 24 % 32 != 0 in the lane dim
    g_ker, _ = _grads(cam, demo_scene, 1)
    for leaf in jax.tree_util.tree_leaves(g_ker):
        assert not bool(jnp.isnan(leaf).any())


def test_pallas_train_step_converges():
    """End-to-end: fused fwd+bwd kernels drive an adam fit (interpret mode)."""
    import python_ray_tracer_tpu.ops.pallas.render_pallas as rp
    import python_ray_tracer_tpu.ops.pallas.render_bwd as rb
    cam = rt.default_camera((16, 16))
    scene = rt.Scene(
        rt.Spheres.build([([2.5, 0.5, 1.0], 0.8, rt.RED),
                          ([1.5, -0.9, 0.5], 0.5, rt.BLUE)]),
        rt.Planes.build([([5, 0, 0], [0, 0, 1], rt.GREY)]),
        rt.Lights.build([[2.5, -2.0, 3.0], [2.5, 2.0, 3.0]]),
        rt.Materials.build())
    orig_fwd, orig_bwd = rp.render_image_pallas, rb.scene_grads_pallas
    orig_fused = rb.loss_and_scene_grads_pallas
    try:
        rp.render_image_pallas = lambda c, s, **kw: orig_fwd(
            c, s, interpret=True, **{k: v for k, v in kw.items()
                                     if k != "interpret"})
        rb.scene_grads_pallas = lambda c, s, g, **kw: orig_bwd(
            c, s, g, interpret=True, **{k: v for k, v in kw.items()
                                        if k != "interpret"})
        rb.loss_and_scene_grads_pallas = lambda c, s, t, **kw: orig_fused(
            c, s, t, interpret=True, **{k: v for k, v in kw.items()
                                        if k != "interpret"})
        target = orig_fwd(cam, scene, depth=1, aliasing=False, compat=True,
                          interpret=True)
        init = dataclasses.replace(
            scene, spheres=dataclasses.replace(
                scene.spheres, center=scene.spheres.center + 0.1))
        fitted, losses = train.fit_scene(init, cam, target, steps=15, lr=5e-3,
                                         depth=1, backend="pallas",
                                         trainable=("spheres.center",))
    finally:
        rp.render_image_pallas, rb.scene_grads_pallas = orig_fwd, orig_bwd
        rb.loss_and_scene_grads_pallas = orig_fused
    assert losses[-1] < losses[0] * 0.75, losses[::5]


@pytest.mark.slow
def test_bwd_camera_grads_match_autodiff(demo_scene):
    """return_camera=True: position/rotation/fov cotangents vs jax.vjp."""
    cam = rt.default_camera((24, 24))
    target = rt.render_image(cam, demo_scene, depth=1, aliasing=False,
                             compat=True) * 0.9
    img, vjp_fn = jax.vjp(
        lambda c, s: rt.render_image(c, s, depth=1, aliasing=False,
                                     compat=True), cam, demo_scene)
    g_img = 2.0 * (img - target) / img.size
    gc_ref, _ = vjp_fn(g_img)
    _, gc = scene_grads_pallas(cam, demo_scene, g_img, depth=1, compat=True,
                               tile_w=8, tile_h=32, interpret=True,
                               return_camera=True)
    for a, b in [(gc.position, gc_ref.position),
                 (gc.rotation, gc_ref.rotation)]:
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-12)
        assert rel < 5e-3, rel
    # fov moves every ray at once, so its gradient carries the most
    # silhouette/grazing content — same a.e.-clamp discrepancy as geometry.
    assert float(gc.fov) == pytest.approx(float(gc_ref.fov), rel=5e-2)


@pytest.mark.slow
def test_bwd_rolled_matches_unrolled():
    """>16-sphere scenes take fori_loops with dynamic SMEM gradient stores; the
    rolled kernel must equal the force-unrolled kernel to machine precision.

    (vs jax.grad, cluttered random scenes disagree on *geometry* grads at
    grazing pixels — the implicit-function clamp bounds what XLA's sqrt-path
    blows up — so kernel-vs-kernel is the right equivalence check here, plus
    the shading-grad agreement below.)
    """
    import python_ray_tracer_tpu.ops.pallas.render_bwd as rb
    scene = rt.random_scene(jax.random.key(3), n_spheres=18)
    cam = rt.Camera.build((12, 12), [-6, 0, 3], [0, -20, 0])
    img = rt.render_image(cam, scene, depth=0, aliasing=False, compat=True)
    g_img = img * 1e-2 + 1e-4
    saved = rb._UNROLL_LIMIT
    try:
        rb._UNROLL_LIMIT = 64
        rb._scene_grads_pallas.clear_cache()
        gU = rb.scene_grads_pallas(cam, scene, g_img, depth=0, compat=True,
                                   tile_w=8, tile_h=16, interpret=True)
        rb._UNROLL_LIMIT = 16
        rb._scene_grads_pallas.clear_cache()
        gR = rb.scene_grads_pallas(cam, scene, g_img, depth=0, compat=True,
                                   tile_w=8, tile_h=16, interpret=True)
    finally:
        rb._UNROLL_LIMIT = saved
        rb._scene_grads_pallas.clear_cache()
    for a, b in zip(jax.tree_util.tree_leaves(gR), jax.tree_util.tree_leaves(gU)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    # shading-path grads still agree with XLA autodiff on the rolled scene
    img2, vjp = jax.vjp(lambda s: rt.render_image(cam, s, depth=0,
                                                  aliasing=False, compat=True),
                        scene)
    g_ref = vjp(g_img)[0]
    assert float(gR.materials.lambert) == pytest.approx(
        float(g_ref.materials.lambert), rel=1e-3)


@pytest.mark.slow
@pytest.mark.parametrize("aa_share", [False, True])
def test_bwd_aliasing_matches_autodiff(demo_scene, aa_share):
    """AA mode: both cotangent layouts — the per-sample grid axis (default) and
    the shared-sample chains (interior 1/9, border center-only, compat primary
    swap; shared halves sum their two pixels' weights) — reproduce jax.grad of
    the supersampled render."""
    cam = rt.default_camera((24, 24))
    target = rt.render_image(cam, demo_scene, depth=1, aliasing=True,
                             compat=True) * 0.9
    img, vjp = jax.vjp(lambda s: rt.render_image(cam, s, depth=1, aliasing=True,
                                                 compat=True), demo_scene)
    g_img = 2.0 * (img - target) / img.size
    g_ref = vjp(g_img)[0]
    g = scene_grads_pallas(cam, demo_scene, g_img, depth=1, compat=True,
                           tile_w=8, tile_h=32, interpret=True, aliasing=True,
                           aa_share=aa_share)
    a, b = np.asarray(g.spheres.center), np.asarray(g_ref.spheres.center)
    assert np.abs(a - b).max() / np.abs(b).max() < 5e-2
    np.testing.assert_allclose(np.asarray(g.spheres.albedo),
                               np.asarray(g_ref.spheres.albedo),
                               rtol=1e-3, atol=1e-7)
    assert float(g.materials.lambert) == pytest.approx(
        float(g_ref.materials.lambert), rel=1e-3)


@pytest.mark.slow
def test_bwd_slices_sum_to_full(demo_scene):
    """x_offset/local_width: the fused backward of a vertical image slice must
    see global pixel coordinates (ray-DP sharding), and the slice gradients
    must sum to the full-image gradients (gradients are pixel sums)."""
    cam = rt.default_camera((32, 16))
    key = jax.random.key(0)
    g_img = jax.random.normal(key, (32, 16, 3), jnp.float32) * 1e-3
    full = scene_grads_pallas(cam, demo_scene, g_img, depth=1, compat=True,
                              tile_w=8, tile_h=16, interpret=True)
    lo = scene_grads_pallas(cam, demo_scene, g_img[:16], depth=1, compat=True,
                            tile_w=8, tile_h=16, interpret=True,
                            x_offset=0.0, local_width=16)
    hi = scene_grads_pallas(cam, demo_scene, g_img[16:], depth=1, compat=True,
                            tile_w=8, tile_h=16, interpret=True,
                            x_offset=16.0, local_width=16)
    for a, b, c in zip(jax.tree_util.tree_leaves(full),
                       jax.tree_util.tree_leaves(lo),
                       jax.tree_util.tree_leaves(hi)):
        np.testing.assert_allclose(np.asarray(b) + np.asarray(c),
                                   np.asarray(a), rtol=1e-5, atol=1e-8)


@pytest.mark.slow  # 3 demo-scene AA interpret programs; shared-AA alone ~10 min
@pytest.mark.parametrize("aa_share", [False, True])
def test_bwd_aa_slices_sum_to_full(demo_scene, aa_share):
    """AA slice backwards: shared half-offset samples STRADDLE shard
    boundaries — each shard's backward contributes only its pixels' share of
    a boundary sample's cotangent, and the shares must sum (via psum in the
    sharded step) to the full-image gradient."""
    cam = rt.default_camera((16, 16))
    g_img = jax.random.normal(jax.random.key(2), (16, 16, 3),
                              jnp.float32) * 1e-3
    kw = dict(depth=1, compat=True, tile_w=8, tile_h=16, interpret=True,
              aliasing=True, aa_share=aa_share)
    full = scene_grads_pallas(cam, demo_scene, g_img, **kw)
    lo = scene_grads_pallas(cam, demo_scene, g_img[:8], x_offset=0.0,
                            local_width=8, **kw)
    hi = scene_grads_pallas(cam, demo_scene, g_img[8:], x_offset=8.0,
                            local_width=8, **kw)
    for a, b, c in zip(jax.tree_util.tree_leaves(full),
                       jax.tree_util.tree_leaves(lo),
                       jax.tree_util.tree_leaves(hi)):
        np.testing.assert_allclose(np.asarray(b) + np.asarray(c),
                                   np.asarray(a), rtol=1e-4, atol=1e-6)


def test_bwd_small_scene_parity_and_slices():
    """Fast-suite fused-backward coverage (the demo-scene variants above are
    40-78 s interpret traces and run under --runslow only). One small scene —
    2 spheres, 1 plane, 1 light, clean mode with Phong specular ON — checks,
    against jax.vjp of the jnp renderer:
      * every adjoint slot incl. specular/shininess (VERDICT r1 #4),
      * NaN-free grads with a non-tile-aligned lane dim (32x16 at tile_h=32
        pads half the lanes),
      * the x_offset/local_width slice path: two half-slice gradients must
        sum to the full-image gradients (ray-DP sharding's invariant)."""
    scene = rt.Scene(
        rt.Spheres.build([([2.5, 0.5, 1.0], 0.8, rt.RED),
                          ([1.5, -0.9, 0.5], 0.5, rt.BLUE)]),
        rt.Planes.build([([5, 0, 0], [0, 0, 1], rt.GREY)]),
        rt.Lights.build([[2.5, -2.0, 3.0]]),
        rt.Materials.build(specular=0.6, shininess=8.0))
    cam = rt.default_camera((32, 16))
    target = rt.render_image(cam, scene, depth=1, aliasing=False,
                             compat=False) * 0.9
    img, vjp_fn = jax.vjp(
        lambda s: rt.render_image(cam, s, depth=1, aliasing=False,
                                  compat=False), scene)
    g_img = 2.0 * (img - target) / img.size
    g_ref = vjp_fn(g_img)[0]
    kw = dict(depth=1, compat=False, tile_w=8, tile_h=32, interpret=True)
    g_ker = scene_grads_pallas(cam, scene, g_img, **kw)

    for leaf in jax.tree_util.tree_leaves(g_ker):
        assert not bool(jnp.isnan(leaf).any())
    for name in ("specular", "shininess", "ambient", "lambert", "reflection"):
        a = float(getattr(g_ker.materials, name))
        b = float(getattr(g_ref.materials, name))
        assert a == pytest.approx(b, rel=2e-3, abs=1e-8), (name, a, b)
    assert abs(float(g_ker.materials.specular)) > 0.0
    for a, b in [(g_ker.spheres.center, g_ref.spheres.center),
                 (g_ker.spheres.radius, g_ref.spheres.radius),
                 (g_ker.lights.position, g_ref.lights.position)]:
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() / (np.abs(b).max() + 1e-12) < 5e-2
    for a, b in [(g_ker.spheres.albedo, g_ref.spheres.albedo),
                 (g_ker.planes.albedo, g_ref.planes.albedo),
                 (g_ker.planes.origin, g_ref.planes.origin),
                 (g_ker.planes.normal, g_ref.planes.normal)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-7)

    lo = scene_grads_pallas(cam, scene, g_img[:16], x_offset=0.0,
                            local_width=16, **kw)
    hi = scene_grads_pallas(cam, scene, g_img[16:], x_offset=16.0,
                            local_width=16, **kw)
    for a, b, c in zip(jax.tree_util.tree_leaves(g_ker),
                       jax.tree_util.tree_leaves(lo),
                       jax.tree_util.tree_leaves(hi)):
        np.testing.assert_allclose(np.asarray(b) + np.asarray(c),
                                   np.asarray(a), rtol=1e-4, atol=1e-7)


# --- level-0 cone cull in the fused backward ---------------------------------
#
# The cull's invariant is *mathematical* bit-exactness of the fold (a culled
# sphere misses every primary ray of the tile, so every masked adjoint it
# would add is identically zero — including on the shared-AA pad rows, whose
# wild rays CAN hit culled spheres but carry zero cotangent). Whole-kernel
# cull-vs-nocull comparisons are tolerance-only: the two program variants
# compile with different fusion/reduction association — measured at ~1 ULP on
# camera/light slot totals with every per-chain value bit-identical.

def _cull_fold_case(n_spheres, cam_pos, K=None, seed=3, euler=(0, -20, 0)):
    """Run _fwd_trace_res + _bwd_trace culled vs full on a wide ray grid that
    includes shared-AA-style pad rows; return both (residuals, acc slots,
    carries) for comparison."""
    import python_ray_tracer_tpu.ops.pallas.render_bwd as rb
    import python_ray_tracer_tpu.ops.pallas.render_pallas as rp
    scene = rt.random_scene(jax.random.key(seed), n_spheres=n_spheres)
    cam = rt.Camera.build((8, 8), cam_pos, list(euler))
    compat = True
    ns, npl, nl = scene.spheres.count, scene.planes.count, scene.lights.count
    params = rp._pack_params(cam, scene, compat, 0.0)
    sph = jnp.concatenate([scene.spheres.center.T.astype(jnp.float32),
                           scene.spheres.radius[None].astype(jnp.float32),
                           scene.spheres.albedo.T.astype(jnp.float32)], axis=0)
    pln = jnp.concatenate([scene.planes.origin.T.astype(jnp.float32),
                           scene.planes.normal.T.astype(jnp.float32),
                           scene.planes.albedo.T.astype(jnp.float32)], axis=0)
    lts = scene.lights.position.T.astype(jnp.float32)
    TW, TH = 8, 16
    shape_w = (TW + 8, TH)   # shared-AA wide chain: rows > TW are pad rays
    vis_k = K if K is not None else rp._cull_capacity(ns, 1)
    vis_idx, vis_cnt = rp._tile_visibility(
        cam, scene, n_u=1, n_v=1, TW=TW, TH=TH, swap_xy=False, x_offset=0.0,
        compat=compat, K=vis_k)
    cull = (vis_idx, vis_cnt, jnp.int32(0), vis_k)
    suw = (-0.5 + jax.lax.broadcasted_iota(jnp.int32, shape_w, 0)
           .astype(jnp.float32))
    svw = jax.lax.broadcasted_iota(jnp.int32, shape_w, 1).astype(jnp.float32)
    pcx = params[rp._P_FOCAL]
    pcy = params[rp._P_Y0] + suw * params[rp._P_DY]
    pcz = params[rp._P_Z0] + svw * params[rp._P_DZ]
    R = params
    dx = R[rp._P_ROT+0]*pcx + R[rp._P_ROT+1]*pcy + R[rp._P_ROT+2]*pcz
    dy = R[rp._P_ROT+3]*pcx + R[rp._P_ROT+4]*pcy + R[rp._P_ROT+5]*pcz
    dz = R[rp._P_ROT+6]*pcx + R[rp._P_ROT+7]*pcy + R[rp._P_ROT+8]*pcz
    dn = rp._rnorm(dx, dy, dz)
    d0 = (dx*dn, dy*dn, dz*dn)
    o0 = tuple(jnp.full(shape_w, params[rp._P_ORIGIN+i], jnp.float32)
               for i in range(3))
    g = jax.random.normal(jax.random.key(0), (3,) + shape_w, jnp.float32)
    used = (jax.lax.broadcasted_iota(jnp.int32, shape_w, 0) <= TW)
    g = jnp.where(used[None], g, 0.0)   # pad rows carry zero cotangent

    import functools

    @functools.partial(jax.jit, static_argnames=("cull_on",))
    def run(cull_on):
        cu = cull if cull_on else None
        rgb, o_next, d_next, alive, res = rb._fwd_trace_res(
            params, sph, ns, pln, npl, lts, nl, o0, d0,
            compat=compat, shape=shape_w, cheap_shadow=True, cull=cu)
        accd = {}
        def acc(slot, vec):   # stringify: jit output dicts need sortable keys
            accd[str(slot)] = accd.get(str(slot), 0.0) + vec
        def acc_sph(j, c, vec):   # ref stores in the kernel; masked zeros for
            pass                  # invisible spheres via the same m/mt factors
        def acc_pln(j, c, vec):   # plane slots route through acc_pln now
            acc(("pln", j, c), vec)
        zero3 = (jnp.zeros(shape_w, jnp.float32),)*3
        obar, dbar = rb._bwd_trace(params, sph, ns, pln, npl, lts, nl, res,
                                   (g[0], g[1], g[2]), zero3, zero3, acc,
                                   acc_sph, acc_pln, compat=compat, cull=cu)
        return rgb, res["t"], res["hit_obj"], accd, obar, dbar
    return run(cull_on=True), run(cull_on=False), np.asarray(vis_cnt)


def test_bwd_cull_fold_bitexact_jnp():
    """Culled vs full fold, same jit: residuals on used rows, every non-sphere
    accumulator slot, and the (obar, dbar) carries must be BIT-identical.
    (Pad-row residuals legitimately differ — their rays may hit culled
    spheres — but contribute exact zeros through the zero cotangent.)

    Bit-equality additionally requires XLA to emit the same arithmetic for
    both program variants, which holds for this draw but not universally —
    the fuzz test below found draws where FMA contraction differs between
    the two compilations (t drifts ~1e-6 relative). If a toolchain bump ever
    breaks only THIS test with ULP-class diffs while the fuzz stays green,
    that is codegen drift, not a cull bug."""
    (rgbC, tC, hC, accC, oC, dC), (rgbN, tN, hN, accN, oN, dN), cnt = \
        _cull_fold_case(18, [-6, 0, 3])
    assert 0 < int(cnt[0]) < 18   # non-vacuous: the tile culls something
    used = slice(0, 9)            # rows 0..TW inclusive
    for a, b in zip(rgbC, rgbN):
        np.testing.assert_array_equal(np.asarray(a)[used], np.asarray(b)[used])
    np.testing.assert_array_equal(np.asarray(tC)[used], np.asarray(tN)[used])
    np.testing.assert_array_equal(np.asarray(hC)[used], np.asarray(hN)[used])
    assert set(accC) == set(accN)
    for k in accC:   # full arrays incl. pad rows: adjoints are cotangent-rooted
        np.testing.assert_array_equal(np.asarray(accC[k]), np.asarray(accN[k]),
                                      err_msg=str(k))
    for a, b in zip(oC + dC, oN + dN):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bwd_cull_fold_overflow_sentinel_jnp():
    """K smaller than the visible count: the tile takes the -1 sentinel and the
    culled fold must fall back to a bit-identical full identity sweep."""
    (rgbC, tC, hC, accC, oC, dC), (rgbN, tN, hN, accN, oN, dN), cnt = \
        _cull_fold_case(18, [-60, 0, 3], K=4)
    assert int(cnt[0]) == -1
    for a, b in zip(rgbC + oC + dC, rgbN + oN + dN):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(tC), np.asarray(tN))
    for k in accC:
        np.testing.assert_array_equal(np.asarray(accC[k]), np.asarray(accN[k]),
                                      err_msg=str(k))


@pytest.mark.slow
def test_bwd_group_cull_matches_plain():
    """Morton-grouped bounce folds in the backward (closest-hit recompute,
    attr, occlusion, reverse adjoints) == the plain full-sweep backward.
    Tolerance-only like kernel-level cull-vs-nocull: the two program
    variants compile with different association (~ULP)."""
    from python_ray_tracer_tpu.ops.pallas.render_bwd import scene_grads_pallas
    scene = rt.random_scene(jax.random.key(5), n_spheres=40)
    cam = rt.Camera.build((16, 8), [-7, 0, 3], [0, -15, 0])
    g = jax.random.normal(jax.random.key(1), (16, 8, 3), jnp.float32) * 1e-3
    kw = dict(depth=1, compat=True, tile_w=8, tile_h=8, interpret=True,
              return_camera=True)
    a = scene_grads_pallas(cam, scene, g, group_cull=False, **kw)
    b = scene_grads_pallas(cam, scene, g, group_cull=True, **kw)
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=1e-6, atol=1e-8)


@pytest.mark.slow
def test_fused_loss_group_cull_matches_plain():
    """Fused training step with grouped bounce folds == plain fused step
    (the production path for dense-scene training)."""
    from python_ray_tracer_tpu.ops.pallas.render_bwd import \
        loss_and_scene_grads_pallas
    from python_ray_tracer_tpu.ops.pallas.render_pallas import \
        render_image_pallas
    scene = rt.random_scene(jax.random.key(5), n_spheres=40)
    cam = rt.Camera.build((16, 8), [-7, 0, 3], [0, -15, 0])
    img = render_image_pallas(cam, scene, depth=1, aliasing=False, compat=True,
                              interpret=True)
    target = img * 0.9 + 1.0
    kw = dict(depth=1, compat=True, tile_w=8, tile_h=8, interpret=True)
    la, ga = loss_and_scene_grads_pallas(cam, scene, target,
                                         group_cull=False, **kw)
    lb, gb = loss_and_scene_grads_pallas(cam, scene, target,
                                         group_cull=True, **kw)
    np.testing.assert_allclose(float(lb), float(la), rtol=1e-7)
    for x, y in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=1e-6, atol=1e-8)


@pytest.mark.slow
def test_bwd_cull_small_scene_kernel():
    """Integration coverage of the culled kernel path (rolled folds + compact
    SMEM lists), activated on a small scene by lowering the unroll limit.
    Kernel-level cull-vs-nocull is allclose-only (see block comment). Slow:
    traces two kernel variants (~68 s interpret); the fast suite keeps the
    jnp-level bit-exactness pair, which exercises the same fold code."""
    import python_ray_tracer_tpu.ops.pallas.render_bwd as rb
    scene = rt.random_scene(jax.random.key(5), n_spheres=6)
    cam = rt.Camera.build((12, 12), [-6, 0, 3], [0, -20, 0])
    img = rt.render_image(cam, scene, depth=1, aliasing=False, compat=True)
    g_img = img * 1e-2 + 1e-4
    saved = rb._UNROLL_LIMIT
    try:
        rb._UNROLL_LIMIT = 4
        rb._scene_grads_pallas.clear_cache()
        kw = dict(depth=1, compat=True, tile_w=8, tile_h=16, interpret=True,
                  return_camera=True)
        gC = rb.scene_grads_pallas(cam, scene, g_img, cull=True, **kw)
        gN = rb.scene_grads_pallas(cam, scene, g_img, cull=False, **kw)
    finally:
        rb._UNROLL_LIMIT = saved
        rb._scene_grads_pallas.clear_cache()
    for a, b in zip(jax.tree_util.tree_leaves(gC),
                    jax.tree_util.tree_leaves(gN)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("aliasing,aa_share", [(False, False), (True, False),
                                               (True, True)])
def test_bwd_cull_matches_nocull_kernel(aliasing, aa_share):
    """Rolled 18-sphere kernel: culled vs full gradients in every cotangent
    layout (no-AA, per-sample AA, shared-AA), ULP-class tolerance."""
    import python_ray_tracer_tpu.ops.pallas.render_bwd as rb
    scene = rt.random_scene(jax.random.key(3), n_spheres=18)
    cam = rt.Camera.build((12, 12), [-6, 0, 3], [0, -20, 0])
    img = rt.render_image(cam, scene, depth=1, aliasing=aliasing, compat=True)
    g_img = img * 1e-2 + 1e-4
    kw = dict(depth=1, compat=True, tile_w=8, tile_h=16, interpret=True,
              aliasing=aliasing, aa_share=aa_share, return_camera=True)
    gC = rb.scene_grads_pallas(cam, scene, g_img, cull=True, **kw)
    gN = rb.scene_grads_pallas(cam, scene, g_img, cull=False, **kw)
    for a, b in zip(jax.tree_util.tree_leaves(gC),
                    jax.tree_util.tree_leaves(gN)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_cull_table_slice_offset_bitexact():
    """Ray-DP slices: a shard's visibility table built with ``x_offset`` must
    BIT-equal the corresponding tile rows of the full-image table — the cone
    geometry depends only on a tile's global pixel rectangle, never on which
    shard computes it. This is the table half of the sharded-cull invariant;
    the fold half is test_bwd_cull_fold_bitexact_jnp."""
    import python_ray_tracer_tpu.ops.pallas.render_pallas as rp
    scene = rt.random_scene(jax.random.key(3), n_spheres=18)
    cam = rt.Camera.build((32, 16), [-6, 0, 3], [0, -20, 0])
    TW, TH, K = 8, 16, 8
    kw = dict(TW=TW, TH=TH, swap_xy=False, compat=True, K=K)
    idx_full, cnt_full = rp._tile_visibility(cam, scene, n_u=4, n_v=1,
                                             x_offset=0.0, **kw)
    idx_hi, cnt_hi = rp._tile_visibility(cam, scene, n_u=2, n_v=1,
                                         x_offset=16.0, **kw)
    assert int(jnp.sum(cnt_full >= 0)) > 0   # non-vacuous
    np.testing.assert_array_equal(np.asarray(cnt_hi), np.asarray(cnt_full)[2:])
    np.testing.assert_array_equal(np.asarray(idx_hi),
                                  np.asarray(idx_full)[2 * K:])


@pytest.mark.slow
def test_bwd_cull_sharded_slices_sum():
    """Dense-scene (rolled + culled) backward over two vertical slices: the
    slice gradients must sum to the full-image CULL-OFF gradients — covers the
    x_offset/local_width + cull interaction the small-scene slice test (cull
    bypassed) and the dryrun (tiny scene) cannot see."""
    import python_ray_tracer_tpu.ops.pallas.render_bwd as rb
    scene = rt.random_scene(jax.random.key(3), n_spheres=18)
    cam = rt.Camera.build((32, 16), [-6, 0, 3], [0, -20, 0])
    img = rt.render_image(cam, scene, depth=1, aliasing=False, compat=True)
    g_img = img * 1e-2 + 1e-4
    kw = dict(depth=1, compat=True, tile_w=8, tile_h=16, interpret=True,
              return_camera=True)
    full = rb.scene_grads_pallas(cam, scene, g_img, cull=False, **kw)
    lo = rb.scene_grads_pallas(cam, scene, g_img[:16], cull=True,
                               x_offset=0.0, local_width=16, **kw)
    hi = rb.scene_grads_pallas(cam, scene, g_img[16:], cull=True,
                               x_offset=16.0, local_width=16, **kw)
    for a, b, c in zip(jax.tree_util.tree_leaves(full),
                       jax.tree_util.tree_leaves(lo),
                       jax.tree_util.tree_leaves(hi)):
        # atol 1e-6, not 1e-7: comparing cull-ON slices against the CULL-OFF
        # full image stacks slice-splitting on top of the cull's program-
        # variant reassociation (~1 ULP on near-zero slots, see block comment).
        np.testing.assert_allclose(np.asarray(b) + np.asarray(c),
                                   np.asarray(a), rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_bwd_cull_fold_fuzz():
    """Randomized sweep of the cull-fold invariant over scenes, camera
    positions, and orientations. The *structural* claim — the culled sweep
    picks the identical winner for every used ray — is asserted exactly
    (hit_obj bit-equal). Values are tolerance-checked: fuzzing exposed that
    culled and full variants are separately compiled programs whose per-sphere
    arithmetic XLA FMA-contracts differently, so even the forward t drifts
    up to ~2e-5 relative on general draws (the fixed-draw bitexact test above
    documents the case where codegen happens to coincide; the mathematical
    fold identity itself is exact). Skips vacuous draws (tile culls nothing
    or overflows); requires most draws to be informative."""
    rng = np.random.default_rng(11)
    checked = 0
    for trial in range(8):
        n = int(rng.integers(17, 40))
        pos = [float(rng.uniform(-9, -3)), float(rng.uniform(-3, 3)),
               float(rng.uniform(0, 5))]
        euler = (0.0, float(rng.uniform(-35, -5)), float(rng.uniform(-25, 25)))
        (rgbC, tC, hC, accC, oC, dC), (rgbN, tN, hN, accN, oN, dN), cnt = \
            _cull_fold_case(n, pos, seed=int(rng.integers(0, 1000)),
                            euler=euler)
        c = int(cnt[0])
        if not 0 < c < n:
            continue  # nothing culled (or overflow): identity sweep, vacuous
        checked += 1
        used = slice(0, 9)
        np.testing.assert_array_equal(np.asarray(hC)[used],
                                      np.asarray(hN)[used])
        np.testing.assert_allclose(np.asarray(tC)[used], np.asarray(tN)[used],
                                   rtol=1e-4, atol=1e-6)
        for a, b in zip(rgbC, rgbN):
            np.testing.assert_allclose(np.asarray(a)[used],
                                       np.asarray(b)[used],
                                       rtol=1e-4, atol=1e-4)
        for k in accC:   # adjoint chains amplify contraction noise ~10x
            a, b = np.asarray(accC[k]), np.asarray(accN[k])
            scale = np.abs(b).max() + 1e-6
            np.testing.assert_allclose(a / scale, b / scale, rtol=0,
                                       atol=5e-4, err_msg=str(k))
        for a, b in zip(oC + dC, oN + dN):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(b).max() + 1e-6
            np.testing.assert_allclose(a / scale, b / scale, rtol=0,
                                       atol=5e-4)
    assert checked >= 4, f"only {checked}/8 draws were informative"


# --- two-pass shadow lists in the backward (level-0 occlusion folds) ---------

def _bwd_shadow_list_setup(n_spheres=18, W=32, H=16, TW=8, TH=16):
    """Backward-tile-geometry prepass lists (ORIGINAL index order), exactly as
    _scene_grads_pallas builds them."""
    import python_ray_tracer_tpu.ops.pallas.render_pallas as rp
    scene = rt.random_scene(jax.random.key(3), n_spheres=n_spheres)
    cam = rt.Camera.build((W, H), [-2.0, 0.0, 2.0], [0.0, -30.0, 0.0])
    ns, npl = scene.spheres.count, scene.planes.count
    nl = scene.lights.count
    params = rp._pack_params(cam, scene, True, 0.0)
    sph = jnp.concatenate([scene.spheres.center.T, scene.spheres.radius[None],
                           scene.spheres.albedo.T], axis=0).astype(jnp.float32)
    pln = jnp.concatenate([scene.planes.origin.T, scene.planes.normal.T,
                           scene.planes.albedo.T], axis=0).astype(jnp.float32)
    lts = scene.lights.position.T.astype(jnp.float32)
    swap = rp._resolve_swap(W, H)
    U, V = (H, W) if swap else (W, H)
    n_u, n_v = -(-U // TW), -(-V // TH)
    vis_k = rp._cull_capacity(ns, n_u * n_v)
    vis = rp._tile_visibility(cam, scene, n_u=n_u, n_v=n_v, TW=TW, TH=TH,
                              swap_xy=swap, x_offset=0.0, compat=True, K=vis_k)
    ext = rp._hit_extents_pallas(params, sph, pln, W=W, H=H, n_u=n_u, n_v=n_v,
                                 TW=TW, TH=TH, ns=ns, npl=npl, compat=True,
                                 swap_xy=swap, aliasing=True, culled=True,
                                 vis_tabs=vis, vis_k=vis_k, interpret=True,
                                 n_levels=1)
    sh_k = rp._shadow_list_capacity(ns, n_u * n_v * nl)
    sl_idx, sl_cnt = rp._shadow_visibility_lists(
        ext, scene.lights.position.astype(jnp.float32),
        scene.spheres.center.astype(jnp.float32),
        scene.spheres.radius.astype(jnp.float32),
        nl=nl, K=sh_k, compat=True, to_sorted=None)
    return (scene, cam, params, sph, pln, lts, swap, (n_u, n_v), (TW, TH),
            vis + (vis_k,), (sl_idx, sl_cnt, sh_k))


def test_bwd_shadow_lists_occ_bitexact_jnp():
    """Level-0 Lambert masks (occlusion & ldotn) of the listed occlusion fold
    must BIT-equal the full sweep's on every consumed lane — occlusion is an
    order-free max of per-sphere indicators computed with identical
    arithmetic, and the prepass AABB bounds this kernel's own biased hit
    points bit-exactly (the closest-hit recompute shares _closest_hit's
    hoisted * inv2a root form for exactly this reason). Lanes outside the
    image (AA halo samples, excluded from the AABB) carry zero cotangent and
    may differ."""
    import python_ray_tracer_tpu.ops.pallas.render_bwd as rb
    import python_ray_tracer_tpu.ops.pallas.render_pallas as rp
    (scene, cam, params, sph, pln, lts, swap, (n_u, n_v), (TW, TH),
     (vis_idx, vis_cnt, vis_k), (sl_idx, sl_cnt, sh_k)) = \
        _bwd_shadow_list_setup()
    ns, npl, nl = scene.spheres.count, scene.planes.count, scene.lights.count
    W, H = cam.resolution
    cnts = np.asarray(sl_cnt)
    assert ((0 < cnts) & (cnts < ns)).any(), "vacuous: no row culls anything"

    @jax.jit
    def mismatches_for(tile_id, du, dv):
        ti = tile_id // n_v
        tj = tile_id % n_v
        iu = (jnp.arange(TW, dtype=jnp.float32)[:, None]
              + (ti * TW).astype(jnp.float32))
        iv = (jnp.arange(TH, dtype=jnp.float32)[None, :]
              + (tj * TH).astype(jnp.float32))
        u = jnp.broadcast_to(iu + du, (TW, TH))
        v = jnp.broadcast_to(iv + dv, (TW, TH))
        px, py = (u, v) if not swap else (v, u)
        ox, oy, oz, dx, dy, dz = rp._raygen(params, px, py)
        o3 = tuple(jnp.full((TW, TH), c, jnp.float32) for c in (ox, oy, oz))
        common = dict(compat=True, shape=(TW, TH), cheap_shadow=True,
                      cull=(vis_idx, vis_cnt, tile_id, vis_k))
        _, _, _, alive, res0 = rb._fwd_trace_res(
            params, sph, ns, pln, npl, lts, nl, o3, (dx, dy, dz),
            sh_lists=None, **common)
        _, _, _, _, res1 = rb._fwd_trace_res(
            params, sph, ns, pln, npl, lts, nl, o3, (dx, dy, dz),
            sh_lists=(sl_idx, sl_cnt, tile_id, sh_k, nl), **common)
        gx, gy = (u, v) if not swap else (v, u)
        used = (alive & (gx >= 0) & (gx <= W - 1)
                & (gy >= 0) & (gy <= H - 1))
        bad = 0
        for l in range(nl):
            bad += jnp.sum((res0["lights"][l][4] != res1["lights"][l][4])
                           & used)
        return bad

    mismatches = 0
    for tile_id in range(n_u * n_v):
        for du, dv in [(0.0, 0.0), (-0.5, 0.5)]:
            mismatches += int(mismatches_for(jnp.int32(tile_id),
                                             jnp.float32(du),
                                             jnp.float32(dv)))
    assert mismatches == 0


@pytest.mark.slow
@pytest.mark.parametrize("aliasing,aa_share", [(False, False), (True, False),
                                               (True, True)])
def test_bwd_shadow_lists_match_plain_kernel(aliasing, aa_share):
    """Whole-kernel listed vs plain gradients in every cotangent layout.
    Tolerance-only for the same reason as cull-vs-nocull (separately compiled
    program variants FMA-contract differently, ~1 ULP); the occ-mask test
    above pins the exact invariant. On-chip 2026-08: no-AA and per-sample AA
    happened to be bit-equal, shared-AA differed by 1.2e-7 on scale 1e2."""
    import python_ray_tracer_tpu.ops.pallas.render_bwd as rb
    scene = rt.random_scene(jax.random.key(3), n_spheres=18)
    cam = rt.Camera.build((12, 12), [-6, 0, 3], [0, -20, 0])
    img = rt.render_image(cam, scene, depth=1, aliasing=aliasing, compat=True)
    g_img = img * 1e-2 + 1e-4
    kw = dict(depth=1, compat=True, tile_w=8, tile_h=16, interpret=True,
              aliasing=aliasing, aa_share=aa_share, return_camera=True)
    gL = rb.scene_grads_pallas(cam, scene, g_img, shadow_lists=True, **kw)
    gN = rb.scene_grads_pallas(cam, scene, g_img, shadow_lists=False, **kw)
    for a, b in zip(jax.tree_util.tree_leaves(gL),
                    jax.tree_util.tree_leaves(gN)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_bwd_shadow_lists_sharded_slices_sum():
    """Listed backward over two vertical ray-DP slices: slice gradients sum to
    the full-image gradients — covers the x_offset/local_width + prepass
    interaction (the prepass packs the slice's global x offset into params)."""
    import python_ray_tracer_tpu.ops.pallas.render_bwd as rb
    scene = rt.random_scene(jax.random.key(3), n_spheres=18)
    cam = rt.Camera.build((32, 16), [-6, 0, 3], [0, -20, 0])
    img = rt.render_image(cam, scene, depth=1, aliasing=False, compat=True)
    g_img = img * 1e-2 + 1e-4
    kw = dict(depth=1, compat=True, tile_w=8, tile_h=16, interpret=True,
              return_camera=True, shadow_lists=True)
    full = rb.scene_grads_pallas(cam, scene, g_img, **kw)
    lo = rb.scene_grads_pallas(cam, scene, g_img[:16], x_offset=0.0,
                               local_width=16, **kw)
    hi = rb.scene_grads_pallas(cam, scene, g_img[16:], x_offset=16.0,
                               local_width=16, **kw)
    for a, b, c in zip(jax.tree_util.tree_leaves(full),
                       jax.tree_util.tree_leaves(lo),
                       jax.tree_util.tree_leaves(hi)):
        np.testing.assert_allclose(np.asarray(b) + np.asarray(c),
                                   np.asarray(a), rtol=1e-4, atol=1e-6)


# --- fully-fused training step (in-kernel MSE loss + cotangent) --------------

@pytest.mark.parametrize("n_spheres,lists", [
    (2, False),
    # the rolled-scene variant re-traces all three interpret programs with
    # chunked folds (~45 s) — slow set, like the listed PRODUCTION combo
    # (shadow_lists auto-ON outside interpret mode: fused MSE cotangent
    # formed from a forward chain whose occ masks come from the listed folds)
    pytest.param(18, False, marks=pytest.mark.slow),
    pytest.param(18, True, marks=pytest.mark.slow)])
def test_fused_loss_matches_two_pass(n_spheres, lists):
    """loss_and_scene_grads_pallas == (render -> MSE -> scene_grads_pallas) to
    tolerance. Not bit-exact by design: the in-kernel combine factors shading
    as (amb + lamb*sum)*albedo where the render kernel accumulates per-light
    terms — equal in exact arithmetic, ~1 ULP apart in f32 (measured 1e-7
    relative on both a 2-sphere and an 18-sphere rolled scene)."""
    from python_ray_tracer_tpu.ops.pallas.render_bwd import (
        scene_grads_pallas, loss_and_scene_grads_pallas)
    from python_ray_tracer_tpu.ops.pallas.render_pallas import \
        render_image_pallas
    if n_spheres == 2:
        scene = rt.Scene(
            rt.Spheres.build([([2.5, 0.5, 1.0], 0.8, rt.RED),
                              ([1.5, -0.9, 0.5], 0.5, rt.BLUE)]),
            rt.Planes.build([([5, 0, 0], [0, 0, 1], rt.GREY)]),
            rt.Lights.build([[2.5, -2.0, 3.0], [2.5, 2.0, 3.0]]),
            rt.Materials.build())
    else:
        scene = rt.random_scene(jax.random.key(3), n_spheres=n_spheres)
    W, H = (16, 8) if n_spheres == 2 else (32, 16)
    cam = rt.Camera.build((W, H), [-6.0, 0.0, 3.0], [0.0, -20.0, 0.0])
    img = render_image_pallas(cam, scene, depth=1, aliasing=False, compat=True,
                              interpret=True)
    target = img * 0.9 + 1.0
    diff = img - target
    loss0 = jnp.mean(diff ** 2)
    kw = dict(depth=1, compat=True, tile_w=8, tile_h=8, interpret=True,
              return_camera=True, shadow_lists=lists)
    g0 = scene_grads_pallas(cam, scene, 2.0 * diff / diff.size, **kw)
    loss1, *g1 = loss_and_scene_grads_pallas(cam, scene, target, **kw)
    np.testing.assert_allclose(float(loss1), float(loss0), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(tuple(g1))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("depth", [
    0,
    pytest.param(1, marks=pytest.mark.slow)])
def test_fused_loss_aa_matches_two_pass(depth):
    """Fused-AA training step == (AA render -> MSE -> AA backward) to
    tolerance, incl. camera grads.

    The fused-AA kernel runs three phases per tile (six forward chains
    storing raw t/hit_obj/occlusion residuals to VMEM scratch + the stored
    AA combine, in-kernel MSE cotangent, six reverse chains replaying the
    residuals); the reference path is the AA render kernel + the two-pass
    shared-AA backward. Same tolerance class as the no-AA fused test: the
    in-kernel combine reassociates shading by ~1 ULP. depth=0 exercises all
    three phases and the compat border/channel-swap combine cheaply; depth=1
    (slow) adds the bounce-chain replay."""
    from python_ray_tracer_tpu.ops.pallas.render_bwd import (
        scene_grads_pallas, loss_and_scene_grads_pallas)
    from python_ray_tracer_tpu.ops.pallas.render_pallas import \
        render_image_pallas
    lights = [[2.5, -2.0, 3.0]] if depth == 0 else \
        [[2.5, -2.0, 3.0], [2.5, 2.0, 3.0]]
    scene = rt.Scene(
        rt.Spheres.build([([2.5, 0.5, 1.0], 0.8, rt.RED),
                          ([1.5, -0.9, 0.5], 0.5, rt.BLUE)]),
        rt.Planes.build([([5, 0, 0], [0, 0, 1], rt.GREY)]),
        rt.Lights.build(lights),
        rt.Materials.build())
    W, H = (8, 8) if depth == 0 else (32, 16)
    cam = rt.Camera.build((W, H), [-6.0, 0.0, 3.0], [0.0, -20.0, 0.0])
    kw = dict(depth=depth, compat=True, tile_w=8, tile_h=8, interpret=True)
    if depth == 0:
        # Fast variant: oracle is jax.vjp of the jnp AA renderer (ONE pallas
        # interpret trace instead of three — the two-pass reference is the
        # dominant cost). Looser tolerance: different arithmetic entirely.
        img, vjp_fn = jax.vjp(
            lambda s: rt.render_image(cam, s, depth=0, aliasing=True,
                                      compat=True), scene)
        target = img * 0.9 + 1.0
        diff = img - target
        loss0 = jnp.mean(diff ** 2)
        g_ref = vjp_fn(2.0 * diff / diff.size)[0]
        loss1, g_ker = loss_and_scene_grads_pallas(cam, scene, target,
                                                   aliasing=True, **kw)
        np.testing.assert_allclose(float(loss1), float(loss0), rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g_ker)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-3, atol=1e-6)
        return
    img = render_image_pallas(cam, scene, depth=depth, aliasing=True,
                              compat=True, interpret=True, tile_w=8, tile_h=8)
    target = img * 0.9 + 1.0
    diff = img - target
    loss0 = jnp.mean(diff ** 2)
    kw["return_camera"] = True
    g0 = scene_grads_pallas(cam, scene, 2.0 * diff / diff.size,
                            aliasing=True, **kw)
    loss1, *g1 = loss_and_scene_grads_pallas(cam, scene, target,
                                             aliasing=True, **kw)
    np.testing.assert_allclose(float(loss1), float(loss0), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(tuple(g1))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_fused_loss_aa_slices_sum():
    """Fused-AA slices: shared half-offset samples straddle shard boundaries;
    the per-slice loss partials (GLOBAL denominator) and gradients must sum
    to the full-image values — the sharded AA training psum's invariant."""
    from python_ray_tracer_tpu.ops.pallas.render_bwd import \
        loss_and_scene_grads_pallas
    from python_ray_tracer_tpu.ops.pallas.render_pallas import \
        render_image_pallas
    scene = rt.Scene(
        rt.Spheres.build([([2.5, 0.5, 1.0], 0.8, rt.RED),
                          ([1.5, -0.9, 0.5], 0.5, rt.BLUE)]),
        rt.Planes.build([([5, 0, 0], [0, 0, 1], rt.GREY)]),
        rt.Lights.build([[2.5, -2.0, 3.0]]),
        rt.Materials.build())
    cam = rt.Camera.build((16, 8), [-6.0, 0.0, 3.0], [0.0, -20.0, 0.0])
    img = render_image_pallas(cam, scene, depth=0, aliasing=True, compat=True,
                              interpret=True, tile_w=8, tile_h=8)
    target = img * 0.9 + 1.0
    kw = dict(depth=0, compat=True, aliasing=True, tile_w=8, tile_h=8,
              interpret=True)
    lf, gf = loss_and_scene_grads_pallas(cam, scene, target, **kw)
    ll, gl = loss_and_scene_grads_pallas(cam, scene, target[:8],
                                         x_offset=0.0, local_width=8, **kw)
    lh, gh = loss_and_scene_grads_pallas(cam, scene, target[8:],
                                         x_offset=8.0, local_width=8, **kw)
    np.testing.assert_allclose(float(ll) + float(lh), float(lf), rtol=1e-5)
    for a, b, c in zip(jax.tree_util.tree_leaves(gf),
                       jax.tree_util.tree_leaves(gl),
                       jax.tree_util.tree_leaves(gh)):
        np.testing.assert_allclose(np.asarray(b) + np.asarray(c),
                                   np.asarray(a), rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_fused_loss_sharded_slices_sum():
    """Fused-step slices: per-slice loss partials (GLOBAL denominator) sum to
    the full-image MSE, and slice gradients sum to the full-image gradients —
    the invariant the sharded training psum relies on."""
    from python_ray_tracer_tpu.ops.pallas.render_bwd import \
        loss_and_scene_grads_pallas
    from python_ray_tracer_tpu.ops.pallas.render_pallas import \
        render_image_pallas
    scene = rt.random_scene(jax.random.key(3), n_spheres=18)
    cam = rt.Camera.build((32, 16), [-6, 0, 3], [0, -20, 0])
    img = render_image_pallas(cam, scene, depth=1, aliasing=False, compat=True,
                              interpret=True)
    target = img * 0.9 + 1.0
    kw = dict(depth=1, compat=True, tile_w=8, tile_h=16, interpret=True)
    lf, gf = loss_and_scene_grads_pallas(cam, scene, target, **kw)
    ll, gl = loss_and_scene_grads_pallas(cam, scene, target[:16],
                                         x_offset=0.0, local_width=16, **kw)
    lh, gh = loss_and_scene_grads_pallas(cam, scene, target[16:],
                                         x_offset=16.0, local_width=16, **kw)
    np.testing.assert_allclose(float(ll) + float(lh), float(lf), rtol=1e-5)
    for a, b, c in zip(jax.tree_util.tree_leaves(gf),
                       jax.tree_util.tree_leaves(gl),
                       jax.tree_util.tree_leaves(gh)):
        np.testing.assert_allclose(np.asarray(b) + np.asarray(c),
                                   np.asarray(a), rtol=1e-4, atol=1e-6)


@pytest.mark.slow  # 45 s: 32 unrolled-in-jnp planes dominate the trace
def test_bwd_rolled_planes_matches_autodiff():
    """npl = 32 > _UNROLL_LIMIT: the plane folds run chunk-unrolled with
    dynamic SMEM gradient stores (VERDICT r4 missing #3 — the forward already
    rolled planes, the backward asserted npl <= 16)."""
    key = jax.random.PRNGKey(11)
    ks = jax.random.split(key, 4)
    npl = 32
    # tilted planes far enough not to cut the camera; small random tilts keep
    # den away from the eps gates
    origins = jnp.stack([
        jnp.full((npl,), 8.0) + jax.random.uniform(ks[0], (npl,)) * 4.0,
        jax.random.uniform(ks[1], (npl,), minval=-2.0, maxval=2.0),
        jnp.zeros((npl,)),
    ], axis=-1)
    normals = jnp.stack([
        -jnp.ones((npl,)),
        jax.random.uniform(ks[2], (npl,), minval=-0.3, maxval=0.3),
        jax.random.uniform(ks[3], (npl,), minval=-0.3, maxval=0.3),
    ], axis=-1)
    albedo = jax.random.uniform(jax.random.PRNGKey(12), (npl, 3),
                                minval=0.2, maxval=1.0)
    scene = rt.Scene(
        rt.Spheres.build([([3.0, 0.5, 1.0], 0.8, rt.RED),
                          ([2.0, -0.9, 0.5], 0.5, rt.BLUE)]),
        rt.Planes(origin=origins.astype(jnp.float32),
                  normal=normals.astype(jnp.float32),
                  albedo=albedo.astype(jnp.float32)),
        rt.Lights.build([[2.5, -2.0, 3.0], [2.5, 2.0, 3.0]]),
        rt.Materials.build())
    cam = rt.default_camera((16, 16))
    g_ker, g_ref = _grads(cam, scene, depth=1)
    for a, b in [(g_ker.planes.albedo, g_ref.planes.albedo),
                 (g_ker.planes.origin, g_ref.planes.origin),
                 (g_ker.planes.normal, g_ref.planes.normal)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-7)
    for a, b in [(g_ker.spheres.center, g_ref.spheres.center),
                 (g_ker.lights.position, g_ref.lights.position)]:
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-12)
        assert rel < 5e-2, rel
