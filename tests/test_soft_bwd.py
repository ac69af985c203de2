"""Fused soft-visibility backward kernel (ops/pallas/soft_bwd.py): gradient
parity vs XLA autodiff of the jnp soft path, unrolled and rolled, plus the
fused-loss training-step form and the custom_vjp routing."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import python_ray_tracer_tpu as rt
from python_ray_tracer_tpu.ops.soft import render_image_soft
from python_ray_tracer_tpu.ops.pallas.soft_bwd import (
    soft_scene_grads_pallas, soft_loss_and_grads_pallas)

TAU = 0.08


def _scene_small():
    return rt.Scene(
        rt.Spheres.build([([3.0, 0.2, 0.5], 0.8, rt.RED),
                          ([4.0, -0.6, 0.2], 0.6, rt.GREEN),
                          ([5.0, 0.9, -0.3], 1.0, rt.BLUE)]),
        rt.Planes.build([([0.0, 0.0, -1.2], [0.0, 0.0, 1.0], rt.GREY),
                         ([12.0, 0.0, 0.0], [-1.0, 0.1, 0.05], rt.YELLOW)]),
        rt.Lights.build([[0.0, 3.0, 5.0], [-2.0, -4.0, 6.0]]),
        rt.Materials.build(ambient=0.15, lambert=0.7))


def _assert_scene_grads_close(got, want, rtol=5e-3, atol=5e-6):
    pairs = [
        ("spheres.center", got.spheres.center, want.spheres.center),
        ("spheres.radius", got.spheres.radius, want.spheres.radius),
        ("spheres.albedo", got.spheres.albedo, want.spheres.albedo),
        ("planes.origin", got.planes.origin, want.planes.origin),
        ("planes.normal", got.planes.normal, want.planes.normal),
        ("planes.albedo", got.planes.albedo, want.planes.albedo),
        ("lights.position", got.lights.position, want.lights.position),
        ("materials.ambient", got.materials.ambient, want.materials.ambient),
        ("materials.lambert", got.materials.lambert, want.materials.lambert),
    ]
    for name, a, b in pairs:
        # scale atol by the leaf's own magnitude (grads span orders of
        # magnitude; reassociation noise is relative to the accumulated sum)
        scale = max(float(jnp.max(jnp.abs(b))), 1.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol,
                                   atol=atol * scale, err_msg=name)
    # the soft scope has no mirror bounces / Phong: those slots must be zero
    assert float(got.materials.reflection) == 0.0
    assert float(got.materials.specular) == 0.0


def test_soft_bwd_matches_jnp_vjp_small():
    """Unrolled scene: kernel grads == jax.vjp of the jnp path, incl. camera."""
    cam = rt.default_camera((24, 16))
    scene = _scene_small()
    g = jax.random.normal(jax.random.PRNGKey(0), (24, 16, 3), jnp.float32)
    _, vjp = jax.vjp(lambda c, s: render_image_soft(c, s, tau=TAU), cam, scene)
    cam_j, scn_j = vjp(g)
    scn_k, cam_k = soft_scene_grads_pallas(cam, scene, g, tau=TAU,
                                           interpret=True, return_camera=True)
    _assert_scene_grads_close(scn_k, scn_j)
    np.testing.assert_allclose(np.asarray(cam_k.position),
                               np.asarray(cam_j.position), rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cam_k.rotation),
                               np.asarray(cam_j.rotation), rtol=5e-3,
                               atol=1e-3)
    # fov is a heavily-cancelling lane sum: absolute tolerance only
    np.testing.assert_allclose(np.asarray(cam_k.fov), np.asarray(cam_j.fov),
                               atol=3e-5)


@pytest.mark.slow  # ~5 min: chunked-fold interpret trace at ns=30
def test_soft_bwd_matches_jnp_vjp_rolled():
    """ns=30 > _UNROLL_LIMIT: chunk-unrolled fori folds with dynamic SMEM
    gradient accumulation."""
    cam = rt.default_camera((16, 16))
    scene = rt.random_scene(jax.random.PRNGKey(3), n_spheres=30)
    g = jax.random.normal(jax.random.PRNGKey(1), (16, 16, 3), jnp.float32)
    _, vjp = jax.vjp(lambda c, s: render_image_soft(c, s, tau=TAU), cam, scene)
    _, scn_j = vjp(g)
    scn_k = soft_scene_grads_pallas(cam, scene, g, tau=TAU, interpret=True)
    _assert_scene_grads_close(scn_k, scn_j)


@pytest.mark.slow  # the fit test drives the fused kernel end-to-end in 8 s
def test_soft_bwd_fused_loss_step():
    """Fused single-kernel training step: loss == jnp MSE, grads == jax.grad."""
    cam = rt.default_camera((24, 16))
    scene = _scene_small()
    target = jax.random.uniform(jax.random.PRNGKey(2), (24, 16, 3), jnp.float32)

    def loss_jnp(s):
        return jnp.mean((render_image_soft(cam, s, tau=TAU) - target) ** 2)

    l_j, g_j = jax.value_and_grad(loss_jnp)(scene)
    l_k, g_k = soft_loss_and_grads_pallas(cam, scene, target, tau=TAU,
                                          interpret=True)
    np.testing.assert_allclose(float(l_k), float(l_j), rtol=1e-5)
    _assert_scene_grads_close(g_k, g_j)


@pytest.mark.slow  # the fit test covers the same routing end-to-end
def test_soft_fast_custom_vjp_routes_through_kernel():
    """render_image_soft_fast's backward is the fused kernel (not jnp-vjp) and
    still matches XLA autodiff of the jnp path through an arbitrary loss."""
    from python_ray_tracer_tpu.ops.pallas.soft_pallas import (
        render_image_soft_fast)
    cam = rt.default_camera((24, 16))
    scene = _scene_small()
    w = jax.random.normal(jax.random.PRNGKey(4), (24, 16, 3), jnp.float32)

    def loss_fast(s):
        return jnp.sum(render_image_soft_fast(cam, s, TAU, True) * w)

    def loss_jnp(s):
        return jnp.sum(render_image_soft(cam, s, tau=TAU) * w)

    g_f = jax.grad(loss_fast)(scene)
    g_j = jax.grad(loss_jnp)(scene)
    _assert_scene_grads_close(g_f, g_j)


def test_soft_bwd_degenerate_occlusion_no_nans():
    """Saturated coverage (deep occlusion -> sigmoid == 1.0 in f32) and an
    opaque plane in front (exact zero compositing factor) poison no adjoints:
    the sigmoid-fused adjoint identities are exact at both extremes."""
    cam = rt.default_camera((16, 16))
    scene = rt.Scene(
        # big sphere dead ahead fully occluding a second one behind it
        rt.Spheres.build([([3.0, 0.0, 0.0], 1.4, rt.RED),
                          ([8.0, 0.0, 0.0], 1.0, rt.GREEN)]),
        # plane right in front of the camera: w == 0 for everything behind
        rt.Planes.build([([1.0, 0.0, 0.0], [-1.0, 0.0, 0.0], rt.GREY)]),
        rt.Lights.build([[0.0, 0.0, 8.0]]),
        rt.Materials.build(ambient=0.2, lambert=0.6))
    g = jnp.ones((16, 16, 3), jnp.float32)
    scn_k, cam_k = soft_scene_grads_pallas(cam, scene, g, tau=0.02,
                                           interpret=True, return_camera=True)
    for leaf in jax.tree_util.tree_leaves((scn_k, cam_k)):
        assert np.isfinite(np.asarray(leaf)).all()
    # parity with jnp autodiff at the degenerate point too
    _, vjp = jax.vjp(lambda c, s: render_image_soft(c, s, tau=0.02), cam, scene)
    _, scn_j = vjp(g)
    _assert_scene_grads_close(scn_k, scn_j)


def test_soft_fit_scene_pallas_backend_converges():
    """fit_scene_soft(backend="pallas") pulls the whole step through the
    kernels (forward via soft_pallas, backward via soft_bwd) and still
    recovers a perturbed sphere center."""
    from python_ray_tracer_tpu import train
    cam = rt.default_camera((32, 32))
    target_scene = rt.Scene(
        rt.Spheres.build([([4.0, 0.0, 0.8], 1.0, rt.RED)]),
        rt.Planes.build([([0.0, 0.0, -1.0], [0.0, 0.0, 1.0], rt.GREY)]),
        rt.Lights.build([[0.0, 2.0, 6.0]]),
        rt.Materials.build(ambient=0.3, lambert=0.6))
    init = dataclasses.replace(
        target_scene,
        spheres=dataclasses.replace(
            target_scene.spheres,
            center=target_scene.spheres.center + jnp.asarray([[0.0, 0.9, 0.4]])))
    fitted, losses = train.fit_scene_soft(
        init, cam, target_scene, steps=40, lr=5e-2,
        taus=(0.15, 0.05), trainable=("spheres.center",), backend="pallas",
        interpret=True)
    err0 = float(jnp.abs(init.spheres.center
                         - target_scene.spheres.center).max())
    err1 = float(jnp.abs(fitted.spheres.center
                         - target_scene.spheres.center).max())
    assert err1 < 0.35 * err0, (err0, err1)


@pytest.mark.slow  # ~65 s interpret trace; same fold machinery as spheres
def test_soft_bwd_rolled_planes():
    """npl = 20 > _UNROLL_LIMIT: soft forward AND backward run the plane
    folds chunk-rolled (dynamic SMEM reads + dynamic gradient stores) — the
    last plane-count cliff in the kernel stack (VERDICT r4 missing #3)."""
    npl = 20
    key = jax.random.PRNGKey(5)
    ks = jax.random.split(key, 4)
    origins = jnp.stack([
        jnp.full((npl,), 7.0) + jax.random.uniform(ks[0], (npl,)) * 5.0,
        jax.random.uniform(ks[1], (npl,), minval=-2.0, maxval=2.0),
        jnp.zeros((npl,)),
    ], axis=-1)
    normals = jnp.stack([
        -jnp.ones((npl,)),
        jax.random.uniform(ks[2], (npl,), minval=-0.3, maxval=0.3),
        jax.random.uniform(ks[3], (npl,), minval=-0.3, maxval=0.3),
    ], axis=-1)
    albedo = jax.random.uniform(jax.random.PRNGKey(6), (npl, 3),
                                minval=0.2, maxval=1.0)
    scene = rt.Scene(
        rt.Spheres.build([([3.0, 0.2, 0.5], 0.8, rt.RED),
                          ([4.0, -0.6, 0.2], 0.6, rt.GREEN)]),
        rt.Planes(origin=origins.astype(jnp.float32),
                  normal=normals.astype(jnp.float32),
                  albedo=albedo.astype(jnp.float32)),
        rt.Lights.build([[0.0, 3.0, 5.0]]),
        rt.Materials.build(ambient=0.15, lambert=0.7))
    cam = rt.default_camera((16, 16))
    # forward parity
    from python_ray_tracer_tpu.ops.pallas.soft_pallas import (
        render_image_soft_pallas)
    img_k = render_image_soft_pallas(cam, scene, tau=TAU, interpret=True)
    img_j = render_image_soft(cam, scene, tau=TAU)
    np.testing.assert_allclose(np.asarray(img_k), np.asarray(img_j),
                               rtol=1e-4, atol=1e-5)
    # backward parity
    g = jax.random.normal(jax.random.PRNGKey(7), (16, 16, 3), jnp.float32)
    _, vjp = jax.vjp(lambda c, s: render_image_soft(c, s, tau=TAU), cam, scene)
    _, scn_j = vjp(g)
    scn_k = soft_scene_grads_pallas(cam, scene, g, tau=TAU, interpret=True)
    _assert_scene_grads_close(scn_k, scn_j)


@pytest.mark.slow  # 42 s: 17-light unrolled jnp trace
def test_soft_fast_exotic_light_count_falls_back_to_jnp():
    """>16 lights: the adjoint kernel unrolls lights, so the custom_vjp
    backward falls back to jnp autodiff instead of crashing (round-5 review
    regression: the kernel's nl assert fired at trace time)."""
    import dataclasses
    from python_ray_tracer_tpu.ops.pallas.soft_pallas import (
        render_image_soft_fast)
    base = _scene_small()
    lts = jax.random.uniform(jax.random.PRNGKey(9), (17, 3),
                             minval=-4.0, maxval=4.0) + jnp.asarray([0, 0, 6.0])
    scene = dataclasses.replace(base, lights=rt.Lights(lts.astype(jnp.float32)))
    cam = rt.default_camera((16, 16))

    def loss_fast(s):
        return jnp.mean(render_image_soft_fast(cam, s, TAU, True) ** 2)

    def loss_jnp(s):
        return jnp.mean(render_image_soft(cam, s, tau=TAU) ** 2)

    g_f = jax.grad(loss_fast)(scene)
    g_j = jax.grad(loss_jnp)(scene)
    _assert_scene_grads_close(g_f, g_j)


@pytest.mark.slow  # ~2 min (3 interpret kernel traces); dryrun_multichip
# asserts the sharded==single invariant, which subsumes slicing, every round
def test_soft_fused_loss_slices_sum_to_full():
    """Ray-DP slices of the fused soft step: per-slice loss partials (GLOBAL
    denominator) and gradients must sum to the full-image values — the
    sharded soft training psum's invariant."""
    cam = rt.default_camera((16, 16))
    scene = _scene_small()
    target = jax.random.uniform(jax.random.PRNGKey(8), (16, 16, 3), jnp.float32)
    kw = dict(tau=TAU, interpret=True)
    lf, gf = soft_loss_and_grads_pallas(cam, scene, target, **kw)
    ll, gl = soft_loss_and_grads_pallas(cam, scene, target[:8],
                                        x_offset=0.0, local_width=8, **kw)
    lh, gh = soft_loss_and_grads_pallas(cam, scene, target[8:],
                                        x_offset=8.0, local_width=8, **kw)
    np.testing.assert_allclose(float(ll) + float(lh), float(lf), rtol=1e-5)
    for a, b, c in zip(jax.tree_util.tree_leaves(gf),
                       jax.tree_util.tree_leaves(gl),
                       jax.tree_util.tree_leaves(gh)):
        np.testing.assert_allclose(np.asarray(b) + np.asarray(c),
                                   np.asarray(a), rtol=1e-4, atol=1e-6)


@pytest.mark.slow  # dryrun_multichip asserts the same equality per round
def test_soft_sharded_value_and_grad_matches_single():
    """soft_value_and_grad_sharded over the 8-virtual-device mesh == the
    single-device fused soft step (exactly two psums)."""
    from python_ray_tracer_tpu import train
    from python_ray_tracer_tpu.parallel.mesh import make_mesh, image_sharding
    mesh = make_mesh(jax.devices()[:8])
    cam = rt.default_camera((32, 16))
    scene = _scene_small()
    target = jax.random.uniform(jax.random.PRNGKey(10), (32, 16, 3),
                                jnp.float32)
    vg = train.soft_value_and_grad_sharded(cam, mesh, tau=TAU,
                                           pallas_interpret=True)
    l_sh, g_sh = vg(scene, jax.device_put(target, image_sharding(mesh)))
    l_1, g_1 = soft_loss_and_grads_pallas(cam, scene, target, tau=TAU,
                                          interpret=True)
    np.testing.assert_allclose(float(l_sh), float(l_1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_sh),
                    jax.tree_util.tree_leaves(g_1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)


@pytest.mark.slow  # 8-shard interpret trace x several steps
def test_soft_fit_sharded_converges():
    """fit_scene_soft(backend="pallas", mesh=...): the sharded fused soft
    step drives the anneal end-to-end."""
    from python_ray_tracer_tpu import train
    from python_ray_tracer_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(jax.devices()[:4])
    cam = rt.default_camera((32, 32))
    target_scene = rt.Scene(
        rt.Spheres.build([([4.0, 0.0, 0.8], 1.0, rt.RED)]),
        rt.Planes.build([([0.0, 0.0, -1.0], [0.0, 0.0, 1.0], rt.GREY)]),
        rt.Lights.build([[0.0, 2.0, 6.0]]),
        rt.Materials.build(ambient=0.3, lambert=0.6))
    init = dataclasses.replace(
        target_scene,
        spheres=dataclasses.replace(
            target_scene.spheres,
            center=target_scene.spheres.center + jnp.asarray([[0.0, 0.8, 0.3]])))
    fitted, losses = train.fit_scene_soft(
        init, cam, target_scene, steps=20, lr=5e-2, taus=(0.1,),
        trainable=("spheres.center",), backend="pallas", interpret=True,
        mesh=mesh)
    err0 = float(jnp.abs(init.spheres.center
                         - target_scene.spheres.center).max())
    err1 = float(jnp.abs(fitted.spheres.center
                         - target_scene.spheres.center).max())
    assert err1 < 0.6 * err0, (err0, err1)


@pytest.mark.slow  # ~3 random draws x ~40 s interpret traces
def test_soft_bwd_fuzz_parity():
    """Randomized scenes (geometry, materials, light counts): kernel grads ==
    jnp autodiff — the soft analogue of the hard path's fuzz net."""
    for seed in (21, 22, 23):
        key = jax.random.PRNGKey(seed)
        ks = jax.random.split(key, 8)
        ns = int(jax.random.randint(ks[0], (), 2, 6))
        nl = int(jax.random.randint(ks[1], (), 1, 4))
        centers = jax.random.uniform(ks[2], (ns, 3), minval=-2.0, maxval=2.0) \
            + jnp.asarray([4.0, 0.0, 1.0])
        radii = jax.random.uniform(ks[3], (ns,), minval=0.3, maxval=1.0)
        albedo = jax.random.uniform(ks[4], (ns, 3), minval=0.1, maxval=1.0)
        lpos = jax.random.uniform(ks[5], (nl, 3), minval=-4.0, maxval=4.0) \
            + jnp.asarray([0.0, 0.0, 6.0])
        scene = rt.Scene(
            rt.Spheres(centers.astype(jnp.float32), radii.astype(jnp.float32),
                       albedo.astype(jnp.float32)),
            rt.Planes.build([([0.0, 0.0, -1.0], [0.0, 0.05, 1.0], rt.GREY)]),
            rt.Lights(lpos.astype(jnp.float32)),
            rt.Materials.build(
                ambient=float(jax.random.uniform(ks[6], (), minval=0.0,
                                                 maxval=0.4)),
                lambert=float(jax.random.uniform(ks[7], (), minval=0.3,
                                                 maxval=0.9))))
        cam = rt.default_camera((16, 16))
        g = jax.random.normal(jax.random.PRNGKey(seed + 100), (16, 16, 3),
                              jnp.float32)
        _, vjp = jax.vjp(lambda c, s: render_image_soft(c, s, tau=TAU), cam,
                         scene)
        _, scn_j = vjp(g)
        scn_k = soft_scene_grads_pallas(cam, scene, g, tau=TAU, interpret=True)
        _assert_scene_grads_close(scn_k, scn_j)


@pytest.mark.slow  # two rolled interpret traces (~40 s each) at ns=18
def test_soft_bwd_slab_accumulation_matches_direct():
    """RT_SOFT_SLAB_ACC=1: per-occluder VMEM slab accumulation (one flush
    reduction per slot per grid step) must be a pure reassociation of the
    direct per-(object, occluder) SMEM accumulation — same grads to f32
    reassociation tolerance, and the slab tile fits the VMEM budget (the
    tile-width shrink in _soft_grads_pallas)."""
    import python_ray_tracer_tpu.ops.pallas.soft_bwd as sb
    cam = rt.default_camera((16, 16))
    scene = rt.random_scene(jax.random.PRNGKey(5), n_spheres=18)
    g = jax.random.normal(jax.random.PRNGKey(2), (16, 16, 3), jnp.float32)
    # the flag is read at trace time and the jit cache ignores module
    # globals — clear around each flip (verify-skill rule: never flip such
    # a flag within one process without invalidating the cache)
    old = sb._SLAB_ACC
    results = {}
    try:
        for flag in (False, True):
            sb._soft_grads_pallas.clear_cache()
            sb._SLAB_ACC = flag
            results[flag] = soft_scene_grads_pallas(cam, scene, g, tau=TAU,
                                                    interpret=True)
    finally:
        sb._SLAB_ACC = old
        sb._soft_grads_pallas.clear_cache()
    _assert_scene_grads_close(results[True], results[False])
