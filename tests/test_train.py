"""Inverse rendering (BASELINE configs[3]) and checkpoint/resume."""
import dataclasses
import os

import jax.numpy as jnp
import numpy as np
import pytest

import python_ray_tracer_tpu as rt
from python_ray_tracer_tpu import train


def _two_sphere_scene(offset=0.0):
    return rt.Scene(
        rt.Spheres.build([([2.5 + offset, 0.5, 1.0], 0.8, rt.RED),
                          ([1.5, -0.9 + offset, 0.5], 0.5, rt.BLUE)]),
        rt.Planes.build([([5, 0, 0], [0, 0, 1], rt.GREY)]),
        rt.Lights.build([[2.5, -2.0, 3.0], [2.5, 2.0, 3.0]]),
        rt.Materials.build())


def test_fit_sphere_position_recovers():
    cam = rt.default_camera((32, 32))
    target_scene = _two_sphere_scene()
    target = rt.render_image(cam, target_scene, depth=1, aliasing=False)
    init = _two_sphere_scene(offset=0.2)
    fitted, losses = train.fit_scene(init, cam, target, steps=120, lr=5e-3, depth=1,
                                     trainable=("spheres.center",))
    assert losses[-1] < losses[0] * 0.5, losses[::20]
    err0 = np.abs(np.asarray(init.spheres.center - target_scene.spheres.center)).max()
    err1 = np.abs(np.asarray(fitted.spheres.center - target_scene.spheres.center)).max()
    assert err1 < err0 * 0.5, (err0, err1)


def test_trainable_mask_freezes_fields():
    cam = rt.default_camera((16, 16))
    scene = _two_sphere_scene()
    target = rt.render_image(cam, scene, depth=1, aliasing=False) * 0.5
    fitted, _ = train.fit_scene(scene, cam, target, steps=5, lr=5e-2,
                                trainable=("spheres",), depth=1)
    np.testing.assert_array_equal(np.asarray(fitted.lights.position),
                                  np.asarray(scene.lights.position))
    np.testing.assert_array_equal(np.asarray(fitted.materials.lambert),
                                  np.asarray(scene.materials.lambert))
    assert not np.array_equal(np.asarray(fitted.spheres.center),
                              np.asarray(scene.spheres.center))


def test_checkpoint_roundtrip(tmp_path):
    scene = _two_sphere_scene()
    path = os.path.join(tmp_path, "scene.npz")
    rt.save_pytree(path, scene)
    loaded = rt.load_pytree(path, rt.Scene.from_soa(*scene.to_soa()))
    for a, b in zip(np.asarray(loaded.spheres.center),
                    np.asarray(scene.spheres.center)):
        np.testing.assert_allclose(a, b)


def test_checkpoint_path_mismatch_raises(tmp_path):
    """Path-keyed format: loading into a different structure fails loudly
    instead of silently filling positionally-matched leaves (VERDICT r1 #9)."""
    import pytest
    scene = _two_sphere_scene()
    path = os.path.join(tmp_path, "scene.npz")
    rt.save_pytree(path, scene)
    wrong = {"a": np.zeros(3), "b": np.zeros(3)}
    with pytest.raises(ValueError, match="leaf-path mismatch"):
        rt.load_pytree(path, wrong)
    # npz keys are the actual tree paths, not positional leaf_<i> names
    keys = np.load(path).files
    assert not any(k.startswith("leaf_") for k in keys), keys
    assert any("spheres" in k for k in keys), keys


def test_checkpoint_legacy_positional_rejected(tmp_path):
    import pytest
    path = os.path.join(tmp_path, "old.npz")
    np.savez(path, leaf_0=np.zeros(3), leaf_1=np.ones(3))
    with pytest.raises(ValueError, match="legacy positional"):
        rt.load_pytree(path, {"x": np.zeros(3), "y": np.zeros(3)})
    # >= 11 leaves: lexicographic sort puts leaf_10 before leaf_2 — detection
    # must compare as a SET (real scene+optimizer checkpoints exceed 10 leaves)
    big = os.path.join(tmp_path, "old_big.npz")
    np.savez(big, **{f"leaf_{i}": np.zeros(2) for i in range(12)})
    with pytest.raises(ValueError, match="legacy positional"):
        rt.load_pytree(big, {f"k{i}": np.zeros(2) for i in range(12)})


def test_checkpoint_resume_training(tmp_path):
    """Save mid-optimization, reload, and continue — losses keep decreasing."""
    cam = rt.default_camera((16, 16))
    target_scene = _two_sphere_scene()
    target = rt.render_image(cam, target_scene, depth=1, aliasing=False)
    init = _two_sphere_scene(offset=0.25)
    mid, losses1 = train.fit_scene(init, cam, target, steps=10, lr=2e-2, depth=1)
    path = os.path.join(tmp_path, "mid.npz")
    rt.save_pytree(path, mid)
    resumed = rt.load_pytree(path, init)
    _, losses2 = train.fit_scene(resumed, cam, target, steps=10, lr=2e-2, depth=1)
    assert losses2[-1] < losses1[0]


def test_fit_camera_recovers_pose():
    """Inverse rendering w.r.t. the CAMERA (train.fit_camera): recover a
    perturbed pose from a target image. The camera is an analytic
    differentiable pytree (the reference bakes its grid on the host,
    src/camera.py:18-26, so this capability has no analogue there). Exact
    recovery is not expected at this resolution — pose is near-ambiguous along
    translation/rotation trade-off directions — so assert substantial loss and
    pose-error contraction, plus that the fitted rotation stays on SO(3) (the
    fit reconstructs it from Euler angles every step)."""
    scene = rt.Scene(
        rt.Spheres.build([([2.5, 0.5, 1.0], 0.8, rt.RED),
                          ([1.5, -0.9, 0.5], 0.5, rt.BLUE)]),
        rt.Planes.build([([5, 0, 0], [0, 0, 1], rt.GREY)]),
        rt.Lights.build([[2.5, -2.0, 3.0], [2.5, 2.0, 3.0]]),
        rt.Materials.build())
    true_cam = rt.Camera.build((24, 24), [-2.0, 0.0, 2.0], [0.0, -30.0, 0.0])
    target = rt.render_image(true_cam, scene, depth=1, aliasing=False)
    init = rt.Camera.build((24, 24), [-2.1, 0.08, 1.92], [1.5, -27.5, 2.0])

    fitted, losses = train.fit_camera(init, scene, target, steps=150, depth=1)

    assert losses[-1] < losses[0] * 0.35, losses[::30]
    err0 = np.abs(np.asarray(init.position) - np.asarray(true_cam.position)).max()
    err1 = np.abs(np.asarray(fitted.position) - np.asarray(true_cam.position)).max()
    assert err1 < 0.75 * err0, (err0, err1)
    rerr0 = np.abs(np.asarray(init.rotation) - np.asarray(true_cam.rotation)).max()
    rerr1 = np.abs(np.asarray(fitted.rotation) - np.asarray(true_cam.rotation)).max()
    assert rerr1 < 0.75 * rerr0, (rerr0, rerr1)
    R = np.asarray(fitted.rotation)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    # fov stayed frozen by default
    assert float(fitted.fov) == pytest.approx(float(init.fov))


def test_camera_value_and_grad_pallas_matches_jnp():
    """Kernel-speed camera fitting (train.camera_value_and_grad): the fused
    kernel's camera adjoints, chained through euler_rotation to the fit's
    {position, euler, fov} parameterization, match XLA autodiff of the jnp
    loss — so `fit_camera(backend="pallas")` optimizes the same objective."""
    import jax
    import jax.numpy as jnp
    from python_ray_tracer_tpu.models.camera import Camera, euler_rotation

    scene = rt.Scene(
        rt.Spheres.build([([2.5, 0.5, 1.0], 0.8, rt.RED),
                          ([1.5, -0.9, 0.5], 0.5, rt.BLUE)]),
        rt.Planes.build([([5, 0, 0], [0, 0, 1], rt.GREY)]),
        rt.Lights.build([[2.5, -2.0, 3.0], [2.5, 2.0, 3.0]]),
        rt.Materials.build())
    res = (24, 24)
    true_cam = rt.Camera.build(res, [-2.0, 0.0, 2.0], [0.0, -30.0, 0.0])
    target = rt.render_image(true_cam, scene, depth=1, aliasing=False)
    params = {"position": jnp.asarray([-2.1, 0.08, 1.92], jnp.float32),
              "euler": jnp.deg2rad(jnp.asarray([1.5, -27.5, 2.0], jnp.float32)),
              "fov": jnp.float32(45.0)}

    def loss_jnp(p):
        cam = Camera(position=p["position"],
                     rotation=euler_rotation(p["euler"][0], p["euler"][1],
                                             p["euler"][2], is_radians=True),
                     fov=p["fov"], resolution=res)
        img = rt.render_image(cam, scene, depth=1, aliasing=False)
        return jnp.mean((img - target) ** 2)

    l_j, g_j = jax.value_and_grad(loss_jnp)(params)
    vg = train.camera_value_and_grad(scene, target, res, depth=1,
                                     interpret=True)
    l_k, g_k = vg(params)
    np.testing.assert_allclose(float(l_k), float(l_j), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_k["position"]),
                               np.asarray(g_j["position"]), rtol=5e-3,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_k["euler"]),
                               np.asarray(g_j["euler"]), rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_k["fov"]),
                               np.asarray(g_j["fov"]), atol=5e-5)


def test_fit_camera_pallas_backend_converges():
    """fit_camera(backend="pallas"): one fused kernel per step, converges like
    the jnp path on the pose-recovery task."""
    scene = rt.Scene(
        rt.Spheres.build([([2.5, 0.5, 1.0], 0.8, rt.RED),
                          ([1.5, -0.9, 0.5], 0.5, rt.BLUE)]),
        rt.Planes.build([([5, 0, 0], [0, 0, 1], rt.GREY)]),
        rt.Lights.build([[2.5, -2.0, 3.0], [2.5, 2.0, 3.0]]),
        rt.Materials.build())
    true_cam = rt.Camera.build((24, 24), [-2.0, 0.0, 2.0], [0.0, -30.0, 0.0])
    target = rt.render_image(true_cam, scene, depth=1, aliasing=False)
    init = rt.Camera.build((24, 24), [-2.1, 0.08, 1.92], [1.5, -27.5, 2.0])

    fitted, losses = train.fit_camera(init, scene, target, steps=60, depth=1,
                                      backend="pallas", pallas_interpret=True)
    assert losses[-1] < losses[0] * 0.6, losses[::15]
    err0 = np.abs(np.asarray(init.position) - np.asarray(true_cam.position)).max()
    err1 = np.abs(np.asarray(fitted.position) - np.asarray(true_cam.position)).max()
    assert err1 < err0, (err0, err1)
