"""Inverse rendering: fit scene parameters to a target image by gradient descent.

BASELINE configs[3] ("differentiable inverse render: fit sphere positions/albedos to
target image via pixel-grad descent"). The reference has no backward pass at all —
this subsystem exists only in the TPU build. The training step is one jitted
function: render -> pixel MSE -> ``jax.grad`` w.r.t. the scene pytree -> optax
update. On a mesh, the loss comes from :mod:`.parallel.render_sharded` and scene
gradients are ``psum``-all-reduced over ICI inside the same jitted step.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from .models.scene import Scene
from .ops.render import render_image
from .parallel.render_sharded import make_loss_fn
from .utils.metrics import MetricsLogger


def pixel_loss(camera, target, *, depth: int = 2, aliasing: bool = False,
               compat: bool = True, row_chunk: Optional[int] = None) -> Callable:
    """Single-device ``loss(scene) -> scalar`` mean-squared pixel error."""
    def loss(scene):
        img = render_image(camera, scene, depth=depth, aliasing=aliasing,
                           compat=compat, row_chunk=row_chunk)
        return jnp.mean((img - target) ** 2)
    return loss


def soft_pixel_loss(camera, target, *, tau: float = 0.05,
                    row_chunk: Optional[int] = None, backend: str = "jnp",
                    interpret: bool = False, bounce_depth: int = 0) -> Callable:
    """Silhouette-aware loss via the soft-visibility renderer (ops/soft.py).

    The target should be produced by :func:`soft_pixel_target` (same renderer) so
    the residual isn't dominated by the soft/hard appearance gap.

    ``backend="pallas"`` runs the WHOLE ``value_and_grad`` at kernel speed:
    forward via the fused soft kernel, backward via its custom_vjp's
    hand-derived adjoint kernel (ops/pallas/soft_bwd.py). Round 4's jnp-vjp
    backward made the step a wash (199 vs 196 ms at 100 spheres / 128^2);
    the fused backward removes the jnp re-render entirely.

    ``bounce_depth=1`` adds the depth-1 mirror bounce (reflection-coefficient
    fitting — ops/soft.py); the fused kernels cover primary visibility only,
    so the bounce always renders through the jnp path."""
    from .ops.soft import render_image_soft

    if backend == "pallas" and bounce_depth == 0:
        from .ops.pallas.soft_pallas import render_image_soft_fast

        def loss(scene):
            img = render_image_soft_fast(camera, scene, tau, interpret)
            return jnp.mean((img - target) ** 2)
        return loss

    def loss(scene):
        img = render_image_soft(camera, scene, tau=tau, row_chunk=row_chunk,
                                bounce_depth=bounce_depth)
        return jnp.mean((img - target) ** 2)
    return loss


def _mask_grads(grads: Scene, trainable: Optional[Sequence[str]]) -> Scene:
    """Zero out gradients for non-trainable scene fields.

    ``trainable`` entries are either top-level field names (``"spheres"``) or dotted
    leaf paths (``"spheres.center"``); anything not covered is frozen.
    """
    if trainable is None:
        return grads
    tops = {t for t in trainable if "." not in t}
    leaves = {tuple(t.split(".")) for t in trainable if "." in t}
    updates = {}
    for f in dataclasses.fields(grads):
        if f.name in tops:
            continue
        sub = getattr(grads, f.name)
        sub_updates = {}
        for sf in dataclasses.fields(sub):
            if (f.name, sf.name) not in leaves:
                sub_updates[sf.name] = jax.tree_util.tree_map(
                    jnp.zeros_like, getattr(sub, sf.name))
        if sub_updates:
            updates[f.name] = dataclasses.replace(sub, **sub_updates)
    return dataclasses.replace(grads, **updates) if updates else grads


def pallas_value_and_grad(camera, target, *, depth: int = 2, compat: bool = True,
                          aliasing: bool = False, cheap_shadow: bool = True,
                          fused: bool = True):
    """``scene -> (loss, grads)`` built from the fused forward + fused backward
    Mosaic kernels (ops/pallas) — the speed-of-light training path.

    MSE pixel loss; grads cover the full scene pytree (camera cotangents are not
    applied here — see ops/pallas/render_bwd.py ``return_camera``).

    ``cheap_shadow`` defaults to the sqrt-free shadow sweep: the scene is
    traced inside this function so the per-scene exactness guard cannot run
    here — callers with a concrete scene should pass
    ``_shadow_cheap_ok(scene, compat)`` (fit_scene does); only compat scenes
    with sphere radii >= FAR/2 need the ``False`` root-form fallback.

    ``fused=True`` (default) runs the fully-fused training step: ONE kernel
    renders, forms the MSE cotangent in-registers, and reverse-sweeps (no
    separate forward render, no image/cotangent HBM round trip) — measured
    3.90 -> 2.84 ms per no-AA 1080p depth-2 step on v5e (100-sphere: 37.0 ->
    24.2 ms); the AA form fuses the shared-sample chains the same way.
    ``fused=False`` keeps the two-pass step (render + backward) for
    comparison benchmarks.
    """
    from .ops.pallas.render_pallas import render_image_pallas
    from .ops.pallas.render_bwd import (scene_grads_pallas,
                                        loss_and_scene_grads_pallas)

    if fused:
        def value_and_grad(scene):
            return loss_and_scene_grads_pallas(camera, scene, target,
                                               depth=depth, compat=compat,
                                               aliasing=aliasing,
                                               cheap_shadow=cheap_shadow)
        return value_and_grad

    def value_and_grad(scene):
        img = render_image_pallas(camera, scene, depth=depth, aliasing=aliasing,
                                  compat=compat, cheap_shadow=cheap_shadow)
        diff = img - target
        loss = jnp.mean(diff ** 2)
        g_img = 2.0 * diff / diff.size
        grads = scene_grads_pallas(camera, scene, g_img, depth=depth,
                                   compat=compat, aliasing=aliasing,
                                   cheap_shadow=cheap_shadow)
        return loss, grads

    return value_and_grad


def pallas_value_and_grad_sharded(camera, mesh, *, depth: int = 2,
                                  compat: bool = True, aliasing: bool = False,
                                  axis: str = "rays",
                                  pallas_interpret: bool = False,
                                  cheap_shadow: bool = True):
    """``(scene, target) -> (loss, grads)`` over a device mesh: ray-DP with the
    fused Mosaic kernels on every shard.

    Each device renders its vertical slice of the image (analytic ray
    generation in the global pixel index — zero-communication forward, see
    parallel/render_sharded.py), forms its slice of the MSE cotangent, and
    runs the fused backward on that slice; the per-shard scene gradients and
    loss partials are ``psum``-all-reduced over ICI. The *only* collectives in
    the whole training step are those two psums. ``target`` must be sharded
    over its leading (width) axis; the shard count must divide the width.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from .ops.pallas.render_bwd import loss_and_scene_grads_pallas

    W, H = camera.resolution
    n = mesh.shape[axis]
    assert W % n == 0, f"width {W} must divide over {n} shards"
    rows_per = W // n

    def shard_fn(scene, target):
        i = jax.lax.axis_index(axis)
        x0 = (i * rows_per).astype(jnp.float32)
        # Fully-fused step per shard (AA or not): the kernel's loss partial
        # already carries the GLOBAL denominator, so the psum of shard
        # partials IS the full-image MSE. Exactly two collectives.
        loss_part, grads = loss_and_scene_grads_pallas(
            camera, scene, target, depth=depth, compat=compat,
            aliasing=aliasing, cheap_shadow=cheap_shadow, x_offset=x0,
            local_width=rows_per, interpret=pallas_interpret)
        loss = jax.lax.psum(loss_part, axis)
        grads = jax.tree_util.tree_map(lambda g: jax.lax.psum(g, axis),
                                       grads)
        return loss, grads

    # check_vma=False: pallas_call outputs carry no vma annotation
    return shard_map(shard_fn, mesh=mesh,
                     in_specs=(P(), P(axis)), out_specs=(P(), P()),
                     check_vma=False)


def soft_value_and_grad_sharded(camera, mesh, *, tau: float = 0.05,
                                axis: str = "rays",
                                pallas_interpret: bool = False):
    """``(scene, target) -> (loss, grads)`` over a device mesh for the SOFT
    training step: ray-DP with the fused soft kernels on every shard.

    The exact shape of :func:`pallas_value_and_grad_sharded` applied to the
    optimization renderer: each device runs the fully-fused soft step
    (soft_bwd.soft_loss_and_grads_pallas) on its vertical slice — analytic
    ray generation at the global pixel index, zero-communication forward —
    and the per-shard scene gradients and loss partials are ``psum``'d over
    ICI. The loss partial carries the GLOBAL denominator, so the psum IS the
    full-image MSE. ``target`` must be sharded over its leading (width) axis.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from .ops.pallas.soft_bwd import soft_loss_and_grads_pallas

    W, H = camera.resolution
    n = mesh.shape[axis]
    assert W % n == 0, f"width {W} must divide over {n} shards"
    rows_per = W // n

    def shard_fn(scene, target):
        i = jax.lax.axis_index(axis)
        x0 = (i * rows_per).astype(jnp.float32)
        loss_part, grads = soft_loss_and_grads_pallas(
            camera, scene, target, tau=tau, x_offset=x0,
            local_width=rows_per, interpret=pallas_interpret)
        loss = jax.lax.psum(loss_part, axis)
        grads = jax.tree_util.tree_map(lambda g: jax.lax.psum(g, axis),
                                       grads)
        return loss, grads

    return shard_map(shard_fn, mesh=mesh,
                     in_specs=(P(), P(axis)), out_specs=(P(), P()),
                     check_vma=False)


def make_train_step(loss_fn: Callable, optimizer: optax.GradientTransformation,
                    trainable: Optional[Sequence[str]] = None,
                    value_and_grad: Optional[Callable] = None):
    """Jitted ``(scene, opt_state) -> (scene, opt_state, loss)`` step.

    Pass either ``loss_fn`` (differentiated by XLA) or an explicit
    ``value_and_grad`` (e.g. :func:`pallas_value_and_grad`).
    """
    vg = value_and_grad if value_and_grad is not None else \
        jax.value_and_grad(loss_fn)

    @jax.jit
    def step(scene, opt_state):
        loss, grads = vg(scene)
        grads = _mask_grads(grads, trainable)
        updates, opt_state = optimizer.update(grads, opt_state, scene)
        scene = optax.apply_updates(scene, updates)
        return scene, opt_state, loss

    return step


def fit_scene(init_scene: Scene, camera, target, *, steps: int = 200,
              lr: float = 2e-2, depth: int = 2, aliasing: bool = False,
              compat: bool = True, trainable: Optional[Sequence[str]] = ("spheres",),
              mesh=None, backend: str = "jnp",
              logger: Optional[MetricsLogger] = None, log_every: int = 20):
    """Run the inverse-render optimization; returns ``(scene, losses)``.

    ``trainable`` selects which top-level scene fields receive updates (default:
    sphere geometry/albedo, matching configs[3]); the rest stay frozen.
    ``backend="pallas"`` uses the fused forward+backward Mosaic kernels; with a
    ``mesh`` the step runs ray-DP sharded (fused kernels per shard, psum'd
    loss/grads — :func:`pallas_value_and_grad_sharded`).
    """
    vg = None
    if backend == "pallas":
        # init_scene is concrete here: resolve the sqrt-free shadow-sweep
        # exactness guard per scene (False only for compat radii >= FAR/2)
        from .ops.pallas.render_pallas import _shadow_cheap_ok
        cheap = _shadow_cheap_ok(init_scene, compat)
        if mesh is not None:
            vg_st = pallas_value_and_grad_sharded(camera, mesh, depth=depth,
                                                  compat=compat,
                                                  aliasing=aliasing,
                                                  cheap_shadow=cheap)
            vg = lambda scene: vg_st(scene, target)
        else:
            vg = pallas_value_and_grad(camera, target, depth=depth,
                                       compat=compat, aliasing=aliasing,
                                       cheap_shadow=cheap)
        loss_fn = None
    elif mesh is not None:
        loss_fn = make_loss_fn(camera, target, mesh, depth=depth,
                               aliasing=aliasing, compat=compat)
    else:
        loss_fn = pixel_loss(camera, target, depth=depth, aliasing=aliasing,
                             compat=compat)
    optimizer = optax.adam(lr)
    step = make_train_step(loss_fn, optimizer, trainable, value_and_grad=vg)
    opt_state = optimizer.init(init_scene)
    scene = init_scene
    losses = []
    for i in range(steps):
        scene, opt_state, loss = step(scene, opt_state)
        losses.append(float(loss))
        if logger is not None and (i % log_every == 0 or i == steps - 1):
            logger.log(i, loss=float(loss))
    return scene, losses


def camera_value_and_grad(scene, target, resolution, *, depth: int = 1,
                          compat: bool = True, aliasing: bool = False,
                          cheap_shadow: Optional[bool] = None,
                          interpret: bool = False):
    """``params -> (loss, grads)`` for CAMERA-pose inverse rendering through
    the fused Mosaic kernels (ops/pallas/render_bwd.py ``return_camera``).

    ``params`` is :func:`fit_camera`'s pytree ``{position, euler, fov}``; the
    rotation-matrix cotangent from the kernel is chained to Euler angles with
    ``jax.vjp`` of ``euler_rotation`` (a 3x3 host-side Jacobian — negligible
    next to the render). One fused kernel per step: forward render, in-kernel
    MSE against ``target``, reverse sweep, camera adjoints.
    """
    from .models.camera import Camera, euler_rotation
    from .ops.pallas.render_bwd import loss_and_scene_grads_pallas
    from .ops.pallas.render_pallas import _shadow_cheap_ok

    if cheap_shadow is None:
        cheap_shadow = _shadow_cheap_ok(scene, compat)

    def vg(p):
        cam = Camera(position=p["position"],
                     rotation=euler_rotation(p["euler"][0], p["euler"][1],
                                             p["euler"][2], is_radians=True),
                     fov=p["fov"], resolution=resolution)
        loss, _scene_g, cam_g = loss_and_scene_grads_pallas(
            cam, scene, target, depth=depth, compat=compat, aliasing=aliasing,
            cheap_shadow=cheap_shadow, return_camera=True, interpret=interpret)
        _, vjp_e = jax.vjp(
            lambda e: euler_rotation(e[0], e[1], e[2], is_radians=True),
            p["euler"])
        (euler_g,) = vjp_e(cam_g.rotation)
        return loss, {"position": cam_g.position, "euler": euler_g,
                      "fov": cam_g.fov}

    return vg


def fit_camera(init_camera, scene, target, *, steps: int = 300,
               lr: float = 1e-2, depth: int = 1, aliasing: bool = False,
               compat: bool = True, fit_fov: bool = False,
               logger: Optional[MetricsLogger] = None, log_every: int = 20,
               backend: str = "jnp", pallas_interpret: bool = False):
    """Inverse rendering w.r.t. the CAMERA: recover pose from a target image.

    The dual of :func:`fit_scene` (scene fixed, camera free) — a capability the
    reference cannot express (its camera grid is baked on the host,
    reference src/camera.py:18-26; ours is an analytic differentiable pytree).
    Optimizes position + Euler angles (rotation re-orthonormalized every step
    by reconstruction through ``euler_rotation``, so the fit stays on SO(3))
    and optionally fov. Camera gradients are smooth almost everywhere: pose
    perturbations move shading continuously except at silhouette pixels, so
    small pose errors fit well even with hard visibility.

    ``init_camera``'s rotation is assumed to come from ``Camera.build`` /
    ``euler_rotation``; the initial Euler angles are re-derived from the matrix
    (ZYX convention, reference rotation.py:34-43).

    ``backend="pallas"`` runs each step as ONE fused kernel (render + in-kernel
    MSE + reverse sweep + camera adjoints — :func:`camera_value_and_grad`)
    instead of XLA autodiff of the jnp path; gradients match the jnp path to
    f32 tolerance (tests/test_train.py).

    Returns ``(fitted_camera, losses)``.
    """
    from .models.camera import Camera, euler_rotation

    R = init_camera.rotation
    # Invert euler_rotation = Rz(yaw) @ Ry(pitch) @ Rx(roll) with the
    # reference's TRANSPOSED Ry (rotation.py:18-20: Ry_ref(t) = Ry_std(-t)),
    # which flips the standard ZYX extraction to R[2,0] = +sin(pitch).
    # Verified exact (<1e-7) over 200 random poses, |angles| < 1.2 rad.
    pitch0 = jnp.arcsin(jnp.clip(R[2, 0], -1.0, 1.0))
    yaw0 = jnp.arctan2(R[1, 0], R[0, 0])
    roll0 = jnp.arctan2(R[2, 1], R[2, 2])
    params = {
        "position": jnp.asarray(init_camera.position, jnp.float32),
        "euler": jnp.stack([roll0, pitch0, yaw0]).astype(jnp.float32),
        "fov": jnp.asarray(init_camera.fov, jnp.float32),
    }
    resolution = init_camera.resolution

    def camera_of(p):
        return Camera(position=p["position"],
                      rotation=euler_rotation(p["euler"][0], p["euler"][1],
                                              p["euler"][2], is_radians=True),
                      fov=p["fov"], resolution=resolution)

    def loss_fn(p):
        img = render_image(camera_of(p), scene, depth=depth, aliasing=aliasing,
                           compat=compat)
        return jnp.mean((img - target) ** 2)

    if backend == "pallas":
        vg = camera_value_and_grad(scene, target, resolution, depth=depth,
                                   compat=compat, aliasing=aliasing,
                                   interpret=pallas_interpret)
    else:
        vg = jax.value_and_grad(loss_fn)

    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(p, opt_state):
        loss, grads = vg(p)
        if not fit_fov:
            grads = {**grads, "fov": jnp.zeros_like(grads["fov"])}
        updates, opt_state = optimizer.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    losses = []
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
        if logger is not None and (i % log_every == 0 or i == steps - 1):
            logger.log(i, loss=float(loss))
    return camera_of(params), losses


def fit_scene_soft(init_scene: Scene, camera, target_scene: Scene, *,
                   steps: int = 200, lr: float = 1e-2,
                   taus: Sequence[float] = (0.15, 0.05, 0.02),
                   trainable: Optional[Sequence[str]] = ("spheres.center",),
                   logger: Optional[MetricsLogger] = None,
                   backend: str = "jnp", interpret: bool = False,
                   bounce_depth: int = 0, mesh=None):
    """Coarse-to-fine soft-visibility fitting (anneal ``tau`` toward hard).

    At each ``tau`` the *target* is re-rendered from ``target_scene`` with the same
    softness, so only geometry/material mismatch drives the loss. Robust where the
    hard a.e. gradient misleads (overlapping silhouettes — see ops/soft.py).
    ``backend="pallas"`` runs forward AND backward through the fused Mosaic
    kernels (soft_pallas + soft_bwd); with a ``mesh`` the step runs ray-DP
    sharded (fused soft kernels per shard, psum'd loss/grads —
    :func:`soft_value_and_grad_sharded`). ``bounce_depth=1`` adds the depth-1
    mirror bounce (jnp path — fits ``materials.reflection`` and reflective
    appearance). Returns ``(scene, losses)``.
    """
    from .ops.soft import render_image_soft

    def render_target(tau):
        if backend == "pallas" and bounce_depth == 0:
            from .ops.pallas.soft_pallas import render_image_soft_pallas
            return render_image_soft_pallas(camera, target_scene, tau=tau,
                                            interpret=interpret)
        return render_image_soft(camera, target_scene, tau=tau,
                                 bounce_depth=bounce_depth)

    from .ops.pallas.render_pallas import _UNROLL_LIMIT
    use_fused = (backend == "pallas" and bounce_depth == 0
                 and init_scene.lights.count <= _UNROLL_LIMIT)

    scene = init_scene
    losses = []
    per_stage = max(1, steps // len(taus))
    for tau in taus:
        target = render_target(tau)
        optimizer = optax.adam(lr)
        if use_fused:
            # the whole step is ONE kernel: soft forward + in-register MSE +
            # hand-derived reverse sweep (ops/pallas/soft_bwd.py) — per shard
            # when a mesh is given, with psum'd loss/grads
            if mesh is not None:
                from .parallel.mesh import image_sharding
                vg_st = soft_value_and_grad_sharded(
                    camera, mesh, tau=tau, pallas_interpret=interpret)
                tgt_sh = jax.device_put(target, image_sharding(mesh))
                vg = (lambda v, t: lambda s: v(s, t))(vg_st, tgt_sh)
            else:
                from .ops.pallas.soft_bwd import soft_loss_and_grads_pallas
                vg = (lambda tgt, tu: lambda s: soft_loss_and_grads_pallas(
                    camera, s, tgt, tau=tu, interpret=interpret))(target, tau)
            step = make_train_step(None, optimizer, trainable,
                                   value_and_grad=vg)
        else:
            loss_fn = soft_pixel_loss(camera, target, tau=tau, backend=backend,
                                      interpret=interpret,
                                      bounce_depth=bounce_depth)
            step = make_train_step(loss_fn, optimizer, trainable)
        opt_state = optimizer.init(scene)
        for i in range(per_stage):
            scene, opt_state, loss = step(scene, opt_state)
            losses.append(float(loss))
        if logger is not None:
            logger.log(len(losses), tau=float(tau), loss=losses[-1])
    return scene, losses
