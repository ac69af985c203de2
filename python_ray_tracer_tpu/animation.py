"""Batched multi-frame rendering: camera trajectories, block-compiled.

The reference renders a single frame per process launch (main.py:40-53). On
TPU, dispatch and compile costs amortize across frames: materials/camera are
traced scalars in the fused kernel (no recompile when they change), so a whole
camera trajectory renders as blocks of frames unrolled inside one jit over a stacked ``Camera``
pytree — a bounded number of compiles, zero host round-trips inside a block.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.camera import Camera, euler_rotation


def stack_cameras(cameras: Sequence[Camera]) -> Camera:
    """Stack same-resolution cameras leaf-wise into one batched pytree."""
    if not cameras:
        raise ValueError("stack_cameras needs at least one camera "
                         "(cli animate: --frames must be >= 1)")
    res = cameras[0].resolution
    assert all(c.resolution == res for c in cameras), "resolutions must match"
    return Camera(
        position=jnp.stack([c.position for c in cameras]),
        rotation=jnp.stack([c.rotation for c in cameras]),
        fov=jnp.stack([c.fov for c in cameras]),
        resolution=res)


def orbit_cameras(resolution: Tuple[int, int], center, radius: float,
                  height: float, n_frames: int, fov: float = 45.0,
                  start_deg: float = 180.0) -> Camera:
    """Cameras on a horizontal circle around ``center``, each looking at it.

    Uses the reference rotation convention (camera forward = rotated +x): a
    yaw of the azimuth toward the center plus a pitch down/up to hit it.
    Returns a stacked ``Camera`` for :func:`render_frames`.
    """
    cx, cy, cz = (float(v) for v in center)
    cams = []
    for k in range(n_frames):
        az = np.deg2rad(start_deg + 360.0 * k / n_frames)
        px = cx + radius * np.cos(az)
        py = cy + radius * np.sin(az)
        pz = cz + height
        dx, dy, dz = cx - px, cy - py, cz - pz
        yaw = np.rad2deg(np.arctan2(dy, dx))
        pitch = np.rad2deg(np.arctan2(dz, np.hypot(dx, dy)))
        cams.append(Camera(
            position=jnp.asarray([px, py, pz], jnp.float32),
            rotation=euler_rotation(0.0, pitch, yaw).astype(jnp.float32),
            fov=jnp.asarray(fov, jnp.float32),
            resolution=tuple(resolution)))
    return stack_cameras(cams)


@functools.partial(jax.jit, static_argnames=("res", "count", "depth",
                                             "aliasing", "compat", "backend",
                                             "cheap"))
def _render_block(pos, rot, fov, scene, *, res, count, depth, aliasing,
                  compat, backend, cheap):
    """``count`` frames unrolled in one program. MODULE-level jit: a closure
    jit-wrapped inside render_frames would be a fresh cache entry per call and
    silently recompile the whole block every invocation (~3 s at 256^2 — the
    bug this replaced); here repeat calls hit the cache."""
    def one(cam):
        if backend == "pallas":
            from .ops.pallas.render_pallas import render_image_pallas
            return render_image_pallas(cam, scene, depth=depth,
                                       aliasing=aliasing, compat=compat,
                                       cheap_shadow=cheap)
        from .ops.render import render_image
        return render_image(cam, scene, depth=depth, aliasing=aliasing,
                            compat=compat)

    return jnp.stack([
        one(Camera(position=pos[k], rotation=rot[k], fov=fov[k],
                   resolution=res))
        for k in range(count)])


def render_frames(cameras: Camera, scene, *, depth: int = 2,
                  aliasing: bool = True, compat: bool = True,
                  backend: str = "pallas",
                  frames_per_launch: int = 12) -> jnp.ndarray:
    """Render every camera in a stacked pytree -> ``(n, w, h, 3)`` frames.

    Frames are Python-unrolled inside a jit in blocks of ``frames_per_launch``
    (at most two compiles: the full block and one remainder; block size keeps
    compile time bounded for long trajectories). Measured on the tunneled
    v5e at 256^2 AA depth-2: 0.67 ms/frame — ~3.6x faster than standalone
    per-frame dispatch (2.4 ms) because dispatch cost amortizes across the
    block (a ``lax.map`` body measures 0.91 ms/frame — the unroll lets XLA
    overlap adjacent frames' kernels).
    """
    cheap = True
    if backend == "pallas":
        from .ops.pallas.render_pallas import _shadow_cheap_ok
        cheap = _shadow_cheap_ok(scene, compat)
    res = cameras.resolution
    n = cameras.position.shape[0]
    blocks = []
    k = 0
    while k < n:
        c = min(frames_per_launch, n - k)
        blocks.append(_render_block(
            cameras.position[k:k + c], cameras.rotation[k:k + c],
            cameras.fov[k:k + c], scene, res=res, count=c, depth=depth,
            aliasing=aliasing, compat=compat, backend=backend, cheap=cheap))
        k += c
    return blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks)


def save_animation(frames, path: str, *, fps: int = 12) -> None:
    """Write frames (``(n, w, h, 3)`` float) as an animated GIF via PIL."""
    from PIL import Image

    from .ops.render import to_framebuffer
    from .utils.image import framebuffer_to_array

    imgs = []
    for f in np.asarray(jax.device_get(frames)):
        fb = np.asarray(to_framebuffer(jnp.asarray(f)))
        imgs.append(Image.fromarray(
            framebuffer_to_array(fb).astype(np.uint8), mode="RGB"))
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / fps), loop=0)
