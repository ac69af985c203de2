"""Benchmark harness: renders the demo scene at 1080p on the attached TPU chip.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.md): primary-ray forward throughput at 1080p in Mrays/s on
one chip; baseline is the reference's derived ~1 Grays/s (README claim of <1 ms for
~10^6 rays — see BASELINE.md caveats about its un-synced timing). Secondary metrics
(total-rays throughput incl. AA/shadow/bounce rays, fwd+bwd) go to stderr.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    import python_ray_tracer_tpu as rt

    w, h = 1920, 1080
    depth, aliasing = 2, True
    scene = rt.default_scene()
    camera = rt.Camera.build((w, h), [-2.0, 0.0, 2.0], [0.0, -30.0, 0.0])
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")

    backend = "jnp"
    try:
        from python_ray_tracer_tpu.ops.pallas.render_pallas import render_image_pallas

        def fwd(camera, scene):
            return render_image_pallas(camera, scene, depth=depth,
                                       aliasing=aliasing, compat=True)
        jax.block_until_ready(fwd(camera, scene))
        backend = "pallas"
    except Exception as e:  # pallas unavailable/failed -> XLA-fused jnp path
        log(f"pallas backend unavailable ({type(e).__name__}: {e}); using jnp")

        def fwd(camera, scene):
            return rt.render_image(camera, scene, depth=depth, aliasing=aliasing,
                                   compat=True)

    # Forward timing (warm-up then sync-timed, the reference's pattern done honestly;
    # main.py:41-49 brackets an async launch).
    secs = rt.time_fn(fwd, camera, scene, warmup=2, iters=5)
    primary = w * h
    total = rt.rays_per_image(w, h, depth=depth, aliasing=aliasing,
                              n_lights=scene.lights.count)
    primary_mrps = primary / secs / 1e6
    total_mrps = total / secs / 1e6
    log(f"forward[{backend}]: {secs * 1e3:.2f} ms  "
        f"{primary_mrps:,.1f} Mrays/s primary  {total_mrps:,.1f} Mrays/s total")

    # Forward+backward (always via the differentiable jnp path).
    try:
        target = rt.render_image(camera, scene, depth=depth, aliasing=False,
                                 compat=True, row_chunk=240)
        loss_grad = jax.jit(jax.grad(
            lambda s: jnp.mean((rt.render_image(camera, s, depth=depth,
                                                aliasing=False, compat=True,
                                                row_chunk=240) - target) ** 2)))
        bwd_secs = rt.time_fn(loss_grad, scene, warmup=1, iters=3)
        fwd_bwd_primary = primary / bwd_secs / 1e6
        log(f"fwd+bwd (no AA, chunked): {bwd_secs * 1e3:.2f} ms  "
            f"{fwd_bwd_primary:,.1f} Mrays/s primary")
    except Exception as e:
        log(f"fwd+bwd bench failed: {type(e).__name__}: {e}")

    baseline_mrps = 1000.0  # ~1 Grays/s primary, BASELINE.md
    print(json.dumps({
        "metric": f"primary_Mrays_per_s_fwd_1080p_{backend}",
        "value": round(primary_mrps, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(primary_mrps / baseline_mrps, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
