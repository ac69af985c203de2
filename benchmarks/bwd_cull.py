"""Dense-scene fused-backward cone-cull benchmark (ROADMAP item 25).

Measures ``scene_grads_pallas`` (the fused backward alone) and the full fused
fwd+bwd training step on a ``random_scene(n_spheres)`` at 1080p, cull-on vs
cull-off, no-AA and shared-AA. The cull restricts the backward's recomputed
primary-trace folds to the per-tile visible list (exact — see
ops/pallas/render_bwd.py:_fold_spheres_culled); the win should track the
forward's cull win scaled by the backward's primary-level share. Small scenes
(<= unroll limit) bypass the cull entirely, so the demo scene needs no
regression row. Prints one JSON line; rows also go to stderr.

Usage:
  python benchmarks/bwd_cull.py            # real chip
  python benchmarks/bwd_cull.py --quick    # fewer iters (busy pool)
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spheres", type=int, default=100)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp

    import python_ray_tracer_tpu as rt
    from python_ray_tracer_tpu.ops.pallas.render_pallas import render_image_pallas
    from python_ray_tracer_tpu.ops.pallas.render_bwd import scene_grads_pallas
    from python_ray_tracer_tpu.utils.timing import time_fn

    w, h = 1920, 1080
    scene = rt.random_scene(jax.random.key(0), args.spheres)
    camera = rt.Camera.build((w, h), [-12.0, 0.0, 4.0], [0.0, -15.0, 0.0])
    primary = w * h

    rows = []
    for aliasing in (False, True):
        img = render_image_pallas(camera, scene, depth=args.depth,
                                  aliasing=aliasing, compat=True)
        g_img = (img * 1e-2 + 1e-4).astype(jnp.float32)
        iters = (10 if args.quick else 30) if aliasing else \
                (20 if args.quick else 50)
        # (cone cull, two-pass shadow lists): lists stack on top of the cull
        # (both are level-0 only; lists add the prepass cost but shrink the 3
        # shadow-occlusion folds to the compact per-(tile, light) sets).
        for cull, lists in ((True, True), (True, False), (False, False)):
            tag = "AA" if aliasing else "noAA"
            label = (f"bwd_{tag}_" +
                     ("cull_lists" if lists else
                      ("cull" if cull else "nocull")))
            fn = lambda: scene_grads_pallas(camera, scene, g_img,
                                            depth=args.depth, compat=True,
                                            aliasing=aliasing, cull=cull,
                                            shadow_lists=lists)
            try:
                secs = time_fn(fn, warmup=1, iters=iters, best_of=3)
            except Exception as e:
                print(f"{label}: FAIL {type(e).__name__}: {str(e)[:200]}",
                      file=sys.stderr, flush=True)
                continue
            rows.append(dict(config=label, ms=round(secs * 1e3, 2),
                             primary_mrays_s=round(primary / secs / 1e6, 1)))
            print(f"{label}: {secs * 1e3:8.2f} ms", file=sys.stderr, flush=True)

    # end-to-end fused training step (fwd picks up its own cull; bwd cull on
    # via the default) — the number a dense-scene fit actually pays per step.
    from python_ray_tracer_tpu import train
    target = render_image_pallas(camera, scene, depth=args.depth,
                                 aliasing=False, compat=True)
    vg = jax.jit(train.pallas_value_and_grad(camera, target, depth=args.depth))
    try:
        secs = time_fn(vg, scene, warmup=1,
                       iters=10 if args.quick else 30, best_of=3)
        rows.append(dict(config="train_step_noAA", ms=round(secs * 1e3, 2),
                         primary_mrays_s=round(primary / secs / 1e6, 1)))
        print(f"train_step_noAA: {secs * 1e3:8.2f} ms", file=sys.stderr,
              flush=True)
    except Exception as e:
        print(f"train_step_noAA: FAIL {type(e).__name__}: {str(e)[:200]}",
              file=sys.stderr, flush=True)

    print(json.dumps(dict(metric="bwd_cull", spheres=args.spheres,
                          depth=args.depth, results=rows)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
