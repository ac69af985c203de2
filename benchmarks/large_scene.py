"""Large-scene benchmark: 100-sphere renders at 1080p and 4K (BASELINE configs[4]).

Measures the fused Pallas kernel on ``random_scene(n_spheres)`` — the rolled
(chunk-unrolled) object loops, tile-coherent shadow early exit, and per-tile
primary cone cull. Prints one JSON line; rows also go to stderr.

Usage:
  python benchmarks/large_scene.py                 # real chip
  python benchmarks/large_scene.py --quick         # fewer iters (busy pool)
"""
from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spheres", type=int, default=100)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    import python_ray_tracer_tpu as rt
    from python_ray_tracer_tpu.ops.pallas.render_pallas import render_image_pallas
    from python_ray_tracer_tpu.utils.timing import time_fn

    scene = rt.random_scene(jax.random.key(0), args.spheres)
    rows = []
    for label, wh, aliasing, cull, group in [
        ("1080p_noAA", (1920, 1080), False, True, False),
        ("1080p_noAA_group", (1920, 1080), False, True, True),
        ("1080p_AA", (1920, 1080), True, True, False),
        ("1080p_AA_group", (1920, 1080), True, True, True),
        ("1080p_AA_nocull", (1920, 1080), True, False, False),
        ("4k_AA", (3840, 2160), True, True, False),
    ]:
        w, h = wh
        camera = rt.Camera.build((w, h), [-12.0, 0.0, 4.0], [0.0, -15.0, 0.0])
        fn = lambda: render_image_pallas(camera, scene, depth=args.depth,
                                         aliasing=aliasing, compat=True,
                                         cull=cull, group_cull=group)
        iters = 20 if args.quick else 50
        try:
            secs = time_fn(fn, warmup=1, iters=iters, best_of=3)
        except Exception as e:
            print(f"{label}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr, flush=True)
            continue
        mrays = w * h / secs / 1e6
        rows.append(dict(config=label, ms=round(secs * 1e3, 2),
                         primary_mrays_s=round(mrays, 1)))
        print(f"{label}: {secs * 1e3:8.2f} ms  {mrays:8.1f} Mrays/s primary",
              file=sys.stderr, flush=True)

    print(json.dumps(dict(metric="large_scene_render",
                          spheres=args.spheres, depth=args.depth,
                          results=rows)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
