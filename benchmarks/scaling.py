"""Rays/s scaling-efficiency harness (BASELINE: >=85% at 1/8/16+ chips).

Measures the sharded renderer at increasing mesh sizes and reports efficiency
relative to ideal linear scaling. On a real pod slice this runs as-is over ICI;
without one, ``--virtual N`` fakes N CPU devices (the standard JAX recipe) to
validate the scaling *structure* — virtual-device timings share one physical CPU,
so wall-clock efficiency there is meaningful only for detecting pathological
communication, not absolute throughput.

Usage:
  python benchmarks/scaling.py --virtual 8 --width 512 --height 512
  python benchmarks/scaling.py                     # real devices (TPU slice)
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="fake N CPU devices (must be set before jax init)")
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--aliasing", action="store_true")
    ap.add_argument("--spheres", type=int, default=0,
                    help="random N-sphere scene (0 = demo scene)")
    ap.add_argument("--backend", default="jnp", choices=("jnp", "pallas"),
                    help="per-shard renderer (pallas = fused Mosaic kernel)")
    ap.add_argument("--iters", type=int, default=5,
                    help="dispatches per timing round (use >=100 on the real "
                         "chip: each round pays a fixed ~45 ms tunnel cost)")
    ap.add_argument("--train", action="store_true",
                    help="measure the fused sharded fwd+bwd training step "
                         "(train.pallas_value_and_grad_sharded) instead of "
                         "the forward render")
    args = ap.parse_args()
    if args.train:
        # the training step always runs the fused Mosaic kernels; record the
        # effective backend so the emitted artifact is never mislabeled
        args.backend = "pallas_fused_train"

    if args.virtual:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   f" --xla_force_host_platform_device_count={args.virtual}")
    import jax
    if args.virtual:
        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import python_ray_tracer_tpu as rt
    from python_ray_tracer_tpu.parallel.mesh import make_mesh
    from python_ray_tracer_tpu.parallel.render_sharded import render_image_sharded
    from python_ray_tracer_tpu.utils.timing import time_fn, rays_per_image

    n_total = jax.device_count()
    if args.spheres:
        scene = rt.random_scene(jax.random.key(0), args.spheres)
    else:
        scene = rt.default_scene()
    cam = rt.Camera.build((args.width, args.height), [-2.0, 0.0, 2.0],
                          [0.0, -30.0, 0.0])
    total_rays = rays_per_image(args.width, args.height, depth=args.depth,
                                aliasing=args.aliasing,
                                n_lights=scene.lights.count)

    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_total]
    results = []
    base_rate = None
    target_host = None
    if args.train:
        # render the target once; only its device placement varies per mesh
        target_host = rt.render_image(cam, scene, depth=args.depth,
                                      aliasing=args.aliasing)
    for n in sizes:
        if args.train and args.width % n:
            continue
        mesh = make_mesh(jax.devices()[:n])
        if args.train:
            from python_ray_tracer_tpu import train as _train
            from python_ray_tracer_tpu.parallel.mesh import image_sharding
            target = jax.device_put(target_host, image_sharding(mesh))
            vg = jax.jit(_train.pallas_value_and_grad_sharded(
                cam, mesh, depth=args.depth, aliasing=args.aliasing,
                pallas_interpret=bool(args.virtual)))
            fn = lambda: vg(scene, target)[0]
        else:
            fn = lambda: render_image_sharded(cam, scene, mesh, depth=args.depth,
                                              aliasing=args.aliasing,
                                              backend=args.backend)
        secs = time_fn(fn, warmup=1, iters=args.iters, best_of=2)
        rate = total_rays / secs
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n)
        results.append(dict(devices=n, ms=round(secs * 1e3, 2),
                            mrays_s=round(rate / 1e6, 1),
                            efficiency=round(eff, 3)))
        print(f"{n:3d} dev: {secs * 1e3:8.2f} ms  {rate / 1e6:10.1f} Mrays/s  "
              f"eff {eff:.1%}", file=sys.stderr, flush=True)

    print(json.dumps(dict(metric="scaling_efficiency",
                          config=dict(width=args.width, height=args.height,
                                      depth=args.depth, aliasing=args.aliasing,
                                      virtual=bool(args.virtual),
                                      backend=args.backend, iters=args.iters,
                                      train=args.train),
                          results=results)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
