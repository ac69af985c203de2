"""psum microbenchmark: the sharded training step's ONLY collectives.

The ray-DP training step (train.pallas_value_and_grad_sharded) is
zero-communication except for two all-reduces per step: the scalar loss
partial and the flat scene-gradient payload (ops/pallas/render_bwd.grad_layout
— 78 floats for the demo scene, 7*ns+9*npl+3*nl+5 for any scene). This
isolates that cost to bound the scaling-efficiency claim with arithmetic
instead of "almost certainly fine":

  * measured: wall time of a jitted shard_map psum of the exact payload on
    the attached mesh. On a virtual CPU mesh this measures the HOST
    emulation path (threads sharing one CPU) — an upper bound structure
    check, not ICI.
  * analytic: ring all-reduce lower/typical bound on a v5e ICI slice —
    2*(n-1)/n * bytes / BW + (n-1) * hop latency. The payload is ~300 bytes:
    the transfer term is nanoseconds; the LATENCY term dominates at ~1 us
    per hop, giving ~7 us at n=8 — <<1% of the 2.72 ms fused 1080p step
    (SCALING_r03). Efficiency is bounded by compute imbalance, not ICI.

Usage:
  python benchmarks/psum_micro.py --virtual 8
  python benchmarks/psum_micro.py --virtual 16
"""
from __future__ import annotations

import argparse
import json
import os
import sys

ICI_BW = 45e9       # bytes/s per v5e ICI link direction (public spec ~45 GB/s)
ICI_HOP_LAT = 1e-6  # conservative per-hop latency for tiny messages


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0)
    ap.add_argument("--spheres", type=int, default=0,
                    help="payload sized for a random N-sphere scene (0 = demo)")
    ap.add_argument("--step-ms", type=float, default=2.72,
                    help="training-step time the collective is compared to "
                         "(SCALING_r03: fused sharded 1080p depth-2 step)")
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") +
            f" --xla_force_host_platform_device_count={args.virtual}")
    import jax
    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import python_ray_tracer_tpu as rt
    from python_ray_tracer_tpu.ops.pallas.render_bwd import grad_layout
    from python_ray_tracer_tpu.parallel.mesh import make_mesh
    from python_ray_tracer_tpu.utils.timing import time_fn

    if args.spheres:
        scene = rt.random_scene(jax.random.key(0), args.spheres)
    else:
        scene = rt.default_scene()
    _, n_grads = grad_layout(scene.spheres.count, scene.planes.count,
                             scene.lights.count)
    payload_bytes = 4 * (n_grads + 1)   # + the scalar loss partial

    rows = []
    for n in (n for n in (1, 2, 4, 8, 16, 32) if n <= jax.device_count()):
        mesh = make_mesh(jax.devices()[:n])

        @jax.jit
        @lambda f: jax.shard_map(f, mesh=mesh, in_specs=P(), out_specs=P())
        def allreduce(x):
            return jax.lax.psum(x, "rays")

        x = jnp.arange(n_grads + 1, dtype=jnp.float32)
        # Virtual meshes emulate every device as a host thread; with more
        # device-threads than cores a long queued-dispatch train can trip
        # XLA's 20 s collective-rendezvous watchdog (observed at n=16 on 4
        # cores) — cap the in-flight work as n outgrows the host.
        iters = args.iters
        if args.virtual and n > os.cpu_count():
            iters = max(10, args.iters * os.cpu_count() // (2 * n))
        secs = time_fn(lambda: allreduce(x), warmup=1, iters=iters,
                       best_of=3)
        # analytic ring all-reduce on ICI at this payload
        t_ici = (2.0 * (n - 1) / max(n, 1) * payload_bytes / ICI_BW +
                 (n - 1) * ICI_HOP_LAT)
        rows.append(dict(
            devices=n,
            measured_us=round(secs * 1e6, 2),
            ici_bound_us=round(t_ici * 1e6, 3),
            ici_frac_of_step=round(t_ici / (args.step_ms * 1e-3), 6)))
        print(f"{n:3d} dev: psum {secs * 1e6:9.2f} us measured "
              f"(host path); ICI ring bound {t_ici * 1e6:7.3f} us = "
              f"{t_ici / (args.step_ms * 1e-3):.4%} of the "
              f"{args.step_ms} ms step", file=sys.stderr, flush=True)

    print(json.dumps(dict(
        metric="train_psum_collective",
        payload_floats=n_grads + 1, payload_bytes=payload_bytes,
        step_ms=args.step_ms, virtual=bool(args.virtual),
        ici_bw_bytes_s=ICI_BW, ici_hop_latency_s=ICI_HOP_LAT,
        results=rows)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
