"""On-chip A/B for the soft-step VMEM slab accumulation (RT_SOFT_SLAB_ACC).

Round-5 finding (docs/ROADMAP.md): stubbing the per-(object, occluder)
gradient reductions drops the fused soft step 32.3 -> 8.8 ms at 100
spheres/128^2 — the ns^2 reduce+SMEM-RMW pattern is 73% of the runtime.
The structural fix accumulates per-occluder gradient contributions into a
(ns, 4, TW, TH) VMEM slab and reduces each slot ONCE per grid step at
flush time (ops/pallas/soft_bwd.py, slab_acc=True). Interpret parity was
clean, but the TPU tunnel went down before the on-chip measurement — this
script is that measurement.

Protocol (verify-skill rules): the flag is read at soft_bwd import time
and jit caches ignore module globals, so each variant runs in its OWN
process; the pool-shared chip drifts 10-40% between windows and contention
only ADDS time, so variants are interleaved across eras and per-variant
MINIMA are compared. Gradients are dumped per variant and cross-checked
for parity (the slab path must be a pure reassociation of the same math).

Run on the real chip:  python benchmarks/soft_slab_ab.py
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _measure(args) -> int:
    """Inner mode: runs in a subprocess with RT_SOFT_SLAB_ACC already set."""
    sys.path.insert(0, REPO)
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    import python_ray_tracer_tpu as rt
    from python_ray_tracer_tpu.ops.pallas.soft_bwd import (
        soft_loss_and_grads_pallas, _SLAB_ACC)
    from python_ray_tracer_tpu.ops.pallas.soft_pallas import (
        render_image_soft_pallas)

    tau = 0.05
    N = args.res
    cam = rt.default_camera((N, N))
    tscene = rt.random_scene(jax.random.PRNGKey(0), n_spheres=args.spheres)
    scene = rt.random_scene(jax.random.PRNGKey(1), n_spheres=args.spheres)
    target = render_image_soft_pallas(cam, tscene, tau=tau)

    step = jax.jit(lambda s: soft_loss_and_grads_pallas(cam, s, target,
                                                        tau=tau))
    loss, grads = jax.block_until_ready(step(scene))   # compile + warmup
    jax.block_until_ready(step(scene))

    times = []
    for _ in range(args.eras):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = step(scene)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / args.iters * 1e3)

    leaves, _ = jax.tree_util.tree_flatten(grads)
    np.savez(args.out_npz, loss=np.asarray(loss),
             **{f"g{i}": np.asarray(l) for i, l in enumerate(leaves)})
    print(json.dumps(dict(slab_acc=bool(_SLAB_ACC), res=N,
                          spheres=args.spheres, iters=args.iters,
                          era_ms=[round(t, 3) for t in times],
                          min_ms=round(min(times), 3),
                          loss=float(loss))))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--spheres", type=int, default=100)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--eras", type=int, default=3)
    ap.add_argument("--measure", action="store_true",
                    help="inner mode (one variant, one process)")
    ap.add_argument("--out-npz", default="")
    args = ap.parse_args()
    if args.measure:
        return _measure(args)

    import numpy as np

    results = {}
    for flag in ("0", "1"):
        env = dict(os.environ, RT_SOFT_SLAB_ACC=flag)
        npz = f"/tmp/soft_slab_ab_{flag}.npz"
        cmd = [sys.executable, os.path.abspath(__file__), "--measure",
               "--res", str(args.res), "--spheres", str(args.spheres),
               "--iters", str(args.iters), "--eras", str(args.eras),
               "--out-npz", npz]
        p = subprocess.run(cmd, env=env, capture_output=True, text=True)
        if p.returncode != 0:
            print(p.stdout, file=sys.stderr)
            print(p.stderr, file=sys.stderr)
            print(json.dumps(dict(metric="soft_slab_ab", ok=False,
                                  failed_variant=flag)))
            return 1
        results[flag] = json.loads(p.stdout.strip().splitlines()[-1])

    a = np.load("/tmp/soft_slab_ab_0.npz")
    b = np.load("/tmp/soft_slab_ab_1.npz")
    max_rel = 0.0
    for k in a.files:
        x, y = a[k].astype(np.float64), b[k].astype(np.float64)
        denom = np.maximum(np.abs(x).max(), 1e-8)
        max_rel = max(max_rel, float(np.abs(x - y).max() / denom))

    base, slab = results["0"]["min_ms"], results["1"]["min_ms"]
    out = dict(metric="soft_slab_ab", ok=True, res=args.res,
               spheres=args.spheres,
               baseline_min_ms=base, slab_min_ms=slab,
               speedup=round(base / slab, 3),
               grad_max_rel_diff=max_rel,
               baseline_eras=results["0"]["era_ms"],
               slab_eras=results["1"]["era_ms"])
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
