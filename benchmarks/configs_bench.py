"""Measure every BASELINE.json ``configs[i]`` workload on the attached chip.

Writes ``CONFIGS_r{N}.json`` at the repo root (pass ``--round N``): one entry
per BASELINE config with the measured wall time and primary-ray throughput.

The five configs (BASELINE.json):
  0. single sphere + ground plane, primary rays only, Lambert, 256x256
     (parity vs the scalar oracle is asserted by tests/test_core.py; this
     entry records the measured render time)
  1. README demo scene (multi-sphere + plane, point lights, shadow rays), 720p
  2. recursive specular reflections depth=4 + Phong materials, 1080p
     (clean mode, specular=0.5 — the reference has no specular term; see
     ops/shade.py:101-108)
  3. differentiable inverse render: fused fwd+bwd optimisation step (the
     pixel-grad descent inner loop of cli.py fit), 64x64
  4. 3x3-supersampled 100-sphere scene at 4K, rendered through the sharded
     ray-DP path (shard_map over the attached mesh; multi-host structure is
     validated separately on a virtual 8-device mesh — SCALING_r02.json)

Timing: utils/timing.time_fn (queue N dispatches, sync once via scalar fetch,
best-of-3) — see bench.py's docstring for why naive block_until_ready timing
lies on this backend.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

# this image preempts PYTHONPATH (sitecustomize); `python benchmarks/...` does
# not put the repo root on sys.path — do it explicitly
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import python_ray_tracer_tpu as rt
    from python_ray_tracer_tpu.models.scene import (Scene, Spheres, Planes,
                                                    Lights, Materials, RED,
                                                    GREY)
    from python_ray_tracer_tpu.ops.pallas.render_pallas import render_image_pallas
    from python_ray_tracer_tpu.utils.timing import time_fn

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    results = []

    def record(idx, desc, w, h, secs, extra=None):
        entry = {"config": idx, "desc": desc,
                 "resolution": f"{w}x{h}",
                 "ms": round(secs * 1e3, 2),
                 "primary_Mrays_per_s": round(w * h / secs / 1e6, 1)}
        entry.update(extra or {})
        results.append(entry)
        log(f"config[{idx}] {desc}: {secs*1e3:8.2f} ms  "
            f"{entry['primary_Mrays_per_s']:8.1f} Mrays/s primary")

    # -- config 0: single sphere + plane, primary only, Lambert, 256x256 -----
    one = Scene(
        Spheres.build([([2.2, 0.0, 1.0], 1.0, RED)]),
        Planes.build([([5, 0, 0], [0, 0, 1], GREY)]),
        Lights.build([[2.5, -2.0, 3.0]]),
        Materials.build(ambient=0.0, lambert=1.0, reflection=0.0))
    cam0 = rt.Camera.build((256, 256), [-2.0, 0.0, 2.0], [0.0, -30.0, 0.0])
    f0 = lambda: render_image_pallas(cam0, one, depth=0, aliasing=False,
                                     compat=True)
    record(0, "1 sphere + plane, primary only, Lambert", 256, 256,
           time_fn(f0, warmup=1, iters=200, best_of=3),
           {"parity": "oracle-pinned (tests/test_core.py, tests/oracle.py)"})

    # -- config 1: README demo scene at 720p ---------------------------------
    demo = rt.default_scene()
    cam1 = rt.Camera.build((1280, 720), [-2.0, 0.0, 2.0], [0.0, -30.0, 0.0])
    f1 = lambda: render_image_pallas(cam1, demo, depth=2, aliasing=True,
                                     compat=True)
    record(1, "README demo scene, shadows, 3x3 AA", 1280, 720,
           time_fn(f1, warmup=1, iters=100, best_of=3))

    # -- config 2: depth=4 + Phong materials at 1080p ------------------------
    phong = dataclasses.replace(
        demo, materials=Materials.build(ambient=0.1, lambert=0.6,
                                        reflection=0.3, specular=0.5,
                                        shininess=32.0))
    cam2 = rt.Camera.build((1920, 1080), [-2.0, 0.0, 2.0], [0.0, -30.0, 0.0])
    f2 = lambda: render_image_pallas(cam2, phong, depth=4, aliasing=False,
                                     compat=False)
    record(2, "depth-4 reflections + Phong specular (clean mode)", 1920, 1080,
           time_fn(f2, warmup=1, iters=100, best_of=3))

    # -- config 3: inverse render at production scale (fused fwd+bwd fit) ----
    # The ACTUAL fit, not just the inner-loop dispatch: recover perturbed
    # sphere centers on the well-separated 2-sphere scene (cli.py fit --mode
    # hard) at 512x512 with the fused pallas training step; record ms/step,
    # the loss drop, and the final center error.
    import numpy as np
    from python_ray_tracer_tpu import train
    fit_scene_obj = Scene(
        Spheres.build([([2.5, 0.5, 1.0], 0.8, RED),
                       ([1.5, -0.9, 0.5], 0.5, rt.BLUE)]),
        Planes.build([([5, 0, 0], [0, 0, 1], GREY)]),
        Lights.build([[2.5, -2.0, 3.0], [2.5, 2.0, 3.0]]),
        Materials.build())
    cam3 = rt.Camera.build((512, 512), [-2.0, 0.0, 2.0], [0.0, -30.0, 0.0])
    target = render_image_pallas(cam3, fit_scene_obj, depth=1, aliasing=False,
                                 compat=True)
    init3 = dataclasses.replace(
        fit_scene_obj, spheres=dataclasses.replace(
            fit_scene_obj.spheres,
            center=fit_scene_obj.spheres.center
            + jnp.asarray([0.2, -0.15, 0.1])))
    fit_steps = 150
    fitted, losses = train.fit_scene(init3, cam3, target, steps=fit_steps,
                                     lr=1e-2, depth=1, backend="pallas",
                                     trainable=("spheres.center",))
    err0 = float(np.abs(np.asarray(init3.spheres.center)
                        - np.asarray(fit_scene_obj.spheres.center)).max())
    err1 = float(np.abs(np.asarray(fitted.spheres.center)
                        - np.asarray(fit_scene_obj.spheres.center)).max())
    # converged-at: first step under 1% of the initial loss
    conv = next((i for i, l in enumerate(losses) if l < losses[0] * 0.01),
                fit_steps)
    vg = jax.jit(train.pallas_value_and_grad(cam3, target, depth=1))
    f3 = lambda: vg(init3)[0]

    # The soft-visibility anneal on the same budget (the OPTIMIZATION
    # renderer): the hard a.e. gradient stalls at ~0.097 center error
    # (silhouette term is zero a.e.); the anneal converges ~300x tighter.
    # Round 5: the whole anneal runs through the fused kernels (soft forward
    # soft_pallas.py + hand-derived adjoint soft_bwd.py).
    import time as _time
    t0 = _time.perf_counter()
    fitted_s, losses_s = train.fit_scene_soft(
        init3, cam3, fit_scene_obj, steps=fit_steps, lr=1e-2,
        trainable=("spheres.center",), backend="pallas")
    jax.block_until_ready(fitted_s.spheres.center)
    soft_wall = _time.perf_counter() - t0
    err1_s = float(np.abs(np.asarray(fitted_s.spheres.center)
                          - np.asarray(fit_scene_obj.spheres.center)).max())
    record(3, "inverse render: fused fwd+bwd fit (512x512, depth 1)", 512, 512,
           time_fn(f3, warmup=1, iters=100, best_of=3),
           {"fit_steps": fit_steps,
            "loss_drop": f"{losses[0]:.3e} -> {losses[-1]:.3e}",
            "steps_to_1pct_loss": conv,
            "center_err_max": f"{err0:.3f} -> {err1:.4f}",
            "soft_anneal": {
                "desc": "same fit via fit_scene_soft (coarse-to-fine tau "
                        "anneal, 512x512, fused soft kernels fwd+bwd)",
                "fit_steps": fit_steps,
                "loss_drop": f"{losses_s[0]:.3e} -> {losses_s[-1]:.3e}",
                "center_err_max": f"{err0:.3f} -> {err1_s:.4f}",
                "wall_s": round(soft_wall, 1),
                "note": "the hard-visibility a.e. gradient stalls "
                        f"(center err {err1:.3f}); the soft anneal converges "
                        "orders tighter on the same step budget — r4 ran it "
                        "on the jnp path in 61 s, the fused soft backward "
                        "(soft_bwd.py) now carries every step"},
            "note": "ms/primary-Mrays columns time the fused train step; "
                    "full fit flow = cli.py fit --mode hard (or --mode soft "
                    "for the anneal row)"})

    # -- config 4: 100-sphere 4K 3x3-AA through the sharded path -------------
    big = rt.random_scene(jax.random.key(0), 100)
    cam4 = rt.Camera.build((3840, 2160), [-12.0, 0.0, 4.0], [0.0, -15.0, 0.0])
    from jax.sharding import Mesh
    from python_ray_tracer_tpu.parallel.render_sharded import render_image_sharded
    mesh = Mesh(jax.devices(), ("shards",))
    f4 = lambda: render_image_sharded(cam4, big, mesh, depth=2, aliasing=True,
                                      compat=True, backend="pallas",
                                      axis="shards")
    record(4, "100-sphere 4K 3x3-AA, sharded ray-DP path", 3840, 2160,
           time_fn(f4, warmup=1, iters=10, best_of=3),
           {"n_devices": len(jax.devices()),
            "note": "multi-chip structure validated on a virtual 8-device "
                    "mesh (SCALING_r02.json); this row is the attached-chip "
                    "measurement"})

    out = args.out or f"CONFIGS_r{args.round:02d}.json"
    with open(out, "w") as fh:
        json.dump({"device": str(dev), "configs": results}, fh, indent=1)
        fh.write("\n")
    log(f"wrote {out}")
    print(json.dumps({"metric": "baseline_configs_measured", "value": len(results),
                      "unit": "configs", "vs_baseline": 1.0}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
