"""Empirical VPU speed-of-light comparator for the fused render kernel.

Honest headroom accounting in three measured pieces (no datasheet numbers):

1. **Work estimate** — XLA's own ``cost_analysis()`` flop count for the jnp
   render path at the demo config. The fused kernel does the same math minus
   XLA's inability to share AA samples, so this is an upper bound on the
   kernel's useful flops (the kernel also does *fewer* via the cone cull /
   early exits on dense scenes; on the 6-sphere demo they are equivalent).
2. **Machine rate** — a synthetic Pallas kernel at the render kernel's exact
   tile shape (40, 128) and grid (1080p) running a pure serial FMA chain from
   SMEM-held coefficients (not constant-foldable). Two chain lengths are
   measured and differenced, cancelling the fixed grid/launch/load overhead:
   the slope is seconds per FMA per element -> achieved VPU flops/s at this
   occupancy.
3. **Light-speed bound** = flops(1) / rate(2), vs the measured render time.

The ratio is *approximate* (cost_analysis counts transcendentals as 1 flop;
the render kernel is not a pure FMA chain — it has selects, compares, and
rsqrts that issue differently), so report it as "order-of" headroom, not a
percentage to chase. Run on the real chip:

  python benchmarks/vpu_sol.py          # one JSON line on stdout
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import python_ray_tracer_tpu as rt
    from python_ray_tracer_tpu.ops.pallas.render_pallas import render_image_pallas
    from python_ray_tracer_tpu.utils.timing import time_fn

    w, h = 1920, 1080
    TW, TH = 40, 128
    scene = rt.default_scene()
    camera = rt.Camera.build((w, h), [-2.0, 0.0, 2.0], [0.0, -30.0, 0.0])

    # --- 1. flop estimate from XLA's cost model on the jnp path -------------
    def jnp_render():
        return rt.render_image(camera, scene, depth=2, aliasing=False,
                               compat=True, row_chunk=240)
    ca = jax.jit(jnp_render).lower().compile().cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops_frame = float(ca.get("flops", 0.0))
    print(f"XLA cost model: {flops_frame / 1e9:.2f} GFLOP/frame "
          f"({flops_frame / (w * h):.0f} flops/pixel)", file=sys.stderr)

    # --- 2. achieved VPU FMA rate at the render kernel's tile/grid ----------
    def make_fma_kernel(n_fma):
        def kernel(p_ref, o_ref):
            a = p_ref[0]
            b = p_ref[1]
            x = (jax.lax.broadcasted_iota(jnp.int32, (TW, TH), 1)
                 .astype(jnp.float32)) * p_ref[2]
            for _ in range(n_fma):
                x = x * a + b       # serial dependence: 1 FMA / element / step
            o_ref[...] = x
        return kernel

    def fma_time(n_fma, iters):
        f = pl.pallas_call(
            make_fma_kernel(n_fma),
            grid=(pl.cdiv(w, TW), pl.cdiv(h, TH)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((TW, TH), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((w, h), jnp.float32),
        )
        params = jnp.array([0.9999999, 1e-7, 1.0], jnp.float32)
        g = jax.jit(lambda p: f(p))
        return time_fn(lambda: g(params), warmup=1, iters=iters, best_of=3)

    iters = 20 if args.quick else 50
    n_lo, n_hi = 256, 1024
    t_lo = fma_time(n_lo, iters)
    t_hi = fma_time(n_hi, iters)
    per_fma = (t_hi - t_lo) / (n_hi - n_lo)          # s per FMA per frame-elem
    vpu_flops = 2.0 * (w * h) / per_fma              # FMA = 2 flops
    print(f"synthetic chain: {t_lo*1e3:.3f} ms @{n_lo} / {t_hi*1e3:.3f} ms "
          f"@{n_hi} -> {vpu_flops / 1e12:.3f} TFLOP/s f32 achieved",
          file=sys.stderr)

    # --- 3. light-speed bound vs the measured fused kernel ------------------
    fused = lambda: render_image_pallas(camera, scene, depth=2,
                                        aliasing=False, compat=True)
    t_fused = time_fn(fused, warmup=1, iters=100 if not args.quick else 30,
                      best_of=3)
    t_sol = flops_frame / vpu_flops
    print(f"fused kernel: {t_fused*1e3:.3f} ms measured; FMA-equivalent "
          f"light speed {t_sol*1e3:.3f} ms -> {t_sol / t_fused:.1%} of sol "
          f"(order-of; see module docstring caveats)", file=sys.stderr)

    print(json.dumps(dict(metric="vpu_sol",
                          flops_per_frame=flops_frame,
                          vpu_tflops_achieved=round(vpu_flops / 1e12, 3),
                          fused_ms=round(t_fused * 1e3, 3),
                          sol_ms=round(t_sol * 1e3, 3),
                          sol_fraction=round(t_sol / t_fused, 3))))
    return 0


if __name__ == "__main__":
    sys.exit(main())
