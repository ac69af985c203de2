"""bf16 shading experiment: is there VPU throughput to win by dropping f32?

ROADMAP round-2 leftover ("bf16 shading experiment for the forward kernel").
The fused render kernel is VPU-bound elementwise math (benchmarks/vpu_sol.py,
benchmarks/mxu_sweep.py), so a bf16 win can only come from the VPU executing
packed bf16 lanes faster than f32. This measures exactly that, with the same
differenced-chain methodology as vpu_sol.py (two serial FMA chain lengths at
the render kernel's tile shape and grid; the slope cancels launch/load
overhead), in three variants:

  * f32 chain        — the baseline the kernel runs today.
  * bf16 chain       — ``x * a + b`` on bfloat16 values end to end.
  * bf16->f32 mixed  — bf16 operands upcast into an f32 FMA (what a "bf16
    storage, f32 accumulate" shading path would issue).

Decision rule (printed + JSON): a bf16 shading path is only worth kernel
surgery if the bf16 rate is >= 1.5x f32. Shading (Lambert + specular + color
accumulation) is ~20-25%% of frame math — the sweep/closest-hit math cannot
drop precision (the MXU experiment measured 30%% closest-hit winner flips in
bf16, benchmarks/mxu_sweep.py) — so even a 2x VPU rate caps the whole-frame
win at ~10-12%%, and anything under 1.5x is noise after parity costs.

Run on the real chip:  python benchmarks/bf16_sweep.py   # one JSON line
"""
from __future__ import annotations

import argparse
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

    from python_ray_tracer_tpu.utils.timing import time_fn

    w, h = 1920, 1080
    TW, TH = 40, 128

    def make_chain_kernel(n_fma, mode):
        def kernel(p_ref, o_ref):
            a32 = p_ref[0]
            b32 = p_ref[1]
            x32 = (jax.lax.broadcasted_iota(jnp.int32, (TW, TH), 1)
                   .astype(jnp.float32)) * p_ref[2]
            if mode == "f32":
                x = x32
                for _ in range(n_fma):
                    x = x * a32 + b32
                o_ref[...] = x
            elif mode == "bf16":
                a = a32.astype(jnp.bfloat16)
                b = b32.astype(jnp.bfloat16)
                x = x32.astype(jnp.bfloat16)
                for _ in range(n_fma):
                    x = x * a + b
                o_ref[...] = x.astype(jnp.float32)
            else:  # mixed: bf16 operands, f32 accumulate
                a = a32.astype(jnp.bfloat16)
                b = b32.astype(jnp.bfloat16)
                x = x32
                for _ in range(n_fma):
                    x = (x.astype(jnp.bfloat16).astype(jnp.float32)
                         * a.astype(jnp.float32) + b.astype(jnp.float32))
                o_ref[...] = x
        return kernel

    def chain_time(n_fma, mode, iters):
        f = pl.pallas_call(
            make_chain_kernel(n_fma, mode),
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
    rates = {}
    for mode in ("f32", "bf16", "mixed"):
        t_lo = chain_time(n_lo, mode, iters)
        t_hi = chain_time(n_hi, mode, iters)
        per_fma = (t_hi - t_lo) / (n_hi - n_lo)
        rates[mode] = 2.0 * (w * h) / per_fma
        print(f"{mode:5s}: {t_lo*1e3:7.3f} ms @{n_lo} / {t_hi*1e3:7.3f} ms "
              f"@{n_hi} -> {rates[mode] / 1e12:.3f} TFLOP/s", file=sys.stderr)

    speedup = rates["bf16"] / rates["f32"]
    mixed_ratio = rates["mixed"] / rates["f32"]
    worth_it = speedup >= 1.5
    ceiling = max(speedup - 1, 0) * 22
    verdict = (f"bf16 VPU rate {speedup:.2f}x f32 -> " +
               ("worth prototyping a bf16 shading path" if worth_it else
                f"NOT worth kernel surgery (shading is ~20-25 percent of "
                f"frame math; whole-frame ceiling ~{ceiling:.0f} percent)"))
    print(verdict, file=sys.stderr)
    print(json.dumps(dict(metric="bf16_vpu_sweep",
                          f32_tflops=round(rates["f32"] / 1e12, 3),
                          bf16_tflops=round(rates["bf16"] / 1e12, 3),
                          mixed_tflops=round(rates["mixed"] / 1e12, 3),
                          bf16_speedup=round(speedup, 3),
                          mixed_vs_f32=round(mixed_ratio, 3),
                          worth_kernel_surgery=bool(worth_it))))
    return 0


if __name__ == "__main__":
    sys.exit(main())
