"""Speed-of-light comparator for the fused render kernel: FMA-only AND
instruction-mix-aware bounds (VERDICT r4 weak #3 / next #5).

The r2-r4 bound priced the whole kernel at the synthetic FMA rate, which
ignores that the real instruction stream is ~1/3 selects/compares/converts and
carries sqrt/rsqrt/div — so "0.11 of sol" could mean 9x headroom or none.
This version builds a defensible mix bound in three measured pieces:

1. **Instruction mix** — walk the *actual kernel jaxpr* (the ``pallas_call``
   eqn's inner jaxpr, recursing through wrapper eqns) and count VECTOR ops by
   class, keyed on the eqn output aval shape so SMEM scalar math (which runs
   on the scalar core, overlapped) is excluded. This is the per-grid-step op
   stream Mosaic lowers, modulo its own fusion/CSE.
2. **Per-class issue rates** — differenced serial-dependence Pallas chains at
   the render kernel's exact tile/grid, one chain per class (fma, select,
   compare, sqrt, rsqrt, div): two chain lengths, slope = seconds per op per
   element, fixed overhead cancelled. The ALU classes (mul/add/sub/select/
   compare/convert/min/max/bool) are priced at their measured slots; an
   FMA-fused lower bound additionally lets every mul+add pair share a slot.
3. **Bounds** — sol_mix_unfused (every vector op takes its class slot) and
   sol_mix_fused (max mul+add pairing) bracket the kernel's light speed; the
   legacy FMA-only number is kept for continuity.

Contention control: the fused kernel is re-measured up to N rounds and the
minimum taken; the JSON records the best round next to the known
run-of-record so a contended window is visible instead of silently skewing
the fraction (r4's window was 38% slow).

Run on the real chip:  python benchmarks/vpu_sol.py
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from collections import Counter

# Vector-op classes: jaxpr primitive name -> class
_CLASS = {
    "mul": "mul", "add": "add", "sub": "add", "neg": "alu", "abs": "alu",
    "max": "alu", "min": "alu", "and": "alu", "or": "alu", "not": "alu",
    "xor": "alu", "select_n": "select", "convert_element_type": "alu",
    "gt": "cmp", "lt": "cmp", "ge": "cmp", "le": "cmp", "eq": "cmp",
    "ne": "cmp", "sqrt": "sqrt", "rsqrt": "rsqrt", "div": "div",
    "exp": "exp", "log": "exp", "logistic": "exp", "integer_pow": "mul",
    "floor": "alu", "round": "alu", "sign": "alu", "rem": "div",
}
_WRAPPERS = {"jit", "pjit", "closed_call", "custom_jvp_call",
             "custom_vjp_call", "remat", "checkpoint", "custom_vjp_call_jaxpr"}


def _walk(jaxpr, counts, mult=1):
    """Count vector ops by class, weighting loop bodies by their static trip
    count (``scan``/``fori_loop`` carry ``length``; rolled object folds would
    otherwise be counted once). ``while_loop`` has no static count — its body
    is counted once (an undercount; the render kernels use fori/scan)."""
    import math
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        sub_mult = mult
        if name == "scan":
            sub_mult = mult * int(eqn.params.get("length", 1))
        if name not in _WRAPPERS and name in _CLASS:
            # vector ops only: scalar math rides the scalar core, overlapped
            shp = getattr(eqn.outvars[0].aval, "shape", ())
            if shp and math.prod(shp) > 1:
                counts[_CLASS[name]] += mult
        for v in eqn.params.values():
            for sub in (v if isinstance(v, (list, tuple)) else (v,)):
                if hasattr(sub, "eqns"):
                    _walk(sub, counts, sub_mult)
                elif hasattr(sub, "jaxpr"):
                    _walk(sub.jaxpr, counts, sub_mult)


def _find_pallas(jaxpr, out):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "pallas_call":
            out.append(eqn)
        for v in eqn.params.values():
            for sub in (v if isinstance(v, (list, tuple)) else (v,)):
                if hasattr(sub, "eqns"):
                    _find_pallas(sub, out)
                elif hasattr(sub, "jaxpr"):
                    _find_pallas(sub.jaxpr, out)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--rounds", type=int, default=8,
                    help="fused-kernel measurement rounds (min taken)")
    ap.add_argument("--soft", action="store_true",
                    help="also bound the SOFT kernels at the 100-sphere "
                         "128^2 fit config (mix counts weighted by rolled-"
                         "fold trip counts; slot table from the main run)")
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

    # --- 1. instruction mix from the kernel's own jaxpr ---------------------
    jx = jax.make_jaxpr(lambda s: render_image_pallas(
        camera, s, depth=2, aliasing=False, compat=True))(scene)
    calls = []
    _find_pallas(jx.jaxpr, calls)
    assert calls, "no pallas_call in the traced render"
    mix = Counter()
    _walk(calls[0].params["jaxpr"], mix)
    n_u, n_v = -(-1080 // TW), -(-1920 // TH)   # swap-resolved grid at 1080p
    n_tiles = n_u * n_v
    elems = TW * TH
    print(f"per-tile vector-op mix: {dict(mix)}  x {n_tiles} tiles "
          f"({elems} elems/tile)", file=sys.stderr)

    # legacy flop estimate (XLA cost model of the jnp path) for continuity
    ca = jax.jit(lambda: rt.render_image(camera, scene, depth=2,
                                         aliasing=False, compat=True,
                                         row_chunk=240)).lower().compile().cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops_frame = float(ca.get("flops", 0.0))

    # --- 2. per-class issue rates at the kernel's tile/grid -----------------
    # P independent accumulators per step: a single serial chain measures
    # instruction LATENCY (the r4 mistake in reverse — the real kernel has
    # ample ILP and runs at unit THROUGHPUT). P=4 with long chains: the
    # per-point signal must clear the pool-shared chip's ~0.3-1 ms noise,
    # which P=8 with short chains did not (absolute-rate debug showed the
    # ~1.85 Tops/s issue plateau only at the largest op counts).
    P_ILP = 4

    def chain_time(body, n_steps, iters):
        def kernel(p_ref, o_ref):
            a, b = p_ref[0], p_ref[1]
            base = (jax.lax.broadcasted_iota(jnp.int32, (TW, TH), 1)
                    .astype(jnp.float32))
            xs = [base * p_ref[2] + (0.5 + 0.01 * k) for k in range(P_ILP)]
            ms = [x > p_ref[3] for x in xs]
            for _ in range(n_steps):
                xs = [body(x, a, b, m) for x, m in zip(xs, ms)]
            acc = xs[0]
            for x in xs[1:]:
                acc = acc + x
            o_ref[...] = acc
        f = pl.pallas_call(
            kernel,
            grid=(n_u, n_v),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((TW, TH), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((n_u * TW, n_v * TH), jnp.float32),
        )
        params = jnp.array([0.9999999, 1e-7, 1.0, 0.25], jnp.float32)
        g = jax.jit(lambda p: f(p))
        return time_fn(lambda: g(params), warmup=1, iters=iters, best_of=3)

    iters = 20 if args.quick else 50

    # slope units: seconds per chain step (P_ILP body bundles on every
    # element of every tile) for the WHOLE frame, divided by P_ILP -> seconds
    # per single body bundle at saturated issue. Fast (single-slot) classes
    # need long chains so the differenced window clears the tunnel's timing
    # noise; the multi-pass classes (sqrt/rsqrt/div) are ~40x slower and can
    # stay short (they also dominate compile time per statement).
    #
    # The chip is pool-shared and contention only ADDS time, so each (body,
    # length) point is measured in several rounds INTERLEAVED across all
    # configs (decorrelating a contended window from any one class) and the
    # per-point minimum taken before differencing.
    CFG = {
        "fma": (lambda x, a, b, m: x * a + b, 256, 1024),
        "sel": (lambda x, a, b, m: jnp.where(m, x * a + b, x), 256, 1024),
        "cmp": (lambda x, a, b, m: jnp.where(x > b, x * a + b, x), 256, 1024),
        "sqrt": (lambda x, a, b, m: jnp.sqrt(x) + b, 64, 256),
        "rsqrt": (lambda x, a, b, m: jax.lax.rsqrt(x) + b, 64, 256),
        "div": (lambda x, a, b, m: a / x + b, 64, 256),
    }
    best = {(k, which): float("inf") for k in CFG for which in ("lo", "hi")}
    reps = 2 if args.quick else 4
    for rep in range(reps):
        for k, (body, n_lo, n_hi) in CFG.items():
            for which, n in (("lo", n_lo), ("hi", n_hi)):
                t = chain_time(body, n, iters)
                best[(k, which)] = min(best[(k, which)], t)
        print(f"chain rep {rep}: " + " ".join(
            f"{k}={(best[(k, 'hi')] - best[(k, 'lo')]) * 1e3:.3f}ms"
            for k in CFG), file=sys.stderr)

    def frame_slope(k):
        _, n_lo, n_hi = CFG[k]
        s = (best[(k, "hi")] - best[(k, "lo")]) / (n_hi - n_lo) / P_ILP
        assert s > 0, (k, best[(k, "lo")], best[(k, "hi")],
                       "contended beyond repair — re-run")
        return s

    s_fma = frame_slope("fma")
    s_sel = frame_slope("sel")
    s_cmp = frame_slope("cmp")
    s_sqrt = frame_slope("sqrt")
    s_rsqrt = frame_slope("rsqrt")
    s_div = frame_slope("div")

    t_alu = s_fma                       # one vector ALU slot (mul, add, fma)
    t_select = max(s_sel - s_fma, 0.0)
    t_cmp = max(s_cmp - s_sel, 0.0)
    t_sqrt = max(s_sqrt - s_fma, 0.0)   # minus the carried add
    t_rsqrt = max(s_rsqrt - s_fma, 0.0)
    t_div = max(s_div - s_fma, 0.0)
    vpu_flops = 2.0 * (n_tiles * elems) / s_fma   # FMA = 2 flops
    print(f"slots (ns/frame-step): fma={s_fma*1e9:.0f} sel={t_select*1e9:.0f} "
          f"cmp={t_cmp*1e9:.0f} sqrt={t_sqrt*1e9:.0f} rsqrt={t_rsqrt*1e9:.0f} "
          f"div={t_div*1e9:.0f}", file=sys.stderr)

    # --- 3. bounds ----------------------------------------------------------
    n_mul = mix.get("mul", 0)
    n_add = mix.get("add", 0)
    n_alu = mix.get("alu", 0)
    n_sel = mix.get("select", 0)
    n_cmp = mix.get("cmp", 0)
    n_sqrt = mix.get("sqrt", 0)
    n_rsqrt = mix.get("rsqrt", 0)
    n_div = mix.get("div", 0)
    n_exp = mix.get("exp", 0)
    pairs = min(n_mul, n_add)
    alu_unfused = n_mul + n_add + n_alu
    alu_fused = alu_unfused - pairs
    t_exp = t_rsqrt  # transcendental class proxy (none in the compat kernel)

    def bound(alu_slots):
        return (alu_slots * t_alu + n_sel * t_select + n_cmp * t_cmp +
                n_sqrt * t_sqrt + n_rsqrt * t_rsqrt + n_div * t_div +
                n_exp * t_exp)

    sol_unfused = bound(alu_unfused)
    sol_fused = bound(alu_fused)
    sol_fma_only = flops_frame / vpu_flops

    # --- 4. fused kernel in an uncontended window ---------------------------
    fused = lambda: render_image_pallas(camera, scene, depth=2,
                                        aliasing=False, compat=True)
    rounds = []
    for r in range(2 if args.quick else args.rounds):
        t = time_fn(fused, warmup=1, iters=100 if not args.quick else 30,
                    best_of=2)
        rounds.append(t)
        print(f"fused round {r}: {t*1e3:.3f} ms", file=sys.stderr)
    t_fused = min(rounds)

    print(f"fused {t_fused*1e3:.3f} ms | sol: fma-only {sol_fma_only*1e3:.3f} "
          f"| mix fused {sol_fused*1e3:.3f} ({sol_fused/t_fused:.1%}) "
          f"| mix unfused {sol_unfused*1e3:.3f} ({sol_unfused/t_fused:.1%})",
          file=sys.stderr)

    soft_out = {}
    if args.soft:
        # Mix bounds for the soft forward + fused-step kernels at the
        # 100-sphere 128^2 fit config, priced with THIS run's slot table
        # scaled per element. Measured-on-chip companions: fwd 11.5 ms,
        # fused step 31.6-32.9 ms (ONCHIP_r05).
        from python_ray_tracer_tpu.ops.pallas.soft_pallas import \
            render_image_soft_pallas
        from python_ray_tracer_tpu.ops.pallas.soft_bwd import \
            soft_loss_and_grads_pallas
        sscene = rt.random_scene(jax.random.PRNGKey(0), n_spheres=100)
        scam = rt.default_camera((128, 128))
        stgt = jnp.zeros((128, 128, 3), jnp.float32)
        per_elem = {k: v / (n_tiles * elems) for k, v in dict(
            fma=s_fma * 1e9, select=t_select * 1e9, cmp=t_cmp * 1e9,
            sqrt=t_sqrt * 1e9, rsqrt=t_rsqrt * 1e9, div=t_div * 1e9).items()}

        def soft_bound(fn, *fargs):
            jx2 = jax.make_jaxpr(fn)(*fargs)
            c2 = []
            _find_pallas(jx2.jaxpr, c2)
            m = Counter()
            _walk(c2[-1].params["jaxpr"], m)
            n_elems = 4 * 40 * 128   # 128^2 swap-resolved grid incl. pad
            alu2 = m.get("mul", 0) + m.get("add", 0) + m.get("alu", 0)
            fused2 = alu2 - min(m.get("mul", 0), m.get("add", 0))

            def b(a):
                return (a * per_elem["fma"] + m.get("select", 0) *
                        per_elem["select"] + m.get("cmp", 0) * per_elem["cmp"]
                        + m.get("sqrt", 0) * per_elem["sqrt"]
                        + m.get("rsqrt", 0) * per_elem["rsqrt"]
                        + (m.get("div", 0) + m.get("exp", 0)) *
                        per_elem["div"]) * n_elems * 1e-6
            return [round(b(fused2), 2), round(b(alu2), 2)]

        soft_out["soft_fwd_mix_bound_ms"] = soft_bound(
            lambda s: render_image_soft_pallas(scam, s, tau=0.05), sscene)
        soft_out["soft_step_mix_bound_ms"] = soft_bound(
            lambda s: soft_loss_and_grads_pallas(scam, s, stgt, tau=0.05),
            sscene)
        print(f"soft kernels @100sph/128^2: fwd bound "
              f"{soft_out['soft_fwd_mix_bound_ms']} ms (measured 11.5), "
              f"step bound {soft_out['soft_step_mix_bound_ms']} ms "
              f"(measured 31.6-32.9)", file=sys.stderr)

    print(json.dumps(dict(
        metric="vpu_sol",
        **soft_out,
        mix_per_tile={k: int(v) for k, v in sorted(mix.items())},
        n_tiles=n_tiles,
        slot_ns_per_frame_step=dict(
            fma=round(s_fma * 1e9), select=round(t_select * 1e9),
            cmp=round(t_cmp * 1e9), sqrt=round(t_sqrt * 1e9),
            rsqrt=round(t_rsqrt * 1e9), div=round(t_div * 1e9)),
        flops_per_frame=flops_frame,
        vpu_tflops_achieved=round(vpu_flops / 1e12, 3),
        fused_ms=round(t_fused * 1e3, 3),
        fused_rounds_ms=[round(t * 1e3, 3) for t in rounds],
        sol_fma_only_ms=round(sol_fma_only * 1e3, 3),
        sol_mix_fused_ms=round(sol_fused * 1e3, 3),
        sol_mix_unfused_ms=round(sol_unfused * 1e3, 3),
        sol_fraction_fma_only=round(sol_fma_only / t_fused, 3),
        sol_fraction_mix=[round(sol_fused / t_fused, 3),
                          round(sol_unfused / t_fused, 3)],
    )))
    return 0


if __name__ == "__main__":
    sys.exit(main())
