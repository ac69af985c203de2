"""On-chip soft-kernel parity with tie-class population accounting.

VERDICT r4 weak #4: the rolled soft kernel's parity tolerance is loose at
ties (max_abs ~5e-3 at 128**2 / ~7e-3 at 512**2) and the diagnosis — the
near-tie compositing-order class, where the kernel's recomputed blend depths
land on the other side of a bit-level tie than the jnp path's argsort — was
supported only by interpret-mode rolled==unrolled equality. This probe pins
the POPULATION on real hardware, the way the hard path pins flipped-pixel
counts: it renders kernel-vs-jnp at the dense-fit config, counts pixels
above tolerance, and classifies each such pixel by its minimum adjacent
blend-depth gap among significantly-covering objects (computed from the jnp
path's own alphas/depths). Healthy = a tiny population (<0.2%) that is
overwhelmingly (>90%) in the near-tie class.

Run on the real chip:  python benchmarks/soft_parity_onchip.py
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--spheres", type=int, default=100)
    ap.add_argument("--tol", type=float, default=1e-3,
                    help="per-channel abs diff above which a pixel counts")
    ap.add_argument("--tie-eps", type=float, default=5e-3,
                    help="relative adjacent-depth gap below which a pixel is "
                         "in the near-tie class")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp
    import numpy as np

    import python_ray_tracer_tpu as rt
    from python_ray_tracer_tpu.ops.soft import (render_image_soft,
                                                _sphere_soft_cover,
                                                _plane_cover)
    from python_ray_tracer_tpu.ops.pallas.soft_pallas import (
        render_image_soft_pallas)

    tau = 0.05
    N = args.res
    cam = rt.default_camera((N, N))
    scene = rt.random_scene(jax.random.PRNGKey(0), n_spheres=args.spheres)

    img_k = np.asarray(render_image_soft_pallas(cam, scene, tau=tau))
    rc = 8 if N >= 512 else None
    img_j = np.asarray(render_image_soft(cam, scene, tau=tau, row_chunk=rc))
    diff = np.abs(img_k - img_j).max(axis=-1)

    # --- per-pixel minimum adjacent blend-depth gap (jnp-side geometry) -----
    def depth_gaps():
        xs = jnp.arange(N, dtype=jnp.float32)
        pix = jnp.stack(jnp.meshgrid(xs, xs, indexing="ij"), axis=-1)
        d = cam.ray_directions(pix, compat=False)
        o = jnp.broadcast_to(cam.ray_origin(), d.shape)
        a_s, t_s = _sphere_soft_cover(o, d, scene.spheres.center,
                                      scene.spheres.radius, tau)
        a_p, t_p = _plane_cover(o, d, scene.planes.origin, scene.planes.normal)
        alpha = jnp.concatenate([a_s, a_p], axis=-1)
        t = jnp.concatenate([t_s, t_p], axis=-1)
        # only objects that materially participate in the composite
        t_sig = jnp.where(alpha > 0.01, t, jnp.inf)
        t_sorted = jnp.sort(t_sig, axis=-1)
        gap = jnp.diff(t_sorted, axis=-1)
        gap = jnp.where(jnp.isfinite(gap), jnp.abs(gap), jnp.inf)
        min_gap = jnp.min(gap, axis=-1)
        ref = jnp.where(jnp.isfinite(t_sorted[..., 0]),
                        jnp.maximum(t_sorted[..., 0], 1e-3), 1.0)
        return min_gap / ref   # relative adjacent gap

    rel_gap = np.asarray(jax.jit(depth_gaps)())

    bad = diff > args.tol
    n_bad = int(bad.sum())
    near_tie = rel_gap < args.tie_eps
    bad_near_tie = int((bad & near_tie).sum())
    out = dict(
        metric="soft_parity_tie_population",
        res=N, spheres=args.spheres, tau=tau, tol=args.tol,
        max_abs=float(diff.max()),
        mean_abs=float(np.abs(img_k - img_j).mean()),
        pixels=int(diff.size),
        pixels_above_tol=n_bad,
        frac_above_tol=round(n_bad / diff.size, 6),
        frac_of_bad_in_near_tie_class=(round(bad_near_tie / n_bad, 4)
                                       if n_bad else 1.0),
        near_tie_eps_rel=args.tie_eps,
    )
    print(json.dumps(out))
    healthy = (out["frac_above_tol"] < 0.002
               and out["frac_of_bad_in_near_tie_class"] > 0.9)
    print(("HEALTHY" if healthy else "UNHEALTHY"), file=sys.stderr)
    return 0 if healthy else 1


if __name__ == "__main__":
    sys.exit(main())
