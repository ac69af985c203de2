"""Adaptive-AA feasibility probe: tile coverage + tent quality (CPU, ~30 s).

The measurement that settled ops/pallas/render_adaptive.py's design and its
eventual measured-negative verdict (docs/ROADMAP.md round-4 item 5):

1. **Tile coverage** — for candidate Mosaic tile shapes, the fraction of
   demo-scene tiles at 1080p containing at least one curvature-flagged pixel.
   Result: 70-95% at every viable shape (the 128-lane minimum width crosses
   an edge almost everywhere), which kills tile-granular skipping outright —
   the estimated-ms model here uses the shared-AA kernel's realized unit cost
   ``1 + (TW+8)/TW*(1+f) + f`` with ``f`` the +1-halo lane-padding factor.
2. **Tent quality** — the 3x3 tent (bilinear-sample) approximation vs true
   3x3 AA on pixels the curvature metric leaves unflagged: max error
   0.33/255 at eps=0.5/255 (below uint8 quantization), which is what makes
   the per-pixel fallback sound. (The per-pixel WORKLIST pipeline's own
   negative — compaction/gather tax + loss of tile-coherent culls — is an
   on-chip result, recorded in ONCHIP_r04.json.)

Usage: python benchmarks/adaptive_sweep.py   (runs on CPU; prints one JSON
line with the headline numbers, rows on stderr)
"""
from __future__ import annotations

import json
import os
import sys


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import jax.numpy as jnp

    from python_ray_tracer_tpu.models import Camera, default_scene
    from python_ray_tracer_tpu.ops.pallas.render_adaptive import (
        _curvature_flags, _tent_image)
    from python_ray_tracer_tpu.ops.render import render_image

    scene = default_scene()

    def centers_rgb(w, h):
        """Clean (r,g,b) centers — the production pipeline's C input."""
        cam = Camera.build((w, h), position=[-2.0, 0.0, 2.0],
                           euler=[0.0, -30.0, 0.0])
        img = render_image(cam, scene, depth=2, aliasing=False, compat=True)
        return img[..., jnp.asarray([0, 2, 1])]   # undo the no-AA store swap

    # --- 1. tile coverage at 1080p (swap_xy layout: U=H sublanes, V=W lanes)
    # Uses the PRODUCTION metric (render_adaptive._curvature_flags) so the
    # probe measures exactly what ships.
    W, H = 1920, 1080
    C1080 = centers_rgb(W, H)
    eps = 1.0 / 255
    flagged = np.asarray(_curvature_flags(C1080, W, H, eps)).T   # (U, V)
    rows = []
    for TW, TH in ((40, 384), (24, 384), (40, 128), (16, 128), (8, 128)):
        f = -(-(TH + 1) // 128) * 128 / TH   # +1-halo lane-padding factor
        units = 1 + (TW + 8) / TW * (1 + f) + f
        nu, nv = -(-H // TW), -(-W // TH)
        pad = np.zeros((nu * TW, nv * TH), bool)
        pad[:H, :W] = flagged
        frac = float(pad.reshape(nu, TW, nv, TH).any((1, 3)).mean())
        rows.append(dict(tile=f"{TW}x{TH}", units=round(units, 2),
                         flagged_tiles_pct=round(frac * 100, 1)))
        print(f"tile {TW:3d}x{TH:3d}: units {units:4.2f}  "
              f"flagged tiles {frac * 100:5.1f}%", file=sys.stderr)
    px_frac = float(flagged.mean())
    print(f"flagged PIXELS at 1080p: {px_frac * 100:.1f}%", file=sys.stderr)

    # --- 2. tent quality on unflagged pixels at 512x288 (production
    # _tent_image, incl. the compat combine + border handling)
    W2, H2 = 512, 288
    C = centers_rgb(W2, H2)
    cam2 = Camera.build((W2, H2), position=[-2.0, 0.0, 2.0],
                        euler=[0.0, -30.0, 0.0])
    aa = np.asarray(render_image(cam2, scene, depth=2, aliasing=True,
                                 compat=True))
    approx = np.asarray(_tent_image(C, W2, H2, compat=True))
    err = np.abs(approx - aa).max(-1)
    smooth = ~np.asarray(_curvature_flags(C, W2, H2, 0.5 / 255))
    e = err[smooth]
    print(f"tent err on unflagged px (eps=0.5/255): max {e.max()*255:.2f}/255 "
          f"p99.9 {np.percentile(e, 99.9)*255:.2f}/255", file=sys.stderr)

    print(json.dumps({
        "metric": "adaptive_aa_probe",
        "flagged_pixels_pct_1080p": round(px_frac * 100, 1),
        "tent_err_max_255ths_smooth": round(float(e.max()) * 255, 2),
        "tile_rows": rows,
        "verdict": "tile-granular adaptivity unviable (70-95% coverage); "
                   "per-pixel worklist negative on chip (ONCHIP_r04)",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
