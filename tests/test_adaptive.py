"""Adaptive AA (stream-compacted per-pixel worklist, ops/pallas/render_adaptive).

Mechanics are pinned in interpret mode at small sizes; the production-scale
quality/perf contract (a measured negative — the mode is opt-in) lives in the
on-chip artifacts (ONCHIP_r04 / docs/ROADMAP round-4 section).

The three kernel tests share one 64x48 demo configuration and a module-scoped
reference render: interpret-mode traces dominate the cost, so every extra
resolution/flavor is a suite-time line item.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from python_ray_tracer_tpu.models import Camera, default_scene
from python_ray_tracer_tpu.ops.pallas.render_adaptive import (
    _curvature_flags, _tent_image, render_image_adaptive)
from python_ray_tracer_tpu.ops.pallas.render_pallas import render_image_pallas
from python_ray_tracer_tpu.ops.render import to_framebuffer

W, H = 64, 48
_KW = dict(tile_w=8, tile_h=32, interpret=True)


def _demo(w=W, h=H):
    return (Camera.build((w, h), position=[-2.0, 0.0, 2.0],
                         euler=[0.0, -30.0, 0.0]), default_scene())


@pytest.fixture(scope="module")
def demo_ref():
    """Demo camera/scene + the per-sample AA kernel's image (the oracle)."""
    cam, scene = _demo()
    ref = np.asarray(render_image_pallas(cam, scene, depth=2, aliasing=True,
                                         compat=True, aa_share=False, **_KW))
    return cam, scene, ref


def _q(img):
    return np.asarray(to_framebuffer(jnp.asarray(img)), np.int32)


def test_all_flagged_matches_per_sample_kernel(demo_ref):
    """eps<0 + covering budget: every interior pixel goes through the
    worklist; result matches the per-sample AA kernel to FMA-contraction
    ULPs (cross-kernel tolerance class) and quantizes identically."""
    cam, scene, ref = demo_ref
    out, stats = render_image_adaptive(cam, scene, depth=2, compat=True,
                                       eps=-1.0, budget_frac=1.0,
                                       with_stats=True, **_KW)
    out = np.asarray(out)
    assert int(stats["flagged"]) == (W - 2) * (H - 2)   # every interior px
    assert int(stats["dropped"]) == 0
    assert np.abs(out - ref).max() <= 3e-5
    d = np.abs(_q(out) - _q(ref))
    assert d.max() <= 1 and (d > 0).mean() <= 0.002     # quantization straddles


def test_quality_and_stats_demo(demo_ref):
    """Production threshold (eps=0.5/255): quantized output within 1 step of
    full AA wherever the worklist ran; tent fallback below quantization on
    smooth pixels (production-resolution quality evidence: ONCHIP_r04)."""
    cam, scene, ref = demo_ref
    out, stats = render_image_adaptive(cam, scene, depth=2, compat=True,
                                       eps=0.5 / 255, budget_frac=1.0,
                                       with_stats=True, **_KW)
    assert int(stats["dropped"]) == 0
    q = np.abs(_q(out) - _q(ref))
    assert (q > 1).mean() <= 0.005, f"{(q > 1).mean():.2%} pixels off by >1"
    assert 0 < int(stats["flagged"]) < W * H


def test_budget_overflow_keeps_tent_and_reports(demo_ref):
    cam, scene, _ = demo_ref
    out, stats = render_image_adaptive(cam, scene, depth=2, compat=True,
                                       eps=0.5 / 255, budget_frac=0.05,
                                       with_stats=True, **_KW)
    out = np.asarray(out)
    assert int(stats["dropped"]) == int(stats["flagged"]) - int(0.05 * W * H)
    assert np.isfinite(out).all()
    # dropped pixels fall back to the tent image, not garbage: the image
    # stays in valid color range
    assert out.min() >= -1e-3 and out.max() <= 2.0


@pytest.mark.slow
def test_all_flagged_matches_per_sample_kernel_clean():
    """Clean-mode (no quirk swaps) exactness variant of the fast compat test."""
    cam, scene = _demo()
    ref = np.asarray(render_image_pallas(cam, scene, depth=2, aliasing=True,
                                         compat=False, aa_share=False, **_KW))
    out = np.asarray(render_image_adaptive(cam, scene, depth=2, compat=False,
                                           eps=-1.0, budget_frac=1.0, **_KW))
    assert np.abs(out - ref).max() <= 3e-5


def test_curvature_flags_ramp_vs_edge():
    """First differences must NOT flag (steep linear ramp); second
    differences must (step edge), including the 1-px dilation ring;
    borders never flag."""
    w, h = 32, 24
    x = jnp.arange(w, dtype=jnp.float32)[:, None] * jnp.ones((1, h))
    ramp = jnp.stack([x * 0.1] * 3, axis=-1)          # steep linear ramp
    # away from the jnp.roll wrap ring (conservative extra flags at the
    # frame edge only — module docstring): a linear ramp never flags
    assert not bool(_curvature_flags(ramp, w, h, 0.5 / 255)[2:-2].any())
    step = jnp.stack([(x >= 16).astype(jnp.float32)] * 3, axis=-1)
    f = np.asarray(_curvature_flags(step, w, h, 0.5 / 255))
    assert f[15:18, 2:h - 2].all()                    # edge + dilation ring
    assert not f[3:13].any() and not f[20:-3].any()   # far field unflagged
    assert not f[:, 0].any() and not f[:, -1].any()   # borders excluded


def test_tent_exact_on_linear_field():
    w, h = 16, 12
    x = jnp.arange(w, dtype=jnp.float32)[:, None] * jnp.ones((1, h))
    y = jnp.ones((w, 1)) * jnp.arange(h, dtype=jnp.float32)[None, :]
    lin = jnp.stack([0.3 * x + 0.01 * y, 0.2 * x, 0.05 * y], axis=-1)
    t = np.asarray(_tent_image(lin, w, h, compat=False))
    np.testing.assert_allclose(t[1:-1, 1:-1], np.asarray(lin)[1:-1, 1:-1],
                               rtol=0, atol=1e-5)
