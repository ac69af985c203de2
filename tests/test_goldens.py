"""Golden-framebuffer regression tests.

Pinned uint8 renders of the demo scene guard against silent behavior drift
across rounds of development (the reference's only 'verification' was eyeballing
the output PNG — these make that check exact and automatic). Regenerate with
the snippet in tests/goldens/README if an *intentional* behavior change lands.
"""
import os

import numpy as np
import pytest

import python_ray_tracer_tpu as rt

_GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "demo_frames.npz")

_CONFIGS = {
    "demo_64_d2_aa_compat": ((64, 64), 2, True, True),
    "demo_64_d2_noaa_clean": ((64, 64), 2, False, False),
    "demo_48_d4_noaa_compat": ((48, 48), 4, False, True),
}


@pytest.mark.parametrize("name", sorted(_CONFIGS))
def test_golden_framebuffer(name, demo_scene):
    (w, h), depth, aa, compat = _CONFIGS[name]
    cam = rt.default_camera((w, h))
    img = rt.render_image(cam, demo_scene, depth=depth, aliasing=aa,
                          compat=compat)
    fb = np.asarray(rt.to_framebuffer(img)).astype(np.int32)
    want = np.load(_GOLDEN)[name].astype(np.int32)
    diff = np.abs(fb - want)
    # Exact on the platform that generated them; tolerate single-level rounding
    # drift elsewhere. Anything larger is a behavior change.
    assert diff.max() <= 1, f"{name}: max diff {diff.max()}"
    assert (diff > 0).mean() < 0.01, f"{name}: {(diff > 0).mean():.2%} changed"
