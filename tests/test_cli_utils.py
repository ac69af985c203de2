"""CLI and utility-layer coverage (cheap, CPU-only)."""
import json
import os

import numpy as np
import pytest

import python_ray_tracer_tpu as rt
from python_ray_tracer_tpu.cli import main
from python_ray_tracer_tpu.utils.metrics import MetricsLogger
from python_ray_tracer_tpu.utils.profiling import annotate, capture_trace
from python_ray_tracer_tpu.utils.timing import time_fn, rays_per_image


def test_cli_render_writes_png(tmp_path):
    out = os.path.join(tmp_path, "r.png")
    assert main(["render", "--width", "24", "--height", "24", "--depth", "0",
                 "--no-aliasing", "--out", out]) == 0
    from PIL import Image
    img = Image.open(out)
    assert img.size == (24, 24)


def test_cli_render_clean_and_soft(tmp_path):
    out1 = os.path.join(tmp_path, "clean.png")
    out2 = os.path.join(tmp_path, "soft.png")
    assert main(["render", "--width", "16", "--height", "16", "--clean",
                 "--no-aliasing", "--depth", "0", "--out", out1]) == 0
    assert main(["render", "--width", "16", "--height", "16", "--soft", "0.05",
                 "--out", out2]) == 0
    a = np.asarray(__import__("PIL.Image", fromlist=["Image"]).open(out1))
    b = np.asarray(__import__("PIL.Image", fromlist=["Image"]).open(out2))
    assert a.shape == b.shape == (16, 16, 3)
    assert not np.array_equal(a, b)  # soft edges differ from hard


def test_render_fn_routes_dense_soft_to_kernel():
    """Dense soft scenes route through the rolled pallas kernel — including
    >16 planes (round 5: plane folds roll like sphere folds; the last
    jnp fallback class is gone)."""
    import dataclasses
    import jax
    from python_ray_tracer_tpu.cli import _render_fn
    from python_ray_tracer_tpu.utils.config import RenderConfig

    cfg = RenderConfig(backend="pallas")
    dense = rt.random_scene(jax.random.key(0), 100)
    fn = _render_fn(cfg, soft_tau=0.05, scene=dense)
    assert "render_image_soft_pallas" in fn.__code__.co_freevars

    many_planes = dataclasses.replace(
        dense, planes=rt.Planes.build(
            [([5 + i, 0, 0], [0, 0, 1], rt.GREY) for i in range(17)]))
    fn2 = _render_fn(cfg, soft_tau=0.05, scene=many_planes)
    assert "render_image_soft_pallas" in fn2.__code__.co_freevars


def test_cli_random_scene(tmp_path):
    out = os.path.join(tmp_path, "rand.png")
    assert main(["render", "--width", "16", "--height", "16", "--spheres", "5",
                 "--depth", "0", "--no-aliasing", "--out", out]) == 0


def test_cli_rejects_unknown_flag():
    with pytest.raises(SystemExit) as e:
        main(["render", "--widht", "64"])
    assert e.value.code == 2


def test_metrics_logger_jsonl(tmp_path):
    log = MetricsLogger("t", echo=False)
    log.log(0, loss=1.5, mrays=2.0)
    log.log(1, loss=0.5)
    path = os.path.join(tmp_path, "m.jsonl")
    log.dump_jsonl(path)
    recs = [json.loads(l) for l in open(path)]
    assert len(recs) == 2 and recs[0]["loss"] == 1.5
    assert log.last("loss") == 0.5
    assert log.last("mrays") == 2.0


def test_time_fn_measures():
    calls = []

    def fn():
        calls.append(1)
        import jax.numpy as jnp
        return jnp.ones(4)

    secs = time_fn(fn, warmup=1, iters=3, best_of=2)
    assert secs >= 0.0
    assert len(calls) == 1 + 3 * 2


def test_rays_per_image_accounting():
    # no AA: every pixel = (1+depth) traces x (1+lights) sweeps
    assert rays_per_image(10, 10, depth=2, aliasing=False, n_lights=3) == \
        100 * 3 * 4
    # AA: interior 9 samples, border 1
    n = rays_per_image(4, 4, depth=0, aliasing=True, n_lights=0)
    assert n == (4 * 9 + 12 * 1) * 1
    assert rays_per_image(10, 10, depth=2, aliasing=False, n_lights=3,
                          primary_only=True) == 100


def test_profiling_capture(tmp_path):
    d = os.path.join(tmp_path, "trace")
    with capture_trace(d):
        with annotate("scope"):
            img = rt.render_image(rt.default_camera((8, 8)), rt.default_scene(),
                                  depth=0, aliasing=False)
            img.block_until_ready()
    files = [f for _, _, fs in os.walk(d) for f in fs]
    assert files, "no trace files captured"


def test_config_reference_defaults():
    from python_ray_tracer_tpu.utils.config import RenderConfig
    cfg = RenderConfig.reference_defaults()
    # main.py:10-12 values
    assert (cfg.width, cfg.height) == (1000, 1000)
    assert (cfg.ambient, cfg.lambert, cfg.reflection) == (0.0, 0.6, 0.3)
    assert cfg.depth == 2 and cfg.aliasing and cfg.fov == 45.0


def test_cli_fit_camera_smoke(tmp_path):
    """fit --mode camera runs end-to-end (pose params, Euler round-trip, PNG)."""
    out = os.path.join(tmp_path, "cam.png")
    assert main(["fit", "--mode", "camera", "--width", "12", "--height", "12",
                 "--depth", "0", "--steps", "2", "--out", out]) == 0
    assert os.path.exists(out)
