"""Independent scalar oracle for parity testing.

This is a from-the-spec reimplementation of the reference tracer's documented
semantics (SURVEY.md §2-3) in plain scalar numpy/f64 — deliberately structured
differently from both the reference (numba tuples) and the framework (batched jnp),
so that agreement between the three is meaningful evidence of correctness.

The reference itself cannot run here (numba is not installed, so the CUDA-simulator
oracle planned in SURVEY §4 is unavailable); this module stands in as the golden
implementation. Scope: compat mode only, per-pixel loops, small images.

Semantics covered (citations into /root/reference):
  * pixel grid with int(w/h) aspect truncation          camera.py:22-26
  * closest hit: init 999.0, strict ``best > t > 0``,
    spheres before planes                               trace.py:17-41
  * sphere quadratic with internal renormalize          intersections.py:7-38
  * plane with 1e-3 parallel threshold                  intersections.py:42-68
  * ambient + shadow-masked Lambert, 2e-4 biases        trace.py:77-110
  * shadow = unlimited-range any-hit                    trace.py:92-96
  * bounce loop with dead-sentinel semantics            trace.py:115-133
  * AA interior 3x3 half-offset sampling with the
    G/B accumulation swap + store swap                  kernels.py:29-73
  * round-half-even 0-255 quantization                  common.py:52-57
"""
from __future__ import annotations

import numpy as np

MISS = None  # oracle uses Python-level None instead of 404 sentinels


def euler_rot(roll_deg, pitch_deg, yaw_deg):
    r, p, y = np.deg2rad([roll_deg, pitch_deg, yaw_deg])
    cr, sr, cp, sp, cy, sy = np.cos(r), np.sin(r), np.cos(p), np.sin(p), np.cos(y), np.sin(y)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, -sp], [0, 1, 0], [sp, 0, cp]])  # reference sign convention
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def _unit(v):
    return v / np.linalg.norm(v)


def sphere_t(o, d, c, r):
    d = _unit(d)
    L = o - c
    a = d @ d
    b = 2.0 * (L @ d)
    cc = L @ L - r * r
    disc = b * b - 4.0 * a * cc
    if disc < 0.0:
        return MISS
    sq = np.sqrt(disc)
    for num in (-b - sq, -b + sq):
        if num > 0.0:
            return num / (2.0 * a)
    return MISS


def plane_t(o, d, p0, n):
    denom = d @ n
    if abs(denom) < 1e-3:
        return MISS
    t = ((p0 - o) @ n) / denom
    return t if t > 0.0 else MISS


class OracleScene:
    """Scene in the reference's SoA layout: spheres (7,N), lights (3,L), planes (9,M).
    Colors in 0-255 scale."""

    def __init__(self, spheres, lights, planes):
        self.spheres = np.asarray(spheres, np.float64)
        self.lights = np.asarray(lights, np.float64)
        self.planes = np.asarray(planes, np.float64)


def closest(o, d, sc: OracleScene):
    """-> (t, kind, idx) with kind in {'sphere','plane',None}; 999.0 far clip."""
    best, kind, idx = 999.0, None, -1
    for j in range(sc.spheres.shape[1]):
        t = sphere_t(o, d, sc.spheres[0:3, j], sc.spheres[3, j])
        if t is not MISS and best > t > 0.0:
            best, kind, idx = t, "sphere", j
    for j in range(sc.planes.shape[1]):
        t = plane_t(o, d, sc.planes[0:3, j], sc.planes[3:6, j])
        if t is not MISS and best > t > 0.0:
            best, kind, idx = t, "plane", j
    return best, kind, idx


def shade(o, d, sc: OracleScene, amb, lamb):
    """One trace: -> (rgb 0-255, next_origin, next_dir, alive)."""
    t, kind, idx = closest(o, d, sc)
    if kind is None:
        return np.zeros(3), None, None, False
    P = o + t * d
    if kind == "sphere":
        col = sc.spheres[4:7, idx].copy()
        N = _unit(P - sc.spheres[0:3, idx])
    else:
        col = sc.planes[6:9, idx].copy()
        N = _unit(sc.planes[3:6, idx])
    rgb = amb * col
    P = P + 2e-4 * N
    for j in range(sc.lights.shape[1]):
        L = _unit(sc.lights[0:3, j] - P)
        _, k2, _ = closest(P, L, sc)
        if k2 is not None:
            continue
        inten = lamb * (L @ N)
        if inten > 0.0:
            rgb = rgb + inten * col
    R = _unit(d - 2.0 * (d @ N) * N)
    P = P + 2e-4 * R
    return rgb, P, R, True


def sample(o, d, sc, amb, lamb, refl, depth):
    rgb, P, R, alive = shade(o, d, sc, amb, lamb)
    for i in range(depth):
        if not alive:
            break
        rgb2, P, R, alive = shade(P, R, sc, amb, lamb)
        rgb = rgb + (refl ** (i + 1)) * rgb2
    return rgb


def render(sc: OracleScene, w, h, cam_pos, cam_euler, fov=45.0,
           amb=0.0, lamb=0.6, refl=0.3, depth=2, aliasing=True):
    """Full compat render -> uint8 (3, w, h) framebuffer."""
    cam_pos = np.asarray(cam_pos, np.float64)
    Rm = euler_rot(*cam_euler)
    AR = int(w / h)
    ys = np.linspace(AR, -AR, w)
    zs = np.linspace(1.0, -1.0, h)
    focal = 1.0 / np.tan(np.deg2rad(fov) / 2.0)
    dy = ys[1] - ys[0] if w > 1 else 0.0
    dz = zs[1] - zs[0] if h > 1 else 0.0

    def ray_rgb(fx, fy):
        p = np.array([focal, ys[0] + fx * dy, zs[0] + fy * dz])
        return sample(cam_pos, _unit(Rm @ p), sc, amb, lamb, refl, depth)

    fb = np.zeros((3, w, h), np.uint8)
    offs = [(-0.5, 0), (0.5, 0), (0, 0.5), (0, -0.5),
            (-0.5, 0.5), (0.5, 0.5), (-0.5, -0.5), (0.5, -0.5)]
    for x in range(w):
        for y in range(h):
            pr, pg, pb = ray_rgb(float(x), float(y))
            R, G, B = pr, pg, pb
            if aliasing and 1 <= x <= w - 2 and 1 <= y <= h - 2:
                for ox, oy in offs:
                    sr, sg, sb = ray_rgb(x + ox, y + oy)
                    R += sr
                    G += sb  # accumulation swap, kernels.py:59-60
                    B += sg
                R, G, B = R / 9.0, G / 9.0, B / 9.0
            # store swap (common.py:61-63) + round-half-even clip
            for ch, val in enumerate((R, B, G)):
                fb[ch, x, y] = int(min(max(0, round(val)), 255))
    return fb


def default_scene_soa():
    """The reference demo scene in SoA form (scene.py:100-115), colors 0-255."""
    RED, GREEN, BLUE = [255, 70, 70], [70, 255, 70], [70, 70, 255]
    YELLOW, GREY, MAGENTA = [255, 255, 70], [125, 125, 125], [139, 0, 139]
    sph = [([2.2, 0.3, 1.0], 1.0, RED), ([0.6, 0.7, 0.4], 0.4, BLUE),
           ([0.6, -0.8, 0.5], 0.5, YELLOW), ([-1.2, 0.2, 0.5], 0.5, MAGENTA),
           ([-1.7, -0.5, 0.3], 0.3, GREEN), ([-2.0, 1.31, 1.3], 1.3, RED)]
    spheres = np.zeros((7, len(sph)))
    for i, (c, r, col) in enumerate(sph):
        spheres[0:3, i], spheres[3, i], spheres[4:7, i] = c, r, col
    lights = np.array([[2.5, -2.0, 3.0], [2.5, 2.0, 3.0], [5.0, 0.1, 6.0]]).T
    planes = np.zeros((9, 1))
    planes[0:3, 0] = [5, 0, 0]
    planes[3:6, 0] = _unit(np.array([0.0, 0.0, 1.0]))
    planes[6:9, 0] = GREY
    return spheres, lights, planes
