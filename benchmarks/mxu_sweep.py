"""Can the MXU accelerate the sphere-intersection sweep? (NEGATIVE result)

Measured on one v5e (2026-08-17, 1080p primary closest-hit):

  | K objects | XLA scan (VPU) | XLA matrix (MXU dots) | fused Pallas FULL render |
  |---|---|---|---|
  | 100  | 16.3 ms | 9.7 ms  | 11.0 ms (incl. shading/shadows/bounces) |
  | 1000 | 151 ms  | 81.7 ms | 98.4 ms (ditto) |

Within XLA-land the matrix form wins ~1.7x, BUT the production fused kernel
renders the ENTIRE frame in about the time the matrix form needs for the
closest-hit alone. Why the MXU can't pay here: (a) the only matmul-shaped
work is cd = d.c_j — ~25% of the sweep's arithmetic; the quadratic solve +
winner reduction stay on the VPU over the full (N, K) matrix; (b) f32-exact
dots cost 3 bf16 MXU passes (DEFAULT precision flips ~30% of closest-hit
winners — unacceptable vs the reference semantics); (c) the matrix form
cannot use the per-tile cone cull, so it does K work where the kernel does
min(K, 32). Conclusion: the sweep stays a VPU loop inside the fused kernel.

Original experiment doc:

The sweep's only matmul-shaped work is the per-(ray, object) dot products
cd = d . c_j (and oc = o . c_j for bounce rays). This micro-bench times the
closest-hit over 1080p x K spheres in two XLA forms:
  A. "vpu": per-object scan carrying the best-t (the fused kernel's shape)
  B. "mxu": batched (N,3) @ (3,K) dots -> (N,K) quadratic solve -> argmin
to see whether routing the dots through the MXU pays for the (N,K)
materialization/fusion behavior.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from functools import partial
import python_ray_tracer_tpu as rt
from python_ray_tracer_tpu.utils.timing import time_fn

import os
K = int(os.environ.get('K', '100'))
PREC = os.environ.get('PREC', 'default')
scene = rt.random_scene(jax.random.key(0), K)
cam = rt.Camera.build((1920, 1080), [-12.0, 0.0, 4.0], [0.0, -15.0, 0.0])
o = cam.position                                   # (3,) shared primary origin
pl = cam.pixel_locations(compat=True)              # (3, w, h) camera space
d = (cam.rotation @ pl.reshape(3, -1)).T           # (N, 3) unnormalized
C = scene.spheres.center                           # (K, 3)
r = scene.spheres.radius                           # (K,)

@jax.jit
def vpu_form(d, o, C, r):
    a = jnp.sum(d * d, axis=-1)                    # (N,)
    oc_all = C @ o                                 # (K,)
    cc = jnp.sum(C * C, axis=-1) - r * r           # (K,)
    oo = jnp.dot(o, o)

    def body(carry, j):
        best_t, best_j = carry
        cd = d @ C[j]                              # (N,)
        b = 2.0 * (d @ o - cd)
        c = oo - 2.0 * oc_all[j] + cc[j]
        disc = b * b - 4.0 * a * c
        has = disc >= 0.0
        sq = jnp.sqrt(jnp.where(has, disc, 0.0))
        nn, nf = -b - sq, -b + sq
        t = jnp.where(nn > 0.0, nn, nf) / (2.0 * a)
        valid = has & (nf > 0.0) & (t < 999.0) & (t < best_t)
        best_t = jnp.where(valid, t, best_t)
        best_j = jnp.where(valid, j, best_j)
        return (best_t, best_j), None

    init = (jnp.full(d.shape[0], 999.0), jnp.full(d.shape[0], -1, jnp.int32))
    (bt, bj), _ = jax.lax.scan(body, init, jnp.arange(K))
    return bt, bj

@jax.jit
def mxu_form(d, o, C, r):
    a = jnp.sum(d * d, axis=-1, keepdims=True)     # (N,1)
    prec = (jax.lax.Precision.HIGHEST if PREC == 'highest'
            else jax.lax.Precision.DEFAULT)
    cd = jnp.dot(d, C.T, precision=prec)           # (N,K)  <- MXU
    od = (d @ o)[:, None]                          # (N,1)
    oc = (C @ o)[None, :]                          # (1,K)
    cc = (jnp.sum(C * C, axis=-1) - r * r)[None, :]
    oo = jnp.dot(o, o)
    b = 2.0 * (od - cd)                            # (N,K)
    c = oo - 2.0 * oc + cc                         # (1,K) -> broadcast
    disc = b * b - 4.0 * a * c
    has = disc >= 0.0
    sq = jnp.sqrt(jnp.where(has, disc, 0.0))
    nn, nf = -b - sq, -b + sq
    t = jnp.where(nn > 0.0, nn, nf) / (2.0 * a)
    t = jnp.where(has & (nf > 0.0) & (t < 999.0), t, 999.0)
    bj = jnp.argmin(t, axis=-1)
    bt = jnp.min(t, axis=-1)
    return bt, bj

va, vj = vpu_form(d, o, C, r)
ma, mj = mxu_form(d, o, C, r)
hit = np.asarray(vj) >= 0
print("agree t:", np.allclose(np.asarray(va), np.asarray(ma), atol=1e-3),
      "agree j:", (np.asarray(vj)[hit] == np.asarray(mj)[hit]).mean(), flush=True)

sv = time_fn(lambda: vpu_form(d, o, C, r)[0], warmup=1, iters=50, best_of=2)
sm = time_fn(lambda: mxu_form(d, o, C, r)[0], warmup=1, iters=50, best_of=2)
print(f"vpu scan form: {sv*1e3:8.2f} ms", flush=True)
print(f"mxu dot  form: {sm*1e3:8.2f} ms", flush=True)
print("DONE", flush=True)
