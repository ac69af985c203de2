#!/usr/bin/env bash
# On-chip validation queue (docs/ROADMAP.md "On-chip queue") — run when the
# TPU compile tunnel recovers from an outage. Each step is independently
# time-bounded so a relapse cannot hang the run; results land in /tmp/onchip/.
#
# Usage:  bash benchmarks/onchip_queue.sh [outdir]
set -u
OUT=${1:-/tmp/onchip}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name (timeout ${t}s) ==="
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "    rc=$rc  (log: $OUT/$name.log)"
  tail -n 3 "$OUT/$name.log" | sed 's/^/    /'
}

# 0. tunnel sanity — abort early if still down
step probe 120 python -c "import jax,jax.numpy as jnp; print(jnp.ones((8,128)).sum().block_until_ready())"
grep -q 1024 "$OUT/probe.log" || { echo "TUNNEL STILL DOWN — aborting"; exit 1; }

# 1. drive both backends at 256^2 + PNG diff (standing verify)
step render_jnp    570 python -m python_ray_tracer_tpu.cli render --width 256 --height 256 --out "$OUT/r.png"
step render_pallas 570 python -m python_ray_tracer_tpu.cli render --width 256 --height 256 --backend pallas --out "$OUT/p.png"
step png_diff 60 python -c "
from PIL import Image; import numpy as np
a=np.asarray(Image.open('$OUT/p.png')).astype(int)
b=np.asarray(Image.open('$OUT/r.png')).astype(int)
d=np.abs(a-b).max(axis=-1)
print('flipped:', (d>1).sum(), '/', d.size, 'max', int(d.max()))
assert (d>1).sum() <= 0.001*d.size, 'REGRESSION: backend divergence'
"

# 2. bench.py end-to-end (run of record refresh; self-bounded via budget)
step bench 1600 env RT_BENCH_BUDGET_S=1200 python bench.py

# 3. 100-sphere 1080p re-measure (quiet-window retry for the <60 ms goal)
step large_scene 1600 python benchmarks/large_scene.py --quick

# 4. backward cone cull on a dense scene (new in this round)
step bwd_cull 1600 python benchmarks/bwd_cull.py --quick

# 5. empirical VPU speed-of-light comparator (headroom accounting)
step vpu_sol 1600 python benchmarks/vpu_sol.py --quick

echo "=== queue done; logs in $OUT ==="
