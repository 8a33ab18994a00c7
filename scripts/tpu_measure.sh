#!/bin/bash
# Round-3 TPU measurement battery. Run when the axon relay is healthy:
#   bash scripts/tpu_measure.sh [outdir]
# Produces one log per item; each is independently restartable. The
# persistent compile cache (utils/platform.py) makes reruns cheap.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"  # round-2 battery died on
# ModuleNotFoundError: scripts/*.py didn't see the repo root (VERDICT r2 §1c)
OUT=${1:-/tmp/tpu_r3}
mkdir -p "$OUT"

run() { # name, cmd...
  local name=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout 5400 "$@" >"$OUT/$name.log" 2>&1
  echo "rc=$? tail:"; tail -3 "$OUT/$name.log"
}

# 0. relay sanity
run devices python -c "import jax; print(jax.devices())"

# 2. headline bench: settled 20,480 pile, reference mode (sleeping+pbp)
run bench_c4 python bench.py --bodies 20480 --steps 100

# 1. per-stage profile at config-4 scale (settled)
run profile_20480 python scripts/profile_step.py 20480 10

# 1b. roofline / MFU accounting at config-4 scale
run roofline_20480 python scripts/roofline.py 20480 10

# 3. config 3: 2,048-body MIXED boxes+spheres pile (all narrowphase types)
run bench_c3_mixed python bench.py --bodies 2048 --steps 100 --sphere-frac 0.25
# 3b. pure-box 2048 (round-1 comparison point, has a CPU anchor)
run bench_2048 python bench.py --bodies 2048 --steps 100

# 4. config 5 full scale: 4096 scenes x 512 bodies, chunked vmap (XLA path)
run bench_c5 python bench.py --vbatch --scenes 4096 --scene-bodies 512

# 4b. config 5 on the kernel path: flattened mega-scene chunks
run bench_c5_mega python bench.py --megachunk --scenes 4096 --scene-bodies 512

# 5. fidelity: 20,480 settled trajectory with sleeping (awake trend, KE,
#    overflow) — TPU-side validation of the round-2 physics (VERDICT r2 §4)
run lc_20480 python scripts/debug_limit_cycle.py 20480 15 sleeping=1 persistent_broadphase=1

echo "=== done; logs in $OUT ==="
