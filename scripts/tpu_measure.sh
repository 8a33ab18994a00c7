#!/bin/bash
# Round-5 TPU measurement battery. Run when the axon relay is healthy:
#   bash scripts/tpu_measure.sh [outdir]
# Produces one log per item; each is independently restartable. The
# persistent compile cache (utils/platform.py) makes reruns cheap.
#
# NOTE (round-5 finding): the axon relay serves ONE process at a time —
# a second TPU client blocks inside jax.devices() until the first exits.
# Never run two battery items concurrently, and make sure no stray TPU
# process is alive before starting (a held relay looks exactly like the
# round-4 driver-bench wedge).
#
# Ordering: kernel smoke first (cheap fault canary + warms per-scene
# caches), then the driver-contract bench, then config 5 (both paths),
# then profile/roofline, then the fidelity trajectory + settled checkpoint
# for the fast-path A/B.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"  # round-2 battery died on
# ModuleNotFoundError: scripts/*.py didn't see the repo root (VERDICT r2 §1c)
OUT=${1:-/tmp/tpu_r5}
mkdir -p "$OUT" "$OUT/ckpt"

run() { # name, cmd...
  local name=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout 5400 "$@" >"$OUT/$name.log" 2>&1
  echo "rc=$? tail:"; tail -3 "$OUT/$name.log"
}

# 0. relay sanity
run devices python -c "import jax; print(jax.devices())"

# 1. compiled-kernel smoke battery (VERDICT r4 weak #5): every Pallas
#    kernel, compiled, at pile + config-5 chunk shapes; rows -> results.jsonl
run kernel_smoke python scripts/kernel_smoke.py \
  --scenes pile2048,pile20480,mega32x512,mega64x512 \
  --units fused,setup,solve,collide,coloring,step --timeout 900

# 2. headline bench, exactly as the driver runs it (staged subprocess
#    phases; always lands a number)
run bench_c4 python bench.py

# 3. config 5 full scale: 4096 scenes x 512 bodies
#    3a. kernel path: flattened 64x512 mega-scenes, lax.map over 64 chunks
#        (falls back to the XLA solver inside the same structure on fault)
run bench_c5_mega env NUDGE_BENCH_BUDGET_S=2400 \
  python bench.py --megachunk --scenes 4096 --scene-bodies 512
#    3b. vmap path (XLA solver), 16 chunks of vmap(256)
run bench_c5_vbatch env NUDGE_BENCH_BUDGET_S=2100 \
  python bench.py --vbatch --scenes 4096 --scene-bodies 512

# 4. config 3: 2,048-body MIXED boxes+spheres pile (all narrowphase types)
run bench_c3_mixed python bench.py --bodies 2048 --steps 100 --sphere-frac 0.25

# 5. roofline / MFU accounting at config-4 scale (VERDICT r2 item 5)
run roofline_20480 python scripts/roofline.py 20480 10

# 6. per-stage profile at config-4 scale (fresh settle, non-persistent path)
run profile_20480 python scripts/profile_step.py 20480 10

# 7. fidelity trajectory: 20,480 with sleeping+pbp, 3000 steps, checkpoints
#    every 100 steps (feeds items 8-9; steps= is the chunk size)
run lc_20480 env NUDGE_CKPT_DIR="$OUT/ckpt" \
  python scripts/debug_limit_cycle.py 20480 30 steps=100 sleeping=1 persistent_broadphase=1

# 8. settled-state fast-path A/B from the step-3000 checkpoint
run settled_ab python scripts/measure_settled_ckpt.py "$OUT/ckpt/pile20480_step3000.npz" 20480

# 9. reference-mode per-stage profile from the same checkpoint
run profile_ref python scripts/profile_ref_step.py "$OUT/ckpt/pile20480_step3000.npz" 20480

echo "=== done; logs in $OUT ==="
