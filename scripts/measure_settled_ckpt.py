"""Settled-pile throughput from a checkpoint — the fast-path A/B tool.

Restores a settled north-star pile (saved by debug_limit_cycle with
NUDGE_CKPT_DIR) and times simulate() chunks with the aligned fast paths ON
vs OFF (SimConfig.aligned_fast_path), plus a per-stage FULL STEP timing.
This isolates the round-4 settled-state optimizations (VERDICT r3 item 3:
cache-read join, coloring join, tight-refilter memo — ~126 ms of lax.sort
on a settled 20,480 pile) without paying the ~30-minute settle each run.

Usage:
    python scripts/measure_settled_ckpt.py CKPT.npz [n_bodies] [chunks]

The checkpoint must have been saved under the same scene/config recipe as
debug_limit_cycle.run (seed=3 pile, 8x pairs, 3x manifolds, density 16,
fat_pair_factor 2, sleeping + persistent broadphase).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nudge_tpu.utils.platform import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402

from nudge_tpu.engine import simulate  # noqa: E402
from nudge_tpu.scenes import scene_pile  # noqa: E402
from nudge_tpu.utils import checkpoint as ck  # noqa: E402


def build(n, **over):
    b = scene_pile(n, seed=3)
    kw = dict(max_box_box_pairs=8 * n, max_manifolds=3 * n,
              grid_density=16, fat_pair_factor=2,
              sleeping=True, persistent_broadphase=True)
    kw.update(over)
    cfg = b.auto_config(**kw)
    return cfg, b.finalize(cfg)


def measure(tag, cfg, st, chunks=5, steps=100):
    # warmup/compile chunk
    t0 = time.perf_counter()
    st, m = simulate(st, cfg, steps)
    np.asarray(st.bodies.pos)
    print(f"[{tag}] compile+first {time.perf_counter() - t0:7.1f} s",
          flush=True)
    ts = []
    for _ in range(chunks):
        t0 = time.perf_counter()
        st, m = simulate(st, cfg, steps)
        np.asarray(st.bodies.pos)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    aw = int(np.asarray(m.awake_count)[-1])
    print(f"[{tag}] {steps / dt:8.2f} steps/s   ({1e3 * dt / steps:6.1f} "
          f"ms/step, median of {chunks}x{steps})  awake={aw} "
          f"ovf={int(np.asarray(m.overflow).sum())}", flush=True)
    return steps / dt


def main():
    path = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20480
    chunks = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    cfg_fast, st0 = build(n)
    st_fast = ck.restore(path, st0, strict=False)
    fast = measure("fast-paths ON ", cfg_fast, st_fast, chunks)

    cfg_slow, st0 = build(n, aligned_fast_path=False)
    st_slow = ck.restore(path, st0, strict=False)
    slow = measure("fast-paths OFF", cfg_slow, st_slow, chunks)
    print(f"speedup from aligned fast paths: {fast / slow:0.2f}x", flush=True)


if __name__ == "__main__":
    main()
