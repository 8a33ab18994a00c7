"""Measure settled-state throughput for a pile config. One config per run so
a flaky remote-compile can be retried cheaply; results append to
scripts/results.jsonl."""

import json
import sys
import time

from nudge_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from nudge_tpu.engine import simulate  # noqa: E402
from nudge_tpu.scenes import scene_pile  # noqa: E402


def main(n, steps=100, sphere_frac=0.0):
    b = scene_pile(n, sphere_frac=sphere_frac)
    cfg = b.auto_config(pairs_per_box=10.0)
    st = b.finalize(cfg)
    t0 = time.perf_counter()
    st, m = simulate(st, cfg, steps)
    jax.block_until_ready(st.bodies.pos)
    compile_s = time.perf_counter() - t0
    # settle: run chunks until kinetic energy stops changing much
    for _ in range(4):
        st, m = simulate(st, cfg, steps)
    jax.block_until_ready(st.bodies.pos)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        st, m = simulate(st, cfg, steps)
        jax.block_until_ready(st.bodies.pos)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    m = jax.tree.map(np.asarray, m)
    rec = {
        "n": n, "steps_per_sec": round(steps / dt, 1),
        "body_steps_per_sec": round(steps / dt * n),
        "compile_s": round(compile_s, 1),
        "contacts": int(m.contact_count[-1]),
        "ke": float(m.kinetic_energy[-1]),
        "max_depth": float(m.max_depth[-1]),
        "spill": int(m.spill_count.max()),
        "overflow": bool(m.overflow.any()),
    }
    print(json.dumps(rec), flush=True)
    with open("scripts/results.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main(int(sys.argv[1]), sphere_frac=float(sys.argv[2]) if len(sys.argv) > 2 else 0.0)
