"""Round-2 settled-pile measurement: defaults vs sleeping vs
sleeping+persistent broadphase (the reference always sleeps — SURVEY C13;
round-1 verdict item 5). One variant per invocation so flaky remote compiles
retry cheaply. Appends to scripts/results.jsonl."""

import json
import sys
import time

from nudge_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from nudge_tpu.engine import simulate  # noqa: E402
from nudge_tpu.scenes import scene_pile  # noqa: E402


def tuned_config(builder, n_bodies, **kw):
    mcap = max(512, int(n_bodies * 2.0))
    pcap = max(1024, int(n_bodies * 5.0))
    return builder.auto_config(
        max_box_box_pairs=pcap, max_manifolds=mcap, grid_density=16, **kw
    )


def main(n, variant, steps=100, settle_chunks=None):
    if settle_chunks is None:
        # sleeping needs the pile to be quiet for sleep_frames before the
        # settled-state timing window is representative
        settle_chunks = 8 if variant in ("sleep", "sleep_pbp") else 5
    b = scene_pile(n)
    kw = {}
    if variant in ("sleep", "sleep_pbp"):
        kw["sleeping"] = True
    if variant == "sleep_pbp":
        kw["persistent_broadphase"] = True
    cfg = tuned_config(b, n, **kw)
    st = b.finalize(cfg)

    t0 = time.perf_counter()
    st, m = simulate(st, cfg, steps)
    np.asarray(st.bodies.pos)
    compile_s = time.perf_counter() - t0
    for _ in range(settle_chunks):
        st, m = simulate(st, cfg, steps)
    np.asarray(st.bodies.pos)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        st, m = simulate(st, cfg, steps)
        np.asarray(st.bodies.pos)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    m = jax.tree.map(np.asarray, m)
    rec = {
        "tag": f"r2_{variant}", "n": n,
        "steps_per_sec": round(steps / dt, 2),
        "compile_s": round(compile_s, 1),
        "contacts": int(m.contact_count[-1]),
        "awake": int(m.awake_count[-1]),
        "ke": round(float(m.kinetic_energy[-1]), 1),
        "max_depth": round(float(m.max_depth[-1]), 4),
        "spill": int(m.spill_count.max()),
        "overflow": bool(m.overflow.any()),
    }
    print(json.dumps(rec), flush=True)
    with open("scripts/results.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2],
         steps=int(sys.argv[3]) if len(sys.argv) > 3 else 100)
