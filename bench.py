"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.md): steps/sec on a settled box pile on one TPU
chip, with `vs_baseline` measured against the single-threaded C++ reference
engine in native/ (the upstream published no numbers and its source was not
mountable — SURVEY.md §0/§6 — so native/nudge_ref.cpp re-implements the same
pipeline as the CPU anchor).

Default headline: the 2,048-box pile (BASELINE config 3 scale). The 20,480
pile (config 4) and the flattened scene batch (config 5) are reported in
`detail` when --all is passed.

Usage: python bench.py [--bodies N] [--steps N] [--all] [--batch]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import time

from nudge_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

_NATIVE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")


def tuned_config(builder, n_bodies: int):
    """Capacity-tuned config: manifolds ~1.6x expected touching pairs
    (~3.3/body in settled piles); pairs at 5x bodies — well above the
    settled count for impact-phase spike headroom. Density 16 covers the
    impact-phase occupancy spike (settled cells hold <= 8, but the falling
    pile transiently exceeds 12 and dropped pairs turn into deep
    penetrations)."""
    mcap = max(512, int(n_bodies * 2.0))
    pcap = max(1024, int(n_bodies * 5.0))
    return builder.auto_config(
        max_box_box_pairs=pcap, max_manifolds=mcap, grid_density=16
    )


def bench_pile(n_bodies: int, steps: int, chunks: int = 5):
    from nudge_tpu.engine import simulate
    from nudge_tpu.scenes import scene_pile

    b = scene_pile(n_bodies)
    cfg = tuned_config(b, n_bodies)
    st = b.finalize(cfg)
    dt = None
    for i in range(chunks + 1):
        t0 = time.perf_counter()
        st, m = simulate(st, cfg, steps)
        np.asarray(st.bodies.pos)  # hard sync (block_until_ready can lie
        dt = time.perf_counter() - t0  # through the axon relay)
    m = jax.tree.map(np.asarray, m)
    return {
        "steps_per_sec": round(steps / dt, 2),
        "body_steps_per_sec": round(steps / dt * n_bodies),
        "contacts": int(m.contact_count[-1]),
        "max_depth": round(float(m.max_depth[-1]), 4),
        "overflow": bool(m.overflow.any()),
        "spill": int(m.spill_count.max()),
    }


def bench_flat_batch(n_scenes: int, bodies: int, steps: int = 20):
    """Config 5 as a flattened mega-scene (see scenes.scene_pile_batch)."""
    from nudge_tpu.engine import simulate
    from nudge_tpu.scenes import scene_pile_batch

    b = scene_pile_batch(n_scenes, bodies)
    n = b.num_bodies
    cfg = tuned_config(b, n)
    st = b.finalize(cfg)
    dt = None
    for i in range(4):
        t0 = time.perf_counter()
        st, m = simulate(st, cfg, steps)
        np.asarray(st.bodies.pos)
        dt = time.perf_counter() - t0
    return {
        "scenes": n_scenes,
        "bodies_per_scene": bodies,
        "steps_per_sec": round(steps / dt, 2),
        "body_steps_per_sec": round(steps / dt * n_scenes * bodies),
    }


def cpu_baseline(n_bodies: int, steps: int = 100):
    """Build (if needed) and run the C++ reference engine."""
    exe = os.path.join(_NATIVE, "nudge_ref")
    try:
        if not os.path.exists(exe):
            subprocess.run(["make", "-C", _NATIVE], check=True,
                           capture_output=True, timeout=120)
        out = subprocess.run(
            [exe, str(n_bodies), str(steps), "400"],
            capture_output=True, timeout=1200, text=True, check=True,
        )
        return json.loads(out.stdout.strip())
    except Exception:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bodies", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--batch", action="store_true")
    args = ap.parse_args()

    if args.batch:
        r = bench_flat_batch(64, 512)
        print(json.dumps({
            "metric": "body-steps/sec, flattened 64 scenes x 512 bodies",
            "value": r["body_steps_per_sec"],
            "unit": "body-steps/sec/chip",
            "vs_baseline": None,
            "detail": r,
        }))
        return

    r = bench_pile(args.bodies, args.steps)
    base = cpu_baseline(args.bodies)
    vs = (round(r["steps_per_sec"] / base["steps_per_sec"], 3)
          if base else None)
    out = {
        "metric": f"steps/sec on settled {args.bodies}-box pile",
        "value": r["steps_per_sec"],
        "unit": "steps/sec",
        "vs_baseline": vs,
        "detail": {"tpu": r, "cpu_baseline": base},
    }
    if args.all:
        out["detail"]["pile_512"] = bench_pile(512, args.steps)
        out["detail"]["flat_batch_64x512"] = bench_flat_batch(64, 512)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
