"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.md): steps/sec on the box-pile scene on one TPU
chip. `vs_baseline` is measured against the C++ reference-style CPU engine in
native/ when built (the reference itself published no numbers and its source
is unavailable — SURVEY.md §6); until then it is null.

Usage: python bench.py [--config N] [--bodies N] [--steps N] [--all]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import numpy as np

from nudge_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()


def time_rollout(state, cfg, steps, chunks=3):
    """Median wall time of `chunks` on-device rollouts of `steps` steps."""
    from nudge_tpu.engine import simulate

    # warmup + compile
    state, m = simulate(state, cfg, steps)
    jax.block_until_ready(state.bodies.pos)
    times = []
    for _ in range(chunks):
        t0 = time.perf_counter()
        state, m = simulate(state, cfg, steps)
        jax.block_until_ready(state.bodies.pos)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), state, m


def bench_pile(n_bodies: int, steps: int, sphere_frac: float = 0.0,
               pairs_per_box: float = 10.0):
    from nudge_tpu.scenes import scene_pile

    b = scene_pile(n_bodies, sphere_frac=sphere_frac)
    cfg = b.auto_config(pairs_per_box=pairs_per_box)
    st = b.finalize(cfg)
    dt, st, m = time_rollout(st, cfg, steps)
    sps = steps / dt
    return {
        "steps_per_sec": sps,
        "body_steps_per_sec": sps * n_bodies,
        "max_depth": float(np.asarray(m.max_depth).max()),
        "overflow": bool(np.asarray(m.overflow).any()),
        "final_ke": float(np.asarray(m.kinetic_energy)[-1]),
    }


def bench_batch(n_scenes: int, bodies_per_scene: int, steps: int):
    from nudge_tpu.parallel.mesh import batched_simulate, make_scene_batch
    from nudge_tpu.scenes import scene_pile

    b = scene_pile(bodies_per_scene, seed=0)
    cfg = b.auto_config(pairs_per_box=10.0)
    proto = b.finalize(cfg)
    batch = jax.tree.map(
        lambda x: jax.numpy.broadcast_to(x[None], (n_scenes,) + x.shape),
        proto,
    )
    run = batched_simulate(cfg, steps)
    batch, m = run(batch)
    jax.block_until_ready(batch.bodies.pos)
    run2 = batched_simulate(cfg, steps)
    t0 = time.perf_counter()
    batch, m = run2(batch)
    jax.block_until_ready(batch.bodies.pos)
    dt = time.perf_counter() - t0
    sps = steps / dt
    return {
        "steps_per_sec": sps,
        "body_steps_per_sec": sps * n_scenes * bodies_per_scene,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bodies", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", action="store_true",
                    help="bench the vmapped scene batch instead")
    ap.add_argument("--scenes", type=int, default=256)
    args = ap.parse_args()

    if args.batch:
        r = bench_batch(args.scenes, 64, args.steps)
        out = {
            "metric": f"body-steps/sec, {args.scenes} scenes x 64 bodies",
            "value": round(r["body_steps_per_sec"]),
            "unit": "body-steps/sec/chip",
            "vs_baseline": None,
        }
    else:
        r = bench_pile(args.bodies, args.steps)
        out = {
            "metric": f"steps/sec on {args.bodies}-box pile",
            "value": round(r["steps_per_sec"], 2),
            "unit": "steps/sec",
            "vs_baseline": None,
            "detail": r,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
