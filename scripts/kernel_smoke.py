"""On-TPU Pallas kernel smoke battery + kernel-fault bisect driver.

VERDICT r4 weak #5: every kernel test is interpret-mode at toy sizes, so the
compiled-Mosaic path is exercised only by the benches — exactly where it
keeps failing undiagnosed (r2 rc:1; r4 megachunk "TPU worker crashed ...
kernel fault" at config-5 chunk shapes). This script runs each kernel
COMPILED on the live backend at real shapes, each (scene, unit) combo in its
own subprocess with a timeout, so one worker crash is recorded as that
combo's failure and the battery continues. Rows append to results.jsonl.

Units (each timed standalone, fed by an XLA-solver warmup so the probe is
independent of the other kernels):
  step     - full jitted step, kernel path (cfg.solver=auto)
  fused    - setup_solve_fused (the two chained Pallas calls)
  setup    - setup kernel alone (setup_kernel.setup_pallas)
  solve    - solve kernel alone (solver_kernel.solve_packed, fed from the
             XLA setup_constraints + pack_solver_inputs path)
  collide  - broadphase + narrowphase (exercises the Pallas box-box kernel)
  coloring - the Pallas coloring kernel via solver.color_manifolds
  mapstep  - lax.map(step) over a 2-chunk stack of this scene (the megachunk
             bench structure — isolates the lax.map interaction)

Scenes:
  pile2048, pile20480          - BASELINE configs 3/4 piles
  megaKxB (e.g. mega64x512)    - ONE flattened scene_pile_batch(K, B) chunk,
                                 the config-5 chunk shape that faulted in r4

Usage:
  python scripts/kernel_smoke.py [--scenes s1,s2] [--units u1,u2]
          [--timeout S] [--reps N] [--warm-steps N] [--tag LEDGER_TAG]
  python scripts/kernel_smoke.py --child SCENE UNIT [...]   (internal)
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nudge_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results.jsonl")
DEFAULT_SCENES = "pile2048,pile20480,mega32x512,mega64x512"
DEFAULT_UNITS = "collide,coloring,setup,solve,fused,step"


def build_scene(name: str, solver: str):
    """Returns (state, cfg) with bench.tuned_config-equivalent capacities."""
    from nudge_tpu.scenes import scene_pile, scene_pile_batch

    if name.startswith("pile"):
        n = int(name[4:])
        b = scene_pile(n)
    elif name.startswith("mega"):
        k, bod = name[4:].split("x")
        b = scene_pile_batch(int(k), int(bod))
        n = b.num_bodies
    else:
        raise ValueError(name)
    cfg = b.auto_config(
        max_box_box_pairs=max(1024, int(n * 8.0)),
        max_manifolds=max(512, int(n * 3.0)),
        grid_density=16, fat_pair_factor=2, solver=solver,
        # this script IS the designated hardware prober: bypass the
        # trace-time XLA-scale guard so warmonly-xla probes measure the
        # hardware, not the guard (engine._use_kernels raise)
        xla_solver_max_bodies=1 << 30)
    return b.finalize(cfg), cfg, n


def _timeit(fn, *args, reps):
    import numpy as np

    def sync(out):
        np.asarray(jax.tree.leaves(out)[0])

    t0 = time.perf_counter()
    sync(fn(*args))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), compile_s


def child(scene: str, unit: str, warm_steps: int, reps: int,
          warm_solver: str = "xla"):
    global jax
    import jax
    import numpy as np

    from nudge_tpu.engine import simulate, step
    from nudge_tpu.ops.cache import read_cached_impulses
    from nudge_tpu.ops.contacts import collide
    from nudge_tpu.ops.integrate import apply_gravity
    from nudge_tpu.ops.setup_kernel import (
        color_slots, setup_pallas, setup_solve_fused,
    )
    from nudge_tpu.ops.solver import color_manifolds, setup_constraints
    from nudge_tpu.ops.solver_kernel import pack_solver_inputs, solve_packed

    t_all = time.perf_counter()
    st, cfg_xla, n = build_scene(scene, solver=warm_solver)
    # warm up on the XLA path so the probe state has realistic contacts and
    # the unit under test is the ONLY Pallas code that runs in this process.
    # ("collideonly" skips the warmup: it probes the XLA broadphase +
    # narrowphase alone on the spawn state — the r5 bisect found the pure-
    # XLA warmup itself crashing the worker at mega shapes, so the warmup
    # must be bisectable too.)
    if unit != "collideonly":
        st, _ = simulate(st, cfg_xla, warm_steps)
        np.asarray(st.bodies.pos)
    warm_s = time.perf_counter() - t_all
    cfg = cfg_xla.replace(solver="auto")
    if unit == "collideonly":
        from nudge_tpu.ops.contacts import collide as _collide
        fn = jax.jit(lambda s: _collide(s, cfg_xla)[0].normal)
        ms, compile_s = _timeit(fn, st, reps=reps)
        print(json.dumps({"scene": scene, "unit": unit, "n": n, "ok": True,
                          "ms": round(ms * 1e3, 2),
                          "compile_s": round(compile_s, 1),
                          "backend": jax.default_backend()}), flush=True)
        return

    if unit == "warmonly":
        # the shared warmup IS the unit: pure-XLA simulate at this shape.
        # Discriminates "the Pallas kernel faults" from "any big program at
        # this shape faults" (the r5 bisect found fused/setup/solve all
        # crashing — consistent with either until this runs clean).
        ms, compile_s = 0.0, 0.0
    elif unit == "step":
        fn = jax.jit(lambda s: step(s, cfg)[0].bodies.pos)
        ms, compile_s = _timeit(fn, st, reps=reps)
    elif unit == "mapstep":
        stack = jax.tree.map(lambda x: jnp_stack2(x), st)
        fn = jax.jit(lambda s: jax.lax.map(
            lambda si: step(si, cfg)[0], s).bodies.pos)
        ms, compile_s = _timeit(fn, stack, reps=reps)
    elif unit == "collide":
        fn = jax.jit(lambda s: collide(s, cfg)[0].normal)
        ms, compile_s = _timeit(fn, st, reps=reps)
    else:
        bodies = apply_gravity(st.bodies, st.sleep, cfg)
        man, _ = jax.jit(lambda s: collide(s, cfg_xla))(st)
        warm, pwarm = read_cached_impulses(st.cache, man, cfg)
        if unit == "coloring":
            fn = jax.jit(lambda m, b: color_manifolds(m, b, cfg)[0])
            ms, compile_s = _timeit(fn, man, bodies, reps=reps)
        elif unit == "setup":
            color, _, relax, _ = color_manifolds(man, bodies, cfg)
            slot, mpad = color_slots(color, man, bodies, cfg)
            fn = jax.jit(lambda bd, mn, w, r, s, pw: setup_pallas(
                bd, mn, w, r, s, mpad, cfg, pwarm=pw)[1])
            ms, compile_s = _timeit(fn, bodies, man, warm, relax, slot,
                                    pwarm, reps=reps)
        elif unit == "solve":
            coloring = color_manifolds(man, bodies, cfg)
            con, bodies2, acc = setup_constraints(
                bodies, man, warm, cfg, coloring=coloring, pwarm=pwarm)
            velw, cf, af, afp, win, _ = pack_solver_inputs(
                bodies2, con, acc, cfg)
            fn = jax.jit(lambda v, c, a, w, p: solve_packed(
                v, c, a, w, cfg, alias=False, afp=p)[0])
            ms, compile_s = _timeit(fn, velw, cf, af, win, afp, reps=reps)
        elif unit == "fused":
            coloring = color_manifolds(man, bodies, cfg)
            fn = jax.jit(lambda bd, mn, w, pw: setup_solve_fused(
                bd, mn, w, cfg, coloring=coloring, pwarm=pw)[0].vel)
            ms, compile_s = _timeit(fn, bodies, man, warm, pwarm, reps=reps)
        else:
            raise ValueError(unit)

    print(json.dumps({
        "scene": scene, "unit": unit, "n": n, "ok": True,
        "ms": round(ms * 1e3, 2), "compile_s": round(compile_s, 1),
        "warmup_s": round(warm_s, 1),
        "backend": jax.default_backend(),
    }), flush=True)


def jnp_stack2(x):
    import jax.numpy as jnp
    return jnp.stack([x, x], axis=0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", nargs=2, metavar=("SCENE", "UNIT"))
    ap.add_argument("--scenes", default=DEFAULT_SCENES)
    ap.add_argument("--units", default=DEFAULT_UNITS)
    ap.add_argument("--timeout", type=float, default=700.0)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--warm-steps", type=int, default=30)
    ap.add_argument("--warm-solver", default="xla",
                    help="solver for the warmup simulate: 'xla' isolates "
                         "the unit from all Pallas code; 'auto' runs the "
                         "production kernel path (use with unit=warmonly to "
                         "probe the full engine at a shape)")
    ap.add_argument("--tag", default="kernel_smoke")
    ap.add_argument("--no-ledger", action="store_true")
    args = ap.parse_args()

    if args.child:
        child(args.child[0], args.child[1], args.warm_steps, args.reps,
              warm_solver=args.warm_solver)
        return

    date = time.strftime("%Y-%m-%d")
    rows = []
    for scene in args.scenes.split(","):
        for unit in args.units.split(","):
            t0 = time.time()
            p = None
            try:
                p = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--child",
                     scene, unit, "--warm-steps", str(args.warm_steps),
                     "--reps", str(args.reps)],
                    capture_output=True, text=True, timeout=args.timeout)
                lines = [ln for ln in p.stdout.splitlines()
                         if ln.startswith("{")]
                if p.returncode == 0 and lines:
                    row = json.loads(lines[-1])
                else:
                    err = (p.stderr or "").strip().splitlines()
                    row = {"scene": scene, "unit": unit, "ok": False,
                           "rc": p.returncode,
                           "error": (err[-1] if err else "no output")[:300]}
            except subprocess.TimeoutExpired:
                row = {"scene": scene, "unit": unit, "ok": False,
                       "error": f"timeout {args.timeout:.0f}s"}
            row.update({"tag": args.tag, "elapsed_s": round(time.time() - t0, 1),
                        "date": date})
            rows.append(row)
            print(json.dumps(row), flush=True)
            if not args.no_ledger:
                with open(RESULTS, "a") as f:
                    f.write(json.dumps(row) + "\n")
            if not row.get("ok") and "crash" in str(row.get("error", "")).lower():
                # a worker kill blacks out the relay for 10-20+ min; a fixed
                # sleep is not enough (round-5: one kill cascaded through
                # every remaining pile20480 unit at ~80 s each — all clean
                # in isolation afterwards). Probe until the relay answers.
                print("# worker crash signature; probing for relay recovery",
                      flush=True)
                for _ in range(50):
                    try:
                        subprocess.run(
                            [sys.executable, "-c",
                             "import jax; jax.devices()"],
                            check=True, capture_output=True, timeout=30)
                        print("# relay recovered", flush=True)
                        break
                    except Exception:            # noqa: BLE001
                        time.sleep(30)


if __name__ == "__main__":
    main()
