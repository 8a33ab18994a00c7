"""Per-stage TPU timing of one simulation step at a given scale.

Each stage is jitted separately with a scalar checksum output (so nothing is
dead-code-eliminated and only a scalar crosses back to the host). Timings are
the median of `reps` calls after a warmup. Usage:

    python scripts/profile_step.py [n_bodies] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nudge_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nudge_tpu.engine import simulate, step  # noqa: E402
from nudge_tpu.ops.cache import read_cached_impulses, write_cached_impulses  # noqa: E402
from nudge_tpu.ops.contacts import collide  # noqa: E402
from nudge_tpu.ops.integrate import advance, apply_gravity  # noqa: E402
from nudge_tpu.ops.setup_kernel import (  # noqa: E402
    color_slots, pack_geometry, setup_pallas,
)
from nudge_tpu.ops.sleeping import update_sleep  # noqa: E402
from nudge_tpu.ops.solver import color_manifolds  # noqa: E402
from nudge_tpu.ops.solver_kernel import solve_packed  # noqa: E402
from nudge_tpu.scenes import scene_pile  # noqa: E402


def checksum(tree):
    leaves = [jnp.sum(jnp.abs(x.astype(jnp.float32)))
              for x in jax.tree.leaves(tree) if hasattr(x, "astype")]
    return sum(leaves)


def timeit(name, fn, *args, reps=20):
    fn(*args)  # warmup/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out)
        ts.append(time.perf_counter() - t0)
    ms = 1e3 * float(np.median(ts))
    print(f"{name:28s} {ms:8.3f} ms")
    return ms


def main(n=2048, reps=20):
    # TPU timing tool; off-TPU the kernels only run in interpret mode, so
    # fall back to it (timings then measure the interpreter, not hardware)
    interp = jax.default_backend() != "tpu"
    if interp:
        print("(non-TPU backend: Pallas stages run in interpret mode — "
              "use these numbers for shape/plumbing checks only)")
    b = scene_pile(n)
    mcap = max(512, int(n * 2.0))
    pcap = max(1024, int(n * 4.0))
    cfg = b.auto_config(max_box_box_pairs=pcap, max_manifolds=mcap,
                        grid_density=12)
    st = b.finalize(cfg)
    for _ in range(4):
        st, _ = simulate(st, cfg, 100)
        np.asarray(st.bodies.pos)
    print(f"— settled {n}-box pile, capacities m={mcap} p={pcap} —")

    bodies = apply_gravity(st.bodies, st.sleep, cfg)
    man, _ = jax.jit(lambda s: collide(s, cfg))(st)
    warm, pwarm = read_cached_impulses(st.cache, man)
    color, _, relax, _ = color_manifolds(man, bodies, cfg)
    m_count = man.normal.shape[0]
    slot, mpad = color_slots(color, man, bodies, cfg)
    velw, con_f, acc_f, pacc_f, win = setup_pallas(
        bodies, man, warm, relax, slot, mpad, cfg, interpret=interp)

    total = 0.0
    total += timeit("collide (bp+np+compact)",
                    jax.jit(lambda s: checksum(collide(s, cfg)[0])), st,
                    reps=reps)
    total += timeit("cache read (join)",
                    jax.jit(lambda c, mn: checksum(
                        read_cached_impulses(c, mn))), st.cache, man,
                    reps=reps)
    total += timeit("coloring",
                    jax.jit(lambda mn, bd: checksum(
                        color_manifolds(mn, bd, cfg)[0])), man, bodies,
                    reps=reps)
    total += timeit("pack geometry",
                    jax.jit(lambda bd, mn, w, r, s: checksum(
                        pack_geometry(bd, mn, w, r, s, mpad, cfg))),
                    bodies, man, warm, relax, slot, reps=reps)
    total += timeit("setup kernel (incl pack)",
                    jax.jit(lambda bd, mn, w, r, s: checksum(
                        setup_pallas(bd, mn, w, r, s, mpad, cfg,
                                     interpret=interp)[:3])),
                    bodies, man, warm, relax, slot, reps=reps)
    total += timeit("solve kernel",
                    jax.jit(lambda v, c, a, w: checksum(
                        solve_packed(v, c, a, w, cfg, interpret=interp))),
                    velw, con_f, acc_f, win, reps=reps)
    total += timeit("cache write",
                    jax.jit(lambda mn, w: checksum(
                        write_cached_impulses(mn, w))), man, warm, reps=reps)
    total += timeit("advance+sleep",
                    jax.jit(lambda bd, mn, sl: checksum(
                        update_sleep(advance(bd, sl, cfg), mn, sl, cfg))),
                    bodies, man, st.sleep, reps=reps)
    print(f"{'— stage sum':28s} {total:8.3f} ms   (double-counts pack)")

    full = jax.jit(lambda s: checksum(step(s, cfg)[0].bodies.pos))
    timeit("FULL STEP", full, st, reps=reps)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    main(n, reps)
