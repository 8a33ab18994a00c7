"""Measure solver/coloring gather-window stats on a settled pile, and time
the solve kernel under different manifold orderings. Saves/reuses the settled
state at /tmp/settled_{n}.npz.

    python scripts/debug_windows.py [n_bodies]
"""

import os
import sys
import time

from nudge_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nudge_tpu.engine import simulate  # noqa: E402
from nudge_tpu.ops.cache import read_cached_impulses  # noqa: E402
from nudge_tpu.ops.contacts import collide  # noqa: E402
from nudge_tpu.ops.integrate import apply_gravity  # noqa: E402
from nudge_tpu.ops.setup_kernel import color_slots, setup_pallas  # noqa: E402
from nudge_tpu.ops.solver import color_manifolds  # noqa: E402
from nudge_tpu.ops.solver_kernel import LANES, solve_packed  # noqa: E402
from nudge_tpu.scenes import scene_pile  # noqa: E402
from nudge_tpu.utils import checkpoint  # noqa: E402


def main(n=20480):
    b = scene_pile(n)
    cfg = b.auto_config(max_box_box_pairs=int(n * 4),
                        max_manifolds=int(n * 2), grid_density=12)
    st0 = b.finalize(cfg)
    path = f"/tmp/settled_{n}.npz"
    if os.path.exists(path):
        st = checkpoint.restore(path, st0)
    else:
        st = st0
        for _ in range(4):
            st, _ = simulate(st, cfg, 100)
            np.asarray(st.bodies.pos)
        checkpoint.save(path, st)

    bodies = apply_gravity(st.bodies, st.sleep, cfg)
    man, _ = jax.jit(lambda s: collide(s, cfg))(st)
    warm, pwarm = read_cached_impulses(st.cache, man)
    color, ncol, relax, spill = color_manifolds(man, bodies, cfg)
    m = man.normal.shape[0]
    slot, mpad = color_slots(color, man, bodies, cfg)
    velw, con_f, acc_f, _pacc, win = setup_pallas(
        bodies, man, warm, relax, slot, mpad, cfg)
    tmin, tmax, bits = win

    tmin_h = np.asarray(tmin)
    tmax_h = np.asarray(tmax)
    w = tmax_h - tmin_h
    live = w > 0
    print(f"n_colors={int(np.asarray(ncol))} spill={int(np.asarray(spill))} "
          f"manifolds={int(np.asarray(jnp.sum(man.valid.astype(jnp.int32))))}")
    print(f"tiles: total={len(w)} live={live.sum()}")
    print(f"window width: mean={w[live].mean():.1f} median="
          f"{np.median(w[live]):.0f} p90={np.percentile(w[live], 90):.0f} "
          f"max={w.max()} sum={w.sum()}")

    # body-tile span of each manifold (ideal lower bound for any ordering)
    ba = np.asarray(man.body_a)
    bb = np.asarray(man.body_b)
    valid = np.asarray(man.valid)
    span = (np.maximum(ba, bb) // LANES - np.minimum(ba, bb) // LANES + 1)
    print(f"per-manifold body-tile span: mean={span[valid].mean():.2f} "
          f"p90={np.percentile(span[valid], 90):.0f} "
          f"max={span[valid].max()}")

    def timeit(name, fn, *args, reps=10):
        fn(*args)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            ts.append(time.perf_counter() - t0)
        print(f"{name:30s} {1e3 * float(np.median(ts)):8.3f} ms")

    timeit("solve (current order)",
           jax.jit(lambda v, c, a, w: solve_packed(v, c, a, w, cfg)[0]),
           velw, con_f, acc_f, win)

    # spatially-sorted within color: reorder slots by (color, min_body_tile)
    order_key = np.asarray(color).astype(np.int64) * (1 << 32) + \
        np.minimum(ba, bb, dtype=np.int64)
    # rebuild slots with the same segment layout but spatial rank inside
    color_j = jnp.minimum(color, cfg.max_colors)
    key = color_j.astype(jnp.int64) * jnp.int64(1 << 24) + \
        jnp.minimum(man.body_a, man.body_b).astype(jnp.int64)
    order = jnp.argsort(key)
    sc = color_j[order]
    starts = jnp.searchsorted(
        sc, jnp.arange(cfg.max_colors + 1, dtype=jnp.int32)).astype(jnp.int32)
    ends = jnp.concatenate([starts[1:], jnp.full((1,), m, jnp.int32)])
    sizes = ends - starts
    rup = lambda x: -(-x // LANES) * LANES
    pstart = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(rup(sizes))[:-1].astype(jnp.int32),
    ])
    rank = jnp.arange(m, dtype=jnp.int32) - starts[sc]
    slot_sorted = pstart[sc] + rank
    slot2 = jnp.zeros((m,), jnp.int32).at[order].set(slot_sorted)
    velw2, con2, acc2, _pacc2, win2 = setup_pallas(
        bodies, man, warm, relax, slot2, mpad, cfg)
    tmin2, tmax2, _ = win2
    t2min = np.asarray(tmin2)
    t2max = np.asarray(tmax2)
    w2 = t2max - t2min
    live2 = w2 > 0
    print(f"spatial window width: mean={w2[live2].mean():.1f} "
          f"median={np.median(w2[live2]):.0f} "
          f"p90={np.percentile(w2[live2], 90):.0f} max={w2.max()} "
          f"sum={w2.sum()}")
    timeit("solve (spatial-in-color)",
           jax.jit(lambda v, c, a, w: solve_packed(v, c, a, w, cfg)[0]),
           velw2, con2, acc2, win2)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20480
    main(n)
