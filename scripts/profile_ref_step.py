"""Per-stage TPU timing of the REFERENCE-MODE step (sleeping + persistent
broadphase + persistent coloring) at the north-star scale, restored from a
settled checkpoint so the profile reflects the state the bench headline
measures. Complements scripts/profile_step.py (which profiles the
non-persistent pipeline from a fresh settle).

Usage:
    python scripts/profile_ref_step.py CKPT.npz [n_bodies] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nudge_tpu.utils.platform import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nudge_tpu.engine import step  # noqa: E402
from nudge_tpu.ops.broadphase import world_colliders  # noqa: E402
from nudge_tpu.ops.cache import (  # noqa: E402
    read_cached_impulses, write_cached_impulses,
)
from nudge_tpu.ops.contacts import collide  # noqa: E402
from nudge_tpu.ops.integrate import advance, apply_gravity  # noqa: E402
from nudge_tpu.ops.persistent_bp import persistent_broadphase  # noqa: E402
from nudge_tpu.ops.setup_kernel import setup_solve_fused  # noqa: E402
from nudge_tpu.ops.sleeping import update_sleep  # noqa: E402
from nudge_tpu.ops.solver import color_manifolds_cached  # noqa: E402
from nudge_tpu.scenes import scene_pile  # noqa: E402
from nudge_tpu.utils import checkpoint as ck  # noqa: E402


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
    print(f"{name:30s} {ms:8.3f} ms", flush=True)
    return ms


def main(path, n=20480, reps=20):
    interp = jax.default_backend() != "tpu"
    b = scene_pile(n, seed=3)
    cfg = b.auto_config(max_box_box_pairs=8 * n, max_manifolds=3 * n,
                        grid_density=16, fat_pair_factor=2,
                        sleeping=True, persistent_broadphase=True)
    st = ck.restore(path, b.finalize(cfg), strict=False)
    awake = int(np.asarray(jnp.sum(st.sleep.awake & st.bodies.dynamic)))
    print(f"— restored {n}-box pile, awake={awake} —", flush=True)

    # recreate the engine's intermediates once (outside timing)
    bodies = apply_gravity(st.bodies, st.sleep, cfg)
    man, bp = jax.jit(lambda s: collide(s, cfg))(st)
    warm, pwarm = read_cached_impulses(st.cache, man, cfg)
    asleep = ~st.sleep.awake
    bodies_s = bodies.replace(
        inv_mass=jnp.where(asleep, 0.0, bodies.inv_mass),
        inv_inertia=jnp.where(asleep[:, None], 0.0, bodies.inv_inertia))
    coloring, colors = color_manifolds_cached(man, bodies_s, cfg, st.colors)

    # broadphase alone (persistent refilter + rebuild cond; settled: reuse)
    # — informational, also contained in the collide line below
    from nudge_tpu.ops.grid import grid_broadphase

    timeit(
        "persistent bp (refilter)",
        jax.jit(lambda s: checksum(
            persistent_broadphase(s, world_colliders(s), cfg,
                                  grid_broadphase)[0])),
        st, reps=reps)
    # alignment diagnostic: across 10 real consecutive steps, how often do
    # the three aligned-fast-path predicates actually hold? Runs as ONE
    # jitted lax.scan (a Python loop of fresh jax.jit wrappers re-traces and
    # re-compiles through the relay every iteration — observed 30+ min).
    from nudge_tpu.engine import step as _step

    def _probe(stx, _):
        manx, bpx = collide(stx, cfg)
        m, p = manx.feat.shape
        ga_f = jnp.broadcast_to(manx.ga[:, None], (m, p)).reshape(-1)
        gb_f = jnp.broadcast_to(manx.gb[:, None], (m, p)).reshape(-1)
        pv = manx.point_valid.reshape(-1)
        c = stx.cache
        a_cache = jnp.all(~pv | (c.valid & (c.ga == ga_f) & (c.gb == gb_f)
                                 & (c.feat == manx.feat.reshape(-1))))
        cc = stx.colors
        dyn = stx.bodies.dynamic & stx.sleep.awake
        bits = (dyn[manx.body_a].astype(jnp.int32)
                + 2 * dyn[manx.body_b].astype(jnp.int32))
        a_color = jnp.all((cc.valid == manx.valid)
                          & (~manx.valid | ((cc.ga == manx.ga)
                                            & (cc.gb == manx.gb)
                                            & (cc.dynbits == bits))))
        a_memo = bpx.memo_ok & jnp.all(bpx.bb_code == stx.bp.bb_code)
        nxt, _ = _step(stx, cfg)
        return nxt, jnp.stack([a_cache, a_color, a_memo])

    hits = np.asarray(jax.jit(
        lambda s: jax.lax.scan(_probe, s, None, length=10)[1])(st))
    hits = hits.sum(0)
    print(f"aligned-hit rate over 10 steps: cache={hits[0]}/10 "
          f"color={hits[1]}/10 bp-memo={hits[2]}/10", flush=True)

    total = 0.0
    total += timeit(
        "collide (bp+np+compact)",
        jax.jit(lambda s: checksum(collide(s, cfg)[0])), st, reps=reps)
    total += timeit(
        "cache read (join)",
        jax.jit(lambda c, mn: checksum(read_cached_impulses(c, mn, cfg))),
        st.cache, man, reps=reps)
    total += timeit(
        "coloring (persistent)",
        jax.jit(lambda mn, bd, cc: checksum(
            color_manifolds_cached(mn, bd, cfg, cc)[0])),
        man, bodies_s, st.colors, reps=reps)
    total += timeit(
        "setup+solve fused kernel",
        jax.jit(lambda bd, mn, w, pw: checksum(setup_solve_fused(
            bd, mn, w, cfg, interpret=interp, coloring=coloring,
            pwarm=pw)[1])),
        bodies_s, man, warm, pwarm, reps=reps)
    total += timeit(
        "cache write",
        jax.jit(lambda mn, w, pa: checksum(
            write_cached_impulses(mn, w, pa))),
        man, warm, pwarm, reps=reps)
    total += timeit(
        "advance+sleep",
        jax.jit(lambda bd, mn, sl: checksum(
            update_sleep(advance(bd, sl, cfg), mn, sl, cfg))),
        bodies, man, st.sleep, reps=reps)
    print(f"{'— stage sum':30s} {total:8.3f} ms", flush=True)

    full = jax.jit(lambda s: checksum(step(s, cfg)[0].bodies.pos))
    timeit("FULL STEP", full, st, reps=reps)
    # a 100-step scan amortizes per-call dispatch (~30 ms via the relay)
    from nudge_tpu.engine import simulate
    simulate(st, cfg, 100)[0].bodies.pos.block_until_ready()
    t0 = time.perf_counter()
    out = simulate(st, cfg, 100)
    np.asarray(out[0].bodies.pos)
    dt = time.perf_counter() - t0
    print(f"{'100-step scan':30s} {1e3 * dt / 100:8.3f} ms/step "
          f"({100 / dt:.2f} steps/s)", flush=True)


if __name__ == "__main__":
    main(sys.argv[1],
         int(sys.argv[2]) if len(sys.argv) > 2 else 20480,
         int(sys.argv[3]) if len(sys.argv) > 3 else 20)
