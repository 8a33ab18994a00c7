"""Energy-ledger diagnostic for pile restlessness: tracks KE, gravitational
PE, and total energy per chunk. A solver that injects energy shows E_tot
rising; a pile still finding its angle of repose shows E_tot falling as KE
bursts (PE converting to KE, then dissipated).

Also reports warm-start health (cache hit fraction over valid manifolds) —
thrashing contact identity under-converges friction and destabilizes piles.

Usage: python scripts/debug_energy.py [n] [split:0|1] [solver] [chunks]
"""

import sys

from nudge_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nudge_tpu.engine import simulate  # noqa: E402
from nudge_tpu.ops.cache import read_cached_impulses  # noqa: E402
from nudge_tpu.ops.contacts import collide  # noqa: E402
from nudge_tpu.scenes import scene_pile  # noqa: E402


def warm_stats(st, cfg):
    """Fraction of valid manifolds whose cached warm impulse was found."""
    def f(state):
        man, _ = collide(state, cfg)
        warm, pwarm = read_cached_impulses(state.cache, man)
        hit = jnp.any(jnp.abs(warm) > 0, axis=(1, 2))
        nv = jnp.sum(man.valid.astype(jnp.int32))
        nh = jnp.sum((man.valid & hit).astype(jnp.int32))
        return nv, nh
    nv, nh = jax.jit(f)(st)
    return int(nv), int(nh)


def run(n, solver, split, chunks=12, **over):
    b = scene_pile(n, seed=3)
    cfg = b.auto_config(max_box_box_pairs=5 * n, max_manifolds=2 * n,
                        grid_density=16, solver=solver, split_impulse=split,
                        **over)
    st = b.finalize(cfg)
    g = 9.81
    for chunk in range(chunks):
        st, m = simulate(st, cfg, 100)
        pos = np.asarray(st.bodies.pos)
        v = np.asarray(st.bodies.vel)
        inv_m = np.asarray(st.bodies.inv_mass)
        dyn = inv_m > 0
        mass = np.where(dyn, 1.0 / np.maximum(inv_m, 1e-9), 0.0)
        ke = float(np.asarray(m.kinetic_energy)[-1])
        pe = float((mass * g * pos[:, 1])[dyn].sum())
        speed = np.linalg.norm(v, axis=-1)
        nv, nh = warm_stats(st, cfg)
        print(f"{solver:7s} split={split} steps={100*(chunk+1):5d} "
              f"ke={ke:10.2f} pe={pe:12.2f} etot={ke+pe:12.2f} "
              f"depth={float(np.asarray(m.max_depth)[-1]):.4f} "
              f"vmax={speed.max():7.2f} nfast={(speed > 1).sum():5d} "
              f"warm={nh}/{nv} "
              f"ovf={int(np.asarray(m.overflow).sum())}",
              flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    split = bool(int(sys.argv[2])) if len(sys.argv) > 2 else True
    solver = sys.argv[3] if len(sys.argv) > 3 else "pallas"
    chunks = int(sys.argv[4]) if len(sys.argv) > 4 else 12
    over = {}
    for kv in sys.argv[5:]:
        k, v = kv.split("=")
        over[k] = float(v) if "." in v else int(v)
    print(f"--- n={n} split={split} solver={solver} over={over}", flush=True)
    run(n, solver, split, chunks, **over)
