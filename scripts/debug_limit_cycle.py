"""Bisect the settled-pile KE limit cycle (round-2 regression).

Simulates a pile in chunks; per chunk reports KE/PE/etot/depth plus TWO
invariant probes:
  - conflicts: join state.colors onto the CURRENT manifolds (exactly what
    color_manifolds_cached does) and count (color, dynamic body) slots
    written twice among the HIT manifolds — tests the "cached colors are
    mutually conflict-free" claim as the cache ages.
  - n_colors: colors in use (persistent coloring never recompacts; drift
    up = more sweeps per iteration AND possible degradation signal).

Usage:
  python scripts/debug_limit_cycle.py [n] [chunks] [key=val ...]
Env: NUDGE_CPU=1 to force the host CPU backend.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("NUDGE_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

from nudge_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nudge_tpu.engine import simulate  # noqa: E402
from nudge_tpu.ops.cache import _join  # noqa: E402
from nudge_tpu.ops.contacts import collide  # noqa: E402
from nudge_tpu.scenes import scene_pile  # noqa: E402


def probe(st, cfg):
    """(conflicts among cache-hit manifolds, hits, valid, n_colors)."""
    def f(state):
        man, _ = collide(state, cfg)
        cc = state.colors
        zc = jnp.zeros((cc.ga.shape[0],), jnp.int32)
        zm = jnp.zeros((man.ga.shape[0],), jnp.int32)
        payload = jnp.stack([
            cc.color.astype(jnp.float32) + 1.0,
            cc.dynbits.astype(jnp.float32),
            jnp.zeros_like(zc, dtype=jnp.float32),
        ], axis=-1)
        joined = _join(cc.ga, cc.gb, zc, payload, cc.valid,
                       man.ga, man.gb, zm, man.valid)
        hit = joined[:, 0]
        # mirror the engine: sleepers are solver-static, and hits are only
        # trusted when the dyn-mask they were colored under still holds
        dyn = (state.bodies.inv_mass > 0.0) & state.sleep.awake
        bits = (dyn[man.body_a].astype(jnp.int32)
                + 2 * dyn[man.body_b].astype(jnp.int32))
        fresh = joined[:, 1].astype(jnp.int32) == bits
        color = jnp.where(man.valid & (hit > 0.5) & fresh,
                          hit.astype(jnp.int32) - 1, -1)
        ok = color >= 0
        n = state.bodies.pos.shape[0]
        ncolors = jnp.max(color) + 1
        size = cfg.max_colors * n
        key_a = color * n + man.body_a
        key_b = color * n + man.body_b
        va = ok & dyn[man.body_a]
        vb = ok & dyn[man.body_b]
        counts = jnp.zeros((size + 1,), jnp.int32)
        counts = counts.at[jnp.where(va, key_a, size)].add(1)
        counts = counts.at[jnp.where(vb, key_b, size)].add(1)
        conf = jnp.sum(jnp.maximum(counts[:size] - 1, 0))
        return (conf, jnp.sum(ok.astype(jnp.int32)),
                jnp.sum(man.valid.astype(jnp.int32)), ncolors)
    c, h, v, nc = jax.jit(f)(st)
    return int(c), int(h), int(v), int(nc)


def run(n, chunks, ckpt_dir=None, **over):
    # `steps` is a script knob (chunk size), not a SimConfig field — pop it
    # before auto_config (ADVICE r4: the battery passed steps=100 and the
    # run died on SimConfig(**kw) TypeError before the first chunk).
    steps = int(over.pop("steps", 100))
    b = scene_pile(n, seed=3)
    kw = dict(max_box_box_pairs=8 * n, max_manifolds=3 * n,
              grid_density=16, fat_pair_factor=2)
    kw.update(over)
    cfg = b.auto_config(**kw)
    st = b.finalize(cfg)
    g = 9.81
    for chunk in range(chunks):
        st, m = simulate(st, cfg, steps)
        if ckpt_dir:
            from nudge_tpu.utils import checkpoint as _ck
            _ck.save(f"{ckpt_dir}/pile{n}_step{steps * (chunk + 1)}.npz", st)
        pos = np.asarray(st.bodies.pos)
        v = np.asarray(st.bodies.vel)
        inv_m = np.asarray(st.bodies.inv_mass)
        dyn = inv_m > 0
        mass = np.where(dyn, 1.0 / np.maximum(inv_m, 1e-9), 0.0)
        ke = float(np.asarray(m.kinetic_energy)[-1])
        pe = float((mass * g * pos[:, 1])[dyn].sum())
        speed = np.linalg.norm(v, axis=-1)
        conf, hits, valid, ncol = probe(st, cfg)
        print(f"steps={steps*(chunk+1):5d} ke={ke:10.2f} pe={pe:12.2f} "
              f"etot={ke+pe:12.2f} "
              f"depth={float(np.asarray(m.max_depth)[-1]):.4f} "
              f"vmax={speed.max():7.2f} nfast={(speed > 1).sum():5d} "
              f"awake={int(np.asarray(m.awake_count)[-1])} "
              f"conflicts={conf} colorhits={hits}/{valid} ncolors={ncol} "
              f"spill={int(np.asarray(m.spill_count).max())} "
              f"ovf={int(np.asarray(m.overflow).sum())} "
              f"ovfbits={int(np.bitwise_or.reduce(np.asarray(m.overflow_bits)))} "
              f"mdemand={int(np.asarray(m.manifold_demand).max())} "
              f"pdemand={int(np.asarray(m.pair_demand).max())} "
              f"dead={int(((inv_m > 0) & ~np.asarray(st.sleep.awake) & (pos[:, 1] < cfg.kill_plane_y)).sum())}",
              flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    over = {}
    ckpt_dir = os.environ.get("NUDGE_CKPT_DIR")
    for kv in sys.argv[3:]:
        k, v = kv.split("=")
        try:
            over[k] = float(v) if "." in v else int(v)
        except ValueError:
            over[k] = v          # string knobs, e.g. solver=xla
    print(f"--- n={n} over={over} ckpt_dir={ckpt_dir}", flush=True)
    run(n, chunks, ckpt_dir=ckpt_dir, **over)
