"""Tall-tower shock repro at small N (round-3 bisect of the 20480 impact
explosion).

The 20,480-box pile is a 28x28x26 lattice TOWER whose compaction shock
ejects bodies at several times free-fall speed and eventually squeezes
boxes through the ground slab (depth 1.0 = slab center => SAT normal flip
=> eternal free fall).  Layer count, not body count, drives the shock — so
a BASE x BASE x LAYERS tower reproduces the failure at CPU-debuggable size
if the cause is physics (solver/bias), and does not if the cause is a
large-N kernel miscompile.

Usage:
  python scripts/debug_tower.py [base] [layers] [chunks] [key=val ...]
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

import numpy as np  # noqa: E402

from nudge_tpu.engine import simulate  # noqa: E402
from nudge_tpu.scenes import SceneBuilder, _ground  # noqa: E402


def scene_tower(base: int, layers: int, half: float = 0.5,
                spacing: float = 1.15, seed: int = 3) -> SceneBuilder:
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    _ground(b)
    d = 2 * half * spacing
    for iy in range(layers):
        for ix in range(base):
            for iz in range(base):
                p = (
                    (ix - (base - 1) / 2) * d + rng.uniform(-0.1, 0.1) * half,
                    half * 1.5 + iy * d,
                    (iz - (base - 1) / 2) * d + rng.uniform(-0.1, 0.1) * half,
                )
                q = np.concatenate([rng.uniform(-0.05, 0.05, 3), [1.0]])
                q /= np.linalg.norm(q)
                b.add_box((half, half, half), p, quat=q)
    return b


def run(base, layers, chunks, **over):
    n = base * base * layers
    b = scene_tower(base, layers)
    kw = dict(max_box_box_pairs=5 * n, max_manifolds=3 * n,
              grid_density=16)
    kw.update(over)
    cfg = b.auto_config(**kw)
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
        ymin = float(pos[dyn, 1].min())
        print(f"steps={100*(chunk+1):5d} ke={ke:10.2f} pe={pe:12.2f} "
              f"etot={ke+pe:12.2f} "
              f"depth={float(np.asarray(m.max_depth)[-1]):.4f} "
              f"vmax={speed.max():7.2f} nfast={(speed > 1).sum():5d} "
              f"ymin={ymin:8.2f} "
              f"awake={int(np.asarray(m.awake_count)[-1])} "
              f"spill={int(np.asarray(m.spill_count).max())} "
              f"ovf={int(np.asarray(m.overflow).sum())}",
              flush=True)


if __name__ == "__main__":
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    layers = int(sys.argv[2]) if len(sys.argv) > 2 else 26
    chunks = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    over = {}
    for kv in sys.argv[4:]:
        k, v = kv.split("=")
        try:
            over[k] = float(v) if "." in v else int(v)
        except ValueError:
            over[k] = v          # string knobs, e.g. solver=xla
    print(f"--- tower {base}x{base}x{layers} n={base*base*layers} "
          f"over={over}", flush=True)
    run(base, layers, chunks, **over)
