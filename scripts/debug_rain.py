"""Fine-grained rain-phase diagnostic: per-20-step height/velocity stats to
catch super-gravity downward motion (teleporting positions) or tunneling.

Usage: python scripts/debug_rain.py [n] [solver] [iters] [steps] [split]
"""

import sys

from nudge_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import numpy as np  # noqa: E402

from nudge_tpu.engine import simulate  # noqa: E402
from nudge_tpu.scenes import scene_pile  # noqa: E402


def run(n, solver, iters, steps, split):
    b = scene_pile(n, seed=3)
    cfg = b.auto_config(max_box_box_pairs=5 * n, max_manifolds=2 * n,
                        grid_density=16, solver=solver, split_impulse=split,
                        solver_iters=iters)
    st = b.finalize(cfg)
    g = 9.81
    for chunk in range(steps // 20):
        st, m = simulate(st, cfg, 20)
        pos = np.asarray(st.bodies.pos)
        v = np.asarray(st.bodies.vel)
        dyn = np.asarray(st.bodies.inv_mass) > 0
        y = pos[dyn, 1]
        vy = v[dyn, 1]
        ke = float(np.asarray(m.kinetic_energy)[-1])
        t = 20 * (chunk + 1) / 60.0
        print(f"t={t:5.2f}s ke={ke:10.1f} ymean={y.mean():7.2f} "
              f"ymax={y.max():7.2f} ymin={y.min():7.3f} "
              f"vymin={vy.min():8.2f} (freefall vcap={-g*t:7.2f}) "
              f"depth={float(np.asarray(m.max_depth)[-1]):.3f} "
              f"contacts={int(np.asarray(m.contact_count)[-1])}",
              flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    solver = sys.argv[2] if len(sys.argv) > 2 else "pallas"
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 60
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 200
    split = bool(int(sys.argv[5])) if len(sys.argv) > 5 else True
    print(f"--- n={n} solver={solver} iters={iters} split={split}",
          flush=True)
    run(n, solver, iters, steps, split)
