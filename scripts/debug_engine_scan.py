"""Reproduce the fused-path corruption with the REAL engine step in scan.

    python scripts/debug_engine_scan.py [n_bodies] [steps] [solver]
"""

import sys

from nudge_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from nudge_tpu.engine import simulate  # noqa: E402
from nudge_tpu.scenes import scene_pile  # noqa: E402


def main(n=20480, steps=8, solver="auto"):
    b = scene_pile(n)
    cfg = b.auto_config(max_box_box_pairs=int(n * 4),
                        max_manifolds=int(n * 2), grid_density=12,
                        solver=solver)
    st = b.finalize(cfg)
    st, m = simulate(st, cfg, steps)
    m = jax.tree.map(np.asarray, m)
    mv = float(np.max(np.abs(np.asarray(st.bodies.vel))))
    for i in range(steps):
        print(f"step {i}: ke={float(m.kinetic_energy[i]):.6g} "
              f"contacts={int(m.contact_count[i])} "
              f"depth={float(m.max_depth[i]):.4g} "
              f"overflow={bool(m.overflow[i])} "
              f"spill={int(m.spill_count[i])}")
    print(f"final max|vel|={mv:.6g}")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20480
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    solver = sys.argv[3] if len(sys.argv) > 3 else "auto"
    main(n, steps, solver)
