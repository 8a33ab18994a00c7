"""Discriminate split-impulse physics vs kernel-path corruption: run the
same 512-box pile through solver='pallas' and solver='xla' on the SAME
backend and compare KE/depth trends chunk by chunk.

Usage: python scripts/debug_split512.py [n] [split:0|1]
"""

import sys

from nudge_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import numpy as np  # noqa: E402

from nudge_tpu.engine import simulate  # noqa: E402
from nudge_tpu.scenes import scene_pile  # noqa: E402


def run(n, solver, split, **over):
    b = scene_pile(n, seed=3)
    cfg = b.auto_config(max_box_box_pairs=5 * n, max_manifolds=2 * n,
                        grid_density=16, solver=solver, split_impulse=split,
                        **over)
    st = b.finalize(cfg)
    out = []
    for chunk in range(6):
        st, m = simulate(st, cfg, 100)
        v = np.asarray(st.bodies.vel)
        speed = np.linalg.norm(v, axis=-1)
        out.append((
            float(np.asarray(m.kinetic_energy)[-1]),
            float(np.asarray(m.max_depth)[-1]),
            bool(np.asarray(m.overflow).any()),
            int(np.asarray(m.spill_count).max()),
        ))
        print(f"{solver:7s} split={split} steps={100*(chunk+1):4d} "
              f"ke={out[-1][0]:12.2f} depth={out[-1][1]:.4f} "
              f"overflow={out[-1][2]} spill={out[-1][3]} "
              f"vmax={speed.max():8.2f} nfast={(speed > 1).sum():5d} "
              f"ymax={np.asarray(st.bodies.pos)[1:, 1].max():7.2f}",
              flush=True)
    return out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    split = bool(int(sys.argv[2])) if len(sys.argv) > 2 else True
    run(n, "pallas", split)
    run(n, "xla", split)
