"""Numpy-level audit of the slot layout: per-tile dynamic-body windows,
recomputed from first principles, vs what dynamic_windows returns.

    python scripts/debug_tile_contents.py [n_bodies]
"""

import sys

from nudge_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from nudge_tpu.ops.contacts import collide  # noqa: E402
from nudge_tpu.ops.integrate import apply_gravity  # noqa: E402
from nudge_tpu.ops.setup_kernel import color_slots  # noqa: E402
from nudge_tpu.ops.solver import color_manifolds  # noqa: E402
from nudge_tpu.ops.solver_kernel import LANES  # noqa: E402
from nudge_tpu.scenes import scene_pile  # noqa: E402
from nudge_tpu.utils import checkpoint  # noqa: E402


def main(n=20480):
    b = scene_pile(n)
    cfg = b.auto_config(max_box_box_pairs=int(n * 4),
                        max_manifolds=int(n * 2), grid_density=12)
    st0 = b.finalize(cfg)
    st = checkpoint.restore(f"/tmp/settled_{n}.npz", st0)
    bodies = apply_gravity(st.bodies, st.sleep, cfg)
    man, _ = jax.jit(lambda s: collide(s, cfg))(st)
    color, ncol, relax, spill = color_manifolds(man, bodies, cfg)
    slot, mpad = color_slots(color, man, bodies, cfg)

    slot = np.asarray(slot)
    color = np.asarray(color)
    ba = np.asarray(man.body_a)
    bb = np.asarray(man.body_b)
    valid = np.asarray(man.valid)
    dyn = np.asarray(bodies.inv_mass) > 0.0
    da, db = dyn[ba], dyn[bb]

    wlo = np.minimum(np.where(valid & da, ba, 2 ** 30),
                     np.where(valid & db, bb, 2 ** 30)) // LANES
    whi = np.maximum(np.where(valid & da, ba, -1),
                     np.where(valid & db, bb, -1)) // LANES

    n_tiles = mpad // LANES
    tmin = np.full(n_tiles, 2 ** 30)
    tmax = np.full(n_tiles, -1)
    tile = slot // LANES
    np.minimum.at(tmin, tile, wlo)
    np.maximum.at(tmax, tile, whi)
    w = np.where(tmax >= 0, tmax + 1 - np.minimum(tmin, tmax + 1), 0)
    live = w > 0
    print(f"recomputed window width: mean={w[live].mean():.1f} "
          f"median={np.median(w[live]):.0f} "
          f"p90={np.percentile(w[live], 90):.0f} max={w.max()}")

    # dynamic span per manifold
    span = np.where(valid, whi - np.where(wlo > 10**6, whi, wlo) + 1, 0)
    v = valid & (wlo < 10**6)
    print(f"dynamic span: mean={span[v].mean():.2f} "
          f"p90={np.percentile(span[v], 90):.0f} max={span[v].max()}")

    # inspect the widest live tile: what are its manifolds?
    worst = np.argsort(-w)[:3]
    for t in worst:
        sel = valid & (tile == t)
        print(f"tile {t}: width={w[t]} count={sel.sum()} "
              f"colors={np.unique(color[sel])}")
        lo_ids = np.where(da & sel, ba, 2**30)
        lo = np.minimum(lo_ids, np.where(db & sel, bb, 2**30))[sel]
        hi = np.maximum(np.where(da & sel, ba, -1),
                        np.where(db & sel, bb, -1))[sel]
        print("  min-ids:", np.sort(lo)[:8], "...", np.sort(lo)[-4:])
        print("  max-ids:", np.sort(hi)[:4], "...", np.sort(hi)[-8:])

    # distribution of manifolds per color
    cvals, counts = np.unique(color[valid], return_counts=True)
    print("color sizes:", dict(zip(cvals.tolist(), counts.tolist())))


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20480
    main(n)
