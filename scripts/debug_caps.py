"""Which capacity overflows? Simulate a scene, then report every count vs
its cap (pairs per class, grid candidates, manifolds, cache, persistent fat
pairs). Round-3 tool: the settled 5x5x26 tower flags overflow continuously
(scripts/debug_tower.py) and the failed round-2/3 20480 TPU benches all died
with overflow:true — this pinpoints WHICH capacity is undersized.

Usage: python scripts/debug_caps.py [kind] [args...] [key=val ...]
  kind=tower: args = base layers steps
  kind=pile:  args = n steps
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
from nudge_tpu.ops import broadphase as bpmod  # noqa: E402
from nudge_tpu.ops.contacts import collide  # noqa: E402


def report(st, cfg):
    @jax.jit
    def f(state):
        man, _ = collide(state, cfg)
        return (jnp.sum(man.valid.astype(jnp.int32)), man.overflow,
                man.contact_count)
    nman, ovf, npts = f(st)
    print(f"manifolds: {int(nman)} / cap {cfg.max_manifolds} "
          f"(points {int(npts)} / {cfg.max_manifolds * 4}) overflow={bool(ovf)}")
    # per-class candidate pairs (pre-narrowphase)
    try:
        pairs = bpmod.broadphase_pairs(st, cfg)
        for name, p in (("bb", pairs.get("bb")), ("bs", pairs.get("bs")),
                        ("ss", pairs.get("ss"))):
            if p is None:
                continue
            print(f"pairs[{name}]: {int(np.sum(np.asarray(p.valid)))} "
                  f"/ cap {p.valid.shape[0]} overflow="
                  f"{bool(np.asarray(p.overflow))}")
    except Exception as e:  # broadphase module shape differs; best effort
        print("pair probe failed:", e)


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "tower"
    args = [a for a in sys.argv[2:] if "=" not in a]
    over = {}
    for kv in sys.argv[2:]:
        if "=" not in kv:
            continue
        k, v = kv.split("=")
        try:
            over[k] = float(v) if "." in v else int(v)
        except ValueError:
            over[k] = v
    if kind == "tower":
        from scripts.debug_tower import scene_tower
        base, layers, steps = (int(x) for x in (args + [5, 26, 600])[:3])
        n = base * base * layers
        b = scene_tower(base, layers)
    else:
        from nudge_tpu.scenes import scene_pile
        n, steps = (int(x) for x in (args + [2048, 600])[:2])
        b = scene_pile(n, seed=3)
    kw = dict(max_box_box_pairs=5 * n, max_manifolds=3 * n, grid_density=16)
    kw.update(over)
    cfg = b.auto_config(**kw)
    st = b.finalize(cfg)
    for chunk in range(max(1, steps // 100)):
        st, m = simulate(st, cfg, 100)
        print(f"steps={100 * (chunk + 1)} "
              f"ovf_steps={int(np.asarray(m.overflow).sum())}/100 "
              f"contacts={int(np.asarray(m.contact_count)[-1])}", flush=True)
    report(st, cfg)


if __name__ == "__main__":
    main()
