"""Compare Pallas coloring vs the XLA while-loop at a settled state.

    python scripts/debug_coloring.py [n_bodies]
"""

import sys

from nudge_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nudge_tpu.engine import simulate  # noqa: E402
from nudge_tpu.ops.contacts import collide  # noqa: E402
from nudge_tpu.ops.coloring_kernel import color_manifolds_pallas  # noqa: E402
from nudge_tpu.scenes import scene_pile  # noqa: E402
from nudge_tpu.utils import checkpoint  # noqa: E402

_INF_I32 = jnp.iinfo(jnp.int32).max


def xla_coloring(body_a, body_b, valid, dyn, n_bodies, max_colors):
    m = body_a.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)
    dyn_a = dyn[body_a]
    dyn_b = dyn[body_b]

    def round_fn(state):
        c, color = state
        h = (c + 1) * jnp.uint32(0x9E3779B9).astype(jnp.int32)
        h = (h ^ (h >> 13)) * jnp.uint32(0x85EBCA6B).astype(jnp.int32)
        token = idx ^ (h & jnp.int32(0x3FFFFF))
        uncolored = valid & (color < 0)
        token_a = jnp.where(uncolored & dyn_a, token, _INF_I32)
        token_b = jnp.where(uncolored & dyn_b, token, _INF_I32)
        claim = jnp.full((n_bodies,), _INF_I32, jnp.int32)
        claim = claim.at[body_a].min(token_a)
        claim = claim.at[body_b].min(token_b)
        ok_a = ~dyn_a | (claim[body_a] == token)
        ok_b = ~dyn_b | (claim[body_b] == token)
        win = uncolored & ok_a & ok_b
        return c + 1, jnp.where(win, c, color)

    def has_uncolored(state):
        c, color = state
        return (c < max_colors - 1) & jnp.any(valid & (color < 0))

    color = jnp.full_like(body_a, -1)
    _, color = jax.lax.while_loop(has_uncolored, round_fn,
                                  (jnp.int32(0), color))
    return color


def main(n=20480):
    b = scene_pile(n)
    cfg = b.auto_config(max_box_box_pairs=int(n * 4),
                        max_manifolds=int(n * 2), grid_density=12)
    st0 = b.finalize(cfg)
    st = checkpoint.restore(f"/tmp/settled_{n}.npz", st0)

    man, _ = jax.jit(lambda s: collide(s, cfg))(st)
    dyn = st.bodies.inv_mass > 0.0
    nb = st.bodies.pos.shape[0]

    cx = jax.jit(lambda: xla_coloring(man.body_a, man.body_b, man.valid, dyn,
                                      nb, cfg.max_colors))()
    cp = jax.jit(lambda: color_manifolds_pallas(
        man.body_a, man.body_b, man.valid, dyn, nb, cfg.max_colors))()
    cx = np.asarray(cx)
    cp = np.asarray(cp)
    valid = np.asarray(man.valid)
    print("max_colors:", cfg.max_colors, "valid manifolds:", valid.sum())
    print("XLA:   colored:", ((cx >= 0) & valid).sum(),
          "spill:", ((cx < 0) & valid).sum(),
          "n_colors:", cx[valid].max() + 1 if valid.any() else 0)
    pv = cp[valid]
    print("PALLAS colored:", ((cp >= 0) & (cp < cfg.max_colors) & valid).sum(),
          "uncolored(-1/max):",
          (((cp < 0) | (cp == cfg.max_colors)) & valid).sum(),
          "min/max value:", pv.min(), pv.max())
    diff = valid & (cx != cp)
    print("mismatches among valid:", diff.sum())
    bad = valid & ((cp > cfg.max_colors) | (cp < -1))
    print("out-of-range pallas colors:", bad.sum())
    if bad.any():
        i = np.nonzero(bad)[0][:10]
        print("examples idx:", i, "values:", cp[i])


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20480
    main(n)
