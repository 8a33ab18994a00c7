"""Diagnose the config-4 (20,480 pile) overflow: which capacity blows,
when, and how big the candidate-expansion spike actually is."""
import sys

sys.path.insert(0, "/root/repo")

from nudge_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from bench import tuned_config
from nudge_tpu.engine import simulate
from nudge_tpu.scenes import scene_pile
from nudge_tpu.ops import grid as gridmod
from nudge_tpu.ops.broadphase import world_colliders

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20480
CHUNK = 25

b = scene_pile(N)
cfg = tuned_config(b, N, sleeping=True, persistent_broadphase=True)
st = b.finalize(cfg)
print("pcap", cfg.total_pairs, "expand cap", 16 * cfg.total_pairs,
      "density", cfg.grid_density, flush=True)


@jax.jit
def probe(state):
    wc = world_colliders(state)
    lo, hi, body, valid = gridmod._all_aabbs(state, wc, cfg)
    g = lo.shape[0]
    center = 0.5 * (lo + hi)
    ext = jnp.max(0.5 * (hi - lo), axis=-1)
    med = jnp.nan_to_num(jnp.median(jnp.where(valid, ext, jnp.nan)), nan=1.0)
    big = valid & (ext > 2.0 * med)
    cell = jnp.maximum(2.0 * jnp.max(jnp.where(valid & ~big, ext, 0.0)), 1e-3)
    in_grid = valid & ~big
    ex, ey, ez = cfg.grid_table_dims
    coords_abs = jnp.floor(center / cell).astype(jnp.int32)
    n_in = jnp.maximum(jnp.sum(in_grid.astype(jnp.float32)), 1.0)
    cmean = jnp.floor(jnp.sum(jnp.where(in_grid[:, None],
                                        coords_abs.astype(jnp.float32), 0.0),
                              axis=0) / n_in).astype(jnp.int32)
    cmin = cmean - jnp.array([ex // 2, ey // 2, ez // 2])
    coords = jnp.clip(coords_abs - cmin, 0, jnp.array([ex-1, ey-1, ez-1]))
    lin = (coords[:, 0] * ey + coords[:, 1]) * ez + coords[:, 2]
    tbl = ex * ey * ez
    lin = jnp.where(in_grid, lin, tbl + 1)
    gid = jnp.arange(g, dtype=jnp.int32)
    _, order = jax.lax.sort((lin, gid), num_keys=1)
    lin_s = lin[order]
    pos_arr = jnp.arange(g, dtype=jnp.int32)
    start_tbl = jnp.full((tbl + 2,), g, jnp.int32).at[lin_s].min(pos_arr)
    end_tbl = jnp.zeros((tbl + 2,), jnp.int32).at[lin_s].max(pos_arr + 1)
    import numpy as _np
    off_all = _np.stack(_np.meshgrid(*([_np.arange(-1, 2)] * 3),
                                     indexing="ij"), axis=-1).reshape(27, 3)
    lex = off_all[:, 0] * 9 + off_all[:, 1] * 3 + off_all[:, 2]
    off = jnp.asarray(off_all[lex >= 0])
    nco = coords[:, None, :] + off[None, :, :]
    in_ext = jnp.all((nco >= 0) & (nco < jnp.array([ex, ey, ez])), axis=-1)
    nlin = jnp.where(in_ext,
                     (nco[..., 0] * ey + nco[..., 1]) * ez + nco[..., 2], tbl)
    cnt_raw = jnp.where(in_grid[:, None],
                        jnp.maximum(end_tbl[nlin] - start_tbl[nlin], 0), 0)
    cnt = jnp.minimum(cnt_raw, cfg.grid_density)
    return dict(
        max_density=jnp.max(cnt_raw),
        total_cand=jnp.sum(cnt.astype(jnp.int64)
                           if False else cnt),
        n_big=jnp.sum(big.astype(jnp.int32)),
        cell=cell,
        coord_spread=jnp.max(jnp.where(in_grid[:, None], coords_abs, 0),
                             axis=0)
        - jnp.min(jnp.where(in_grid[:, None], coords_abs, 10**9), axis=0),
    )


for c in range(12):
    p = {k: np.asarray(v) for k, v in probe(st).items()}
    st, m = simulate(st, cfg, CHUNK)
    last = lambda x: np.asarray(x).reshape(-1)[-1]
    ke = float(last(m.kinetic_energy))
    print(f"step {c*CHUNK:4d}: contacts={int(last(m.contact_count)):6d} "
          f"ke={ke:12.1f} depth={float(last(m.max_depth)):.4f} "
          f"ovf={bool(np.asarray(m.overflow).any())} "
          f"max_dens={int(p['max_density']):4d} "
          f"cand={int(p['total_cand']):8d} big={int(p['n_big'])} "
          f"cell={float(p['cell']):.3f} spread={p['coord_spread']}",
          flush=True)
