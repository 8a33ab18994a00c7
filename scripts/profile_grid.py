"""Per-substage TPU timing of the grid broadphase at a given scale — decides
where the round-2 broadphase effort goes (docs/PERF_NOTES.md plan 2).

Usage: python scripts/profile_grid.py [n_bodies] [reps]
"""

import sys
import time

from nudge_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nudge_tpu.config import SimConfig  # noqa: E402
from nudge_tpu.engine import simulate  # noqa: E402
from nudge_tpu.ops.broadphase import compact_mask  # noqa: E402
from nudge_tpu.ops.broadphase import world_colliders  # noqa: E402
from nudge_tpu.ops.grid import _all_aabbs, grid_broadphase  # noqa: E402
from nudge_tpu.scenes import scene_pile  # noqa: E402


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    np.asarray(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out)
        ts.append(time.perf_counter() - t0)
    ms = 1e3 * float(np.median(ts))
    print(f"{name:30s} {ms:8.3f} ms", flush=True)
    return ms


def main(n=20480, reps=15):
    b = scene_pile(n)
    mcap = max(512, int(n * 2.0))
    pcap = max(1024, int(n * 5.0))
    cfg = b.auto_config(max_box_box_pairs=pcap, max_manifolds=mcap,
                        grid_density=16)
    st = b.finalize(cfg)
    for _ in range(4):
        st, _ = simulate(st, cfg, 100)
        np.asarray(st.bodies.pos)
    print(f"— settled {n}-box pile — grid substages —", flush=True)

    wc = jax.jit(world_colliders)(st)

    def stage_cells(s, w):
        lo, hi, body, valid = _all_aabbs(s, w, cfg)
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
        coords = jnp.clip(coords_abs - cmin, 0, jnp.array([ex - 1, ey - 1, ez - 1]))
        lin = (coords[:, 0] * ey + coords[:, 1]) * ez + coords[:, 2]
        lin = jnp.where(in_grid, lin, ex * ey * ez + 1)
        return lo, hi, body, valid, in_grid, coords, lin

    lo, hi, body, valid, in_grid, coords, lin = jax.jit(stage_cells)(st, wc)
    g = lo.shape[0]
    gid = jnp.arange(g, dtype=jnp.int32)
    ex, ey, ez = cfg.grid_table_dims
    tbl_size = ex * ey * ez

    timeit("aabbs+cells", jax.jit(
        lambda s, w: stage_cells(s, w)[6]), st, wc, reps=reps)

    def stage_sort(lin):
        _, order = jax.lax.sort((lin, gid), num_keys=1)
        return order

    order = jax.jit(stage_sort)(lin)
    timeit("collider sort", jax.jit(stage_sort), lin, reps=reps)

    def stage_tables(lin, order):
        lin_sorted = lin[order]
        pos_arr = jnp.arange(g, dtype=jnp.int32)
        start_tbl = jnp.full((tbl_size + 2,), g, jnp.int32
                             ).at[lin_sorted].min(pos_arr)
        end_tbl = jnp.zeros((tbl_size + 2,), jnp.int32
                            ).at[lin_sorted].max(pos_arr + 1)
        return start_tbl, end_tbl

    start_tbl, end_tbl = jax.jit(stage_tables)(lin, order)
    timeit("cell tables (scatters)", jax.jit(
        lambda l, o: stage_tables(l, o)[0]), lin, order, reps=reps)

    import numpy as _np
    off_all = _np.stack(_np.meshgrid(*([_np.arange(-1, 2)] * 3),
                                     indexing="ij"), axis=-1).reshape(27, 3)
    lex = off_all[:, 0] * 9 + off_all[:, 1] * 3 + off_all[:, 2]
    off = jnp.asarray(off_all[lex >= 0])

    def stage_windows(coords, start_tbl, end_tbl):
        ncoords = coords[:, None, :] + off[None, :, :]
        in_ext = jnp.all((ncoords >= 0) & (ncoords < jnp.array([ex, ey, ez])),
                         axis=-1)
        nlin = (ncoords[..., 0] * ey + ncoords[..., 1]) * ez + ncoords[..., 2]
        nlin = jnp.where(in_ext, nlin, tbl_size)
        return start_tbl[nlin], end_tbl[nlin]

    qlo, qhi = jax.jit(stage_windows)(coords, start_tbl, end_tbl)
    timeit("stencil windows (gather)", jax.jit(
        lambda c, s, e: stage_windows(c, s, e)[0]), coords, start_tbl,
        end_tbl, reps=reps)

    moving = jnp.ones((g,), bool)
    table = jnp.concatenate([
        lo, hi, gid[:, None].astype(jnp.float32),
        body[:, None].astype(jnp.float32),
        moving[:, None].astype(jnp.float32),
        valid[:, None].astype(jnp.float32)], axis=-1)[order]

    k = jnp.arange(cfg.grid_density)

    def stage_gather(qlo, qhi, table):
        pos = jnp.minimum(qlo[..., None] + k, g - 1)
        return table[pos]

    cand = jax.jit(stage_gather)(qlo, qhi, table)
    timeit(f"candidate gather [G,14,{cfg.grid_density},10]", jax.jit(
        lambda a, b, t: jnp.sum(stage_gather(a, b, t))), qlo, qhi, table,
        reps=reps)

    def stage_mask(qlo, qhi, cand):
        live = ((qlo[..., None] + k) < qhi[..., None]) & in_grid[:, None, None]
        j_lo, j_hi = cand[..., 0:3], cand[..., 3:6]
        j_id = cand[..., 6].astype(jnp.int32)
        j_body = cand[..., 7].astype(jnp.int32)
        same_cell = (jnp.sum(jnp.abs(off), axis=-1) == 0)[None, :, None]
        keep = live & (cand[..., 9] > 0.5)
        keep &= jnp.where(same_cell, j_id > gid[:, None, None],
                          j_id != gid[:, None, None])
        keep &= jnp.all((lo[:, None, None, :] <= j_hi)
                        & (j_lo <= hi[:, None, None, :]), axis=-1)
        keep &= body[:, None, None] != j_body
        return keep

    keep = jax.jit(stage_mask)(qlo, qhi, cand)
    timeit("AABB mask ops", jax.jit(
        lambda a, b, c: jnp.sum(stage_mask(a, b, c))), qlo, qhi, cand,
        reps=reps)

    cap = cfg.total_pairs

    def stage_compact(keep):
        sel, sel_valid, total = compact_mask(keep.reshape(-1), cap)
        return sel

    timeit(f"compaction sort ({keep.size} -> {cap})", jax.jit(
        lambda kk: jnp.sum(stage_compact(kk))), keep, reps=reps)

    timeit("FULL grid_broadphase", jax.jit(
        lambda s, w: grid_broadphase(s, w, cfg)[0].count), st, wc, reps=reps)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20480
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    main(n, reps)
