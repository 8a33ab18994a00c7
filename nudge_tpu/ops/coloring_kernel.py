"""Pallas TPU kernel for greedy manifold coloring (SURVEY C10 batch packing).

The XLA coloring loop costs ~6 small ops x ~10 rounds of ~150us per-op
overhead (~20% of a step at 2k bodies). This kernel runs all rounds in one
pallas_call with the same one-hot machinery as the solver kernel:

  - per round, uncolored manifolds scatter-min their claim token onto a body
    table (masked min over one-hot tiles; lanes = bodies);
  - row->column vector conversion uses identity matmuls on the MXU (Mosaic
    has no cheap small transpose); tokens and indices stay < 2^23 so f32
    matmul at HIGHEST precision is exact;
  - win check gathers claims back per manifold with row-layout one-hot dots;
  - early exit when everything is colored.

Produces the same greedy maximal-independent-set-per-round coloring as
solver.color_manifolds' XLA loop (same XOR-bijection tokens), so colors match
exactly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_SENT = float(1 << 24)              # "does not claim" index sentinel
_INF_F = 3e38
_TOK_MASK = 0x3FFFFF                # tokens < 2^23: exact in f32
_WBITS = 16                         # membership bits per i32 word


def _rup(x, m):
    return -(-x // m) * m


def _color_kernel(tmin_ref, tmax_ref, bits_ref, ia_ref, ib_ref, color_ref,
                  color_out, claim, gca, gcb,
                  *, max_colors, n_body_tiles, n_man_tiles, w_words):
    # Explicitly seed the output from the input ref. Reading an aliased
    # output ref before writing it relies on Mosaic fetching the aliased
    # HBM buffer into the output VMEM block — which silently does NOT
    # happen in some surrounding programs (outputs are write-only by
    # contract), yielding deterministic garbage colors that appear/vanish
    # with unrelated program changes (observed at the settled 20480-body
    # pile; same failure class as the solve kernel's _init, see
    # solver_kernel._solve_kernel).
    color_out[:, :] = color_ref[:, :]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    eye = (jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
           ).astype(jnp.float32)
    hp = jax.lax.Precision.HIGHEST

    def col_of(row):
        """[1,128] -> [128,1] via identity matmul (exact for f32 < 2^24)."""
        return jax.lax.dot_general(
            eye, row, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hp)

    def member(mt, bt):
        word = bits_ref[mt * w_words + bt // _WBITS]
        return ((word >> (bt % _WBITS)) & 1) > 0

    def round_fn(state):
        r, _ = state
        h = (r + 1) * jnp.uint32(0x9E3779B9).astype(jnp.int32)
        h = (h ^ (h >> 13)) * jnp.uint32(0x85EBCA6B).astype(jnp.int32)
        hmask = h & jnp.int32(_TOK_MASK)

        # ---- reset claim table, scatter-min claims ----
        claim[:, :] = jnp.full((8, n_body_tiles * LANES), _INF_F)

        def scatter_mt(mt, _):
            cols = pl.ds(mt * LANES, LANES)
            colc = color_out[0:1, cols]                           # [1,128] i32
            n_unc_tile = jnp.sum((colc < 0).astype(jnp.int32))

            @pl.when(n_unc_tile > 0)                  # tile done -> skip
            def _():
                idx_row = mt * LANES + lane
                tok_row = (idx_row ^ hmask).astype(jnp.float32)
                tok_row = jnp.where(colc < 0, tok_row, _INF_F)    # live only
                ia_row = ia_ref[0:1, cols]                        # [1,128] f32
                ib_row = ib_ref[0:1, cols]
                ia_col = col_of(ia_row)                           # [128,1]
                ib_col = col_of(ib_row)
                tok_col = col_of(jnp.minimum(tok_row, _SENT * 4.0))

                def claim_bt(bt, _):
                    @pl.when(member(mt, bt))
                    def _():
                        oha = (ia_col - bt * LANES) == lane.astype(jnp.float32)
                        ohb = (ib_col - bt * LANES) == lane.astype(jnp.float32)
                        ca = jnp.min(jnp.where(oha, tok_col, _INF_F), axis=0,
                                     keepdims=True)
                        cb = jnp.min(jnp.where(ohb, tok_col, _INF_F), axis=0,
                                     keepdims=True)
                        upd = jnp.minimum(ca, cb)                 # [1,128]
                        bcols = pl.ds(bt * LANES, LANES)
                        claim[:, bcols] = jnp.minimum(
                            claim[:, bcols],
                            jnp.broadcast_to(upd, (8, LANES)))
                    return 0

                jax.lax.fori_loop(tmin_ref[mt], tmax_ref[mt], claim_bt, 0)
            return 0

        jax.lax.fori_loop(0, n_man_tiles, scatter_mt, 0)

        # ---- win check + color assignment ----
        def check_mt(mt, n_unc):
            cols = pl.ds(mt * LANES, LANES)
            colc = color_out[0:1, cols]
            n_unc_tile = jnp.sum((colc < 0).astype(jnp.int32))

            @pl.when(n_unc_tile > 0)                  # tile done -> skip
            def _():
                idx_row = mt * LANES + lane
                tok_row = (idx_row ^ hmask).astype(jnp.float32)
                ia_row = ia_ref[0:1, cols]
                ib_row = ib_ref[0:1, cols]
                brow = jax.lax.broadcasted_iota(
                    jnp.int32, (LANES, LANES), 0).astype(jnp.float32)

                gca[:, :] = jnp.zeros((8, LANES), jnp.float32)
                gcb[:, :] = jnp.zeros((8, LANES), jnp.float32)

                def gather_bt(bt, _):
                    @pl.when(member(mt, bt))
                    def _():
                        bcols = pl.ds(bt * LANES, LANES)
                        ct = claim[:, bcols]                      # [8,128]
                        oha = ((brow + bt * LANES) ==
                               jnp.broadcast_to(ia_row, (LANES, LANES))
                               ).astype(jnp.float32)
                        ohb = ((brow + bt * LANES) ==
                               jnp.broadcast_to(ib_row, (LANES, LANES))
                               ).astype(jnp.float32)
                        gca[:, :] = gca[:, :] + jnp.dot(
                            ct, oha, preferred_element_type=jnp.float32,
                            precision=hp)
                        gcb[:, :] = gcb[:, :] + jnp.dot(
                            ct, ohb, preferred_element_type=jnp.float32,
                            precision=hp)
                    return 0

                jax.lax.fori_loop(tmin_ref[mt], tmax_ref[mt], gather_bt, 0)
                ok_a = (gca[0:1, :] == tok_row) | (ia_row >= _SENT)
                ok_b = (gcb[0:1, :] == tok_row) | (ib_row >= _SENT)
                win = (colc < 0) & ok_a & ok_b
                color_out[0:1, cols] = jnp.where(win, r, colc)
            new_col = color_out[0:1, cols]
            return n_unc + jnp.sum((new_col < 0).astype(jnp.int32))

        n_unc = jax.lax.fori_loop(0, n_man_tiles, check_mt, jnp.int32(0))
        return r + 1, n_unc

    def cond_fn(state):
        r, n_unc = state
        return (r < max_colors - 1) & (n_unc > 0)

    jax.lax.while_loop(cond_fn, round_fn, (jnp.int32(0), jnp.int32(1)))


def coloring_fits(n_manifolds: int, n_bodies: int) -> bool:
    """VMEM feasibility estimate (3 manifold-row arrays + claim table)."""
    mpad = _rup(max(n_manifolds, LANES), LANES)
    npad = _rup(max(n_bodies, LANES), LANES)
    return (3 * 8 * mpad * 4 + 8 * npad * 4) < 9 * 1024 * 1024


def color_manifolds_pallas(body_a, body_b, valid, dyn, n_bodies: int,
                           max_colors: int, interpret: bool = False):
    """Raw greedy coloring on TPU. Returns color i32[M]: >=0 colored,
    -1 = ran out of rounds (spill), max_colors = invalid manifold.
    Inputs: manifold body indices/validity + per-body dynamic mask."""
    m = body_a.shape[0]
    mpad = _rup(max(m, LANES), LANES)
    npad = _rup(max(n_bodies, LANES), LANES)

    dyn_a = dyn[body_a] & valid
    dyn_b = dyn[body_b] & valid

    def row(idx, claim_live):
        r = jnp.full((8, mpad), _SENT, jnp.float32)
        return r.at[0, :m].set(
            jnp.where(claim_live, idx.astype(jnp.float32), _SENT))

    ia = row(body_a, dyn_a)
    ib = row(body_b, dyn_b)
    color0 = jnp.full((8, mpad), max_colors, jnp.int32)
    color0 = color0.at[0, :m].set(jnp.where(valid, -1, max_colors))

    # per-manifold-tile body-tile windows (claims/gathers sweep only these)
    n_body_tiles = npad // LANES
    claims_any = (ia[0] < _SENT) | (ib[0] < _SENT)
    bt_lo = jnp.where(claims_any,
                      jnp.minimum(ia[0], ib[0]).astype(jnp.int32) // LANES,
                      2 ** 30)
    lo_a = jnp.where(ia[0] < _SENT, ia[0].astype(jnp.int32) // LANES, -1)
    lo_b = jnp.where(ib[0] < _SENT, ib[0].astype(jnp.int32) // LANES, -1)
    bt_hi = jnp.maximum(lo_a, lo_b)
    n_mt = mpad // LANES
    tmin = jnp.minimum(bt_lo.reshape(n_mt, LANES).min(axis=1),
                       n_body_tiles).astype(jnp.int32)
    tmax = jnp.clip(bt_hi.reshape(n_mt, LANES).max(axis=1) + 1,
                    0, n_body_tiles).astype(jnp.int32)
    tmax = jnp.maximum(tmax, tmin)

    # membership bitmask: which body tiles each manifold tile claims (the
    # sweep loops skip the rest — see solver_kernel.dynamic_windows)
    w_words = -(-n_body_tiles // _WBITS)
    mt_of = jnp.arange(mpad, dtype=jnp.int32) // LANES
    dense = jnp.zeros((n_mt, w_words * _WBITS), jnp.int32)
    bta = jnp.clip(ia[0].astype(jnp.int32) // LANES, 0, n_body_tiles - 1)
    btb = jnp.clip(ib[0].astype(jnp.int32) // LANES, 0, n_body_tiles - 1)
    dense = dense.at[mt_of, bta].max((ia[0] < _SENT).astype(jnp.int32))
    dense = dense.at[mt_of, btb].max((ib[0] < _SENT).astype(jnp.int32))
    weights = (jnp.int32(1) << jnp.arange(_WBITS, dtype=jnp.int32))
    bits = jnp.sum(dense.reshape(n_mt, w_words, _WBITS) * weights,
                   axis=-1).reshape(-1).astype(jnp.int32)

    kernel = partial(
        _color_kernel,
        max_colors=max_colors,
        n_body_tiles=n_body_tiles,
        n_man_tiles=n_mt,
        w_words=w_words,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        scratch_shapes=[
            pltpu.VMEM((8, npad), jnp.float32),           # claim table
            pltpu.VMEM((8, LANES), jnp.float32),          # check gather A
            pltpu.VMEM((8, LANES), jnp.float32),          # check gather B
        ],
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((8, mpad), jnp.int32)],
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(tmin, tmax, bits, ia, ib, color0)
    return out[0, :m]
