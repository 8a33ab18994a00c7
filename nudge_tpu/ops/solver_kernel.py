"""Pallas TPU mega-kernel for the impulse solve (SURVEY §7 M5).

The XLA-level solve (solver.py) launches ~30 small ops per color pass;
with ~20 iterations x ~15 colors that is ~10k kernel launches per step and
per-op overhead dominates (measured ~650us/pass on v5e for tiny arrays).
This kernel runs the ENTIRE iterated solve in one `pallas_call`:

  - body momentum lives in VMEM as a component-major table `velw[8, Npad]`
    (rows vx,vy,vz,wx,wy,wz,inv_mass,pad) for the whole solve — zero HBM
    traffic in the hot loop;
  - constraints are packed into one f32 tensor `con[128, Mpad]` (column =
    manifold, rows = layout below), pre-sorted by color so each color is a
    contiguous column segment; a color's tiles are swept with a
    dynamic-bound `fori_loop`;
  - gather/scatter of body columns uses one-hot MXU matmuls per 128-lane
    tile: `A = velw_tile @ onehot` / `velw_tile += delta @ onehot^T`.
    Within a color no dynamic body repeats (coloring invariant), so the
    scatter is conflict-free; one-hot contraction makes it exact in f32,
    so results match the XLA path bitwise;
  - the <=4 points of a manifold are solved sequentially in registers
    (same block Gauss-Seidel as solver.py).

Capacity: everything must fit VMEM (~16MB/core): con is 512B per manifold,
velw 32B per body. The engine falls back to the XLA solve when the estimate
exceeds the budget (big scenes, e.g. the 20k pile — see solve() dispatch in
engine.py/solver.py).

Row layout of `con` (P = CONTACT_POINTS = 4):
  0:3 n | 3:6 t1 | 6:9 t2 | 9 mu | 10 relax
  11 + 28*p + [0:3 ra | 3:6 rb | 6:9 jna | 9:12 jnb | 12:15 jt1a | 15:18 jt1b
               | 18:21 jt2a | 21:24 jt2b | 24 mn | 25 mt1 | 26 mt2 | 27 bias]
Accumulators `acc[16, Mpad]`: rows 4p+... -> [0:4] lambda_n, [4:8] lambda_t1,
[8:12] lambda_t2 per point.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import CONTACT_POINTS, SimConfig
from ..state import Bodies

LANES = 128
CON_ROWS = 128          # 11 + 28*4 = 123, padded
_PT = 28                # rows per point
_PT0 = 11               # first point row


def _rup(x, m):
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# packing (XLA side)
# ---------------------------------------------------------------------------

def pack_solver_inputs(bodies: Bodies, con, acc, cfg: SimConfig):
    """Sort manifolds by color and pack kernel inputs.

    Returns (velw[8,Npad], conf[128,Mpad], aux[8,Mpad] i32, accf[16,Mpad],
    starts[max_colors+1] i32, perm) — `perm` un-permutes acc afterwards."""
    n = bodies.pos.shape[0]
    m = con.color.shape[0]
    npad = _rup(max(n, LANES), LANES)
    mpad = _rup(max(m, LANES), LANES)

    velw = jnp.zeros((8, npad), jnp.float32)
    velw = velw.at[0:3, :n].set(bodies.vel.T)
    velw = velw.at[3:6, :n].set(bodies.angvel.T)
    velw = velw.at[6, :n].set(bodies.inv_mass)

    # color sort (invalid manifolds carry color == max_colors -> sorted last)
    _, perm = jax.lax.sort(
        (con.color, jnp.arange(m, dtype=jnp.int32)), num_keys=1
    )
    sc = con.color[perm]
    starts = jnp.searchsorted(
        sc, jnp.arange(cfg.max_colors + 1, dtype=jnp.int32)
    ).astype(jnp.int32)

    def put(buf, row, x):
        x = x[perm]
        if x.ndim == 1:
            return buf.at[row, :m].set(x)
        return buf.at[row:row + x.shape[1], :m].set(x.T)

    cf = jnp.zeros((CON_ROWS, mpad), jnp.float32)
    cf = put(cf, 0, con.n)
    cf = put(cf, 3, con.t1)
    cf = put(cf, 6, con.t2)
    cf = put(cf, 9, con.mu)
    cf = put(cf, 10, con.relax)
    pv = con.point_valid
    for p in range(CONTACT_POINTS):
        b = _PT0 + _PT * p
        cf = put(cf, b + 0, con.ra[:, p])
        cf = put(cf, b + 3, con.rb[:, p])
        cf = put(cf, b + 6, con.jna[:, p])
        cf = put(cf, b + 9, con.jnb[:, p])
        cf = put(cf, b + 12, con.jt1a[:, p])
        cf = put(cf, b + 15, con.jt1b[:, p])
        cf = put(cf, b + 18, con.jt2a[:, p])
        cf = put(cf, b + 21, con.jt2b[:, p])
        # invalid points get zero masses and bias -> all deltas are zero
        pm = pv[:, p]
        cf = put(cf, b + 24, jnp.where(pm, con.mn[:, p], 0.0))
        cf = put(cf, b + 25, jnp.where(pm, con.mt1[:, p], 0.0))
        cf = put(cf, b + 26, jnp.where(pm, con.mt2[:, p], 0.0))
        cf = put(cf, b + 27, jnp.where(pm, con.bias[:, p], 0.0))

    aux = jnp.zeros((8, mpad), jnp.int32)
    aux = aux.at[0, :m].set(con.body_a[perm])
    aux = aux.at[1, :m].set(con.body_b[perm])

    acc_n, acc_t1, acc_t2 = acc
    af = jnp.zeros((16, mpad), jnp.float32)
    af = af.at[0:4, :m].set(acc_n[perm].T)
    af = af.at[4:8, :m].set(acc_t1[perm].T)
    af = af.at[8:12, :m].set(acc_t2[perm].T)

    return velw, cf, aux, af, starts, perm


def unpack_solver_outputs(bodies: Bodies, velw, accf, perm, m):
    n = bodies.pos.shape[0]
    inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(perm.shape[0],
                                                       dtype=jnp.int32))
    acc_n = accf[0:4, :m].T[inv]
    acc_t1 = accf[4:8, :m].T[inv]
    acc_t2 = accf[8:12, :m].T[inv]
    bodies = bodies.replace(
        vel=velw[0:3, :n].T, angvel=velw[3:6, :n].T
    )
    return bodies, (acc_n, acc_t1, acc_t2)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _cross3(a, b):
    """Cross product of [3,128] row stacks."""
    ax, ay, az = a[0:1], a[1:2], a[2:3]
    bx, by, bz = b[0:1], b[1:2], b[2:3]
    return jnp.concatenate(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=0
    )


def _solve_kernel(starts_ref, velw_ref, con_ref, aux_ref, acc_ref,
                  velw_out, acc_out, *, iters, n_colors_cap, n_body_tiles):
    # in-place operation on the aliased outputs
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    brow = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)

    n_colors = starts_ref[n_colors_cap + 1]

    def tile_body(t, carry_c):
        cs, ce = carry_c
        cols = pl.ds(t * LANES, LANES)
        gcol = t * LANES + lane
        live = ((gcol >= cs) & (gcol < ce)).astype(jnp.float32)   # [1,128]

        idxa = aux_ref[0:1, cols]                                  # [1,128]
        idxb = aux_ref[1:2, cols]

        # ---- gather body columns via one-hot matmuls ----
        A = jnp.zeros((8, LANES), jnp.float32)
        B = jnp.zeros((8, LANES), jnp.float32)
        for bt in range(n_body_tiles):
            vt = velw_out[:, bt * LANES:(bt + 1) * LANES]          # [8,128]
            oha = (brow + bt * LANES == idxa).astype(jnp.float32)  # [128b,128q]
            ohb = (brow + bt * LANES == idxb).astype(jnp.float32)
            A = A + jnp.dot(vt, oha, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
            B = B + jnp.dot(vt, ohb, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)

        va, wa, ima = A[0:3], A[3:6], A[6:7]
        vb, wb, imb = B[0:3], B[3:6], B[6:7]
        va0, wa0, vb0, wb0 = va, wa, vb, wb

        cn = con_ref[0:3, cols]
        t1 = con_ref[3:6, cols]
        t2 = con_ref[6:9, cols]
        mu = con_ref[9:10, cols]
        relax = con_ref[10:11, cols] * live

        acc_tile = acc_out[:, cols]                                # [16,128]
        new_n_rows, new_t1_rows, new_t2_rows = [], [], []

        for p in range(CONTACT_POINTS):
            b0 = _PT0 + _PT * p
            ra = con_ref[b0:b0 + 3, cols]
            rb = con_ref[b0 + 3:b0 + 6, cols]
            jna = con_ref[b0 + 6:b0 + 9, cols]
            jnb = con_ref[b0 + 9:b0 + 12, cols]
            jt1a = con_ref[b0 + 12:b0 + 15, cols]
            jt1b = con_ref[b0 + 15:b0 + 18, cols]
            jt2a = con_ref[b0 + 18:b0 + 21, cols]
            jt2b = con_ref[b0 + 21:b0 + 24, cols]
            mn = con_ref[b0 + 24:b0 + 25, cols]
            mt1 = con_ref[b0 + 25:b0 + 26, cols]
            mt2 = con_ref[b0 + 26:b0 + 27, cols]
            bias = con_ref[b0 + 27:b0 + 28, cols]

            vrel = vb + _cross3(wb, rb) - va - _cross3(wa, ra)     # [3,128]

            an = acc_tile[p:p + 1]
            at1 = acc_tile[4 + p:5 + p]
            at2 = acc_tile[8 + p:9 + p]

            vn = jnp.sum(vrel * cn, axis=0, keepdims=True)
            dln = (bias - vn) * mn
            dln = relax * (jnp.maximum(an + dln, 0.0) - an)

            bound = mu * (an + dln)
            vt1 = jnp.sum(vrel * t1, axis=0, keepdims=True)
            dlt1 = relax * (jnp.clip(at1 - vt1 * mt1, -bound, bound) - at1)
            vt2 = jnp.sum(vrel * t2, axis=0, keepdims=True)
            dlt2 = relax * (jnp.clip(at2 - vt2 * mt2, -bound, bound) - at2)

            P = dln * cn + dlt1 * t1 + dlt2 * t2                   # [3,128]
            va = va - P * ima
            vb = vb + P * imb
            wa = wa - (dln * jna + dlt1 * jt1a + dlt2 * jt2a)
            wb = wb + (dln * jnb + dlt1 * jt1b + dlt2 * jt2b)

            new_n_rows.append(an + dln)
            new_t1_rows.append(at1 + dlt1)
            new_t2_rows.append(at2 + dlt2)

        acc_out[:, cols] = jnp.concatenate(
            new_n_rows + new_t1_rows + new_t2_rows
            + [jnp.zeros((4, LANES), jnp.float32)], axis=0)

        dA = jnp.concatenate([va - va0, wa - wa0, jnp.zeros((2, LANES))], 0)
        dB = jnp.concatenate([vb - vb0, wb - wb0, jnp.zeros((2, LANES))], 0)
        dA = dA * live
        dB = dB * live

        # ---- scatter via one-hot matmuls (conflict-free within a color) ----
        for bt in range(n_body_tiles):
            oha = (brow + bt * LANES == idxa).astype(jnp.float32)  # [128b,128q]
            ohb = (brow + bt * LANES == idxb).astype(jnp.float32)
            upd = (
                jax.lax.dot_general(
                    dA, oha, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                + jax.lax.dot_general(
                    dB, ohb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            )
            velw_out[:, bt * LANES:(bt + 1) * LANES] = (
                velw_out[:, bt * LANES:(bt + 1) * LANES] + upd
            )
        return (cs, ce)

    def color_body(c, _):
        cs = starts_ref[c]
        ce = starts_ref[c + 1]
        t0 = cs // LANES
        t1_ = (ce + LANES - 1) // LANES
        jax.lax.fori_loop(t0, t1_, tile_body, (cs, ce))
        return 0

    def iter_body(i, _):
        jax.lax.fori_loop(0, n_colors, color_body, 0)
        return 0

    # copy aliased inputs happens automatically via input_output_aliases
    jax.lax.fori_loop(0, iters, iter_body, 0)


def solve_pallas(bodies: Bodies, con, acc, cfg: SimConfig, interpret: bool = False):
    """Drop-in replacement for solver.solve() using the mega-kernel."""
    m = con.color.shape[0]
    velw, cf, aux, af, starts, perm = pack_solver_inputs(bodies, con, acc, cfg)
    npad = velw.shape[1]
    mpad = cf.shape[1]
    # starts gets n_colors appended at [max_colors+1]
    starts_full = jnp.concatenate([
        starts, jnp.maximum(con.n_colors, 0)[None].astype(jnp.int32)
    ])

    kernel = partial(
        _solve_kernel,
        iters=cfg.solver_iters,
        n_colors_cap=cfg.max_colors,
        n_body_tiles=npad // LANES,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # velw
            pl.BlockSpec(memory_space=pltpu.VMEM),   # con
            pl.BlockSpec(memory_space=pltpu.VMEM),   # aux
            pl.BlockSpec(memory_space=pltpu.VMEM),   # acc
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
    )
    velw_out, acc_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, npad), jnp.float32),
            jax.ShapeDtypeStruct((16, mpad), jnp.float32),
        ],
        input_output_aliases={1: 0, 4: 1},  # velw->out0, acc->out1
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(starts_full, velw, cf, aux, af)

    return unpack_solver_outputs(bodies, velw_out, acc_out, perm, m)


def kernel_fits(cfg: SimConfig, n_bodies: int) -> bool:
    """VMEM feasibility estimate for the mega-kernel."""
    npad = _rup(max(n_bodies, LANES), LANES)
    mpad = _rup(max(cfg.max_manifolds, LANES), LANES)
    vmem = (
        8 * npad * 4 * 2          # velw in+out
        + CON_ROWS * mpad * 4     # constraints
        + 8 * mpad * 4            # aux
        + 16 * mpad * 4 * 2       # acc in+out
    )
    return vmem < 10 * 1024 * 1024 and npad <= 4096
