"""Pallas TPU mega-kernel for the impulse solve (SURVEY §7 M5).

The XLA-level solve launches ~30 small ops per color pass; with ~20
iterations x ~10 colors that is thousands of dispatches per step and per-op
overhead dominates (measured ~650us/pass on v5e for tiny arrays). This kernel
runs the ENTIRE iterated solve in one `pallas_call`:

  - body momentum lives in VMEM as a component-major table `velw[8, Npad]`
    (rows vx,vy,vz,wx,wy,wz,inv_mass,pad) for the whole solve — zero HBM
    traffic for velocities in the hot loop;
  - manifolds are processed in GROUPS of SUB=8 128-lane tiles: every row of
    per-manifold math is shaped [k, 8, 128], so the VPU runs at full (8,128)
    vreg occupancy instead of the 1/8 sub-lane utilization of [1,128] rows
    (round-1 bottleneck, docs/PERF_NOTES.md item 1);
  - constraints are packed into one f32 tensor `con[128, G*8, 128]` (lane =
    manifold, middle dim = sub-tile, row layout below), color-sorted AND
    padded so every 1024-manifold group belongs to a single color; the
    pallas grid (iters, groups) streams con blocks through VMEM with
    automatic double buffering, so M is bounded by HBM, not VMEM;
  - gather/scatter of body columns uses one-hot MXU matmuls per 128-lane
    body tile (one [8,128]x[128,128] dot per sub-tile) at HIGHEST precision
    (one-hot f32 contraction is exact, so results match the XLA path
    bitwise). Each group only sweeps the body tiles in its [tmin, tmax)
    window — precomputed from its body-index span, tight when body numbering
    is spatially coherent (scene builders emit grid order) — and a per-group
    membership bitmask skips untouched tiles inside the window;
  - groups whose window is empty (color padding, invalid/parked manifolds)
    skip ALL compute, so solve cost scales with live manifolds, not the
    static capacity — load-bearing for sleeping scenes;
  - the <=4 points of a manifold are solved sequentially in registers
    (block Gauss-Seidel, same math as solver.py);
  - grid dimensions are marked "arbitrary" so steps execute in order:
    sequential colors = Gauss-Seidel sweeps, exactly like the reference's
    batch ordering (SURVEY C10/C11).

Row layout of `con` (P = CONTACT_POINTS = 4):
  0:3 n | 3:6 t1 | 6:9 t2 | 9 mu | 10 relax
  11 + 28*p + [0:3 ra | 3:6 rb | 6:9 jna | 9:12 jnb | 12:15 jt1a | 15:18 jt1b
               | 18:21 jt2a | 21:24 jt2b | 24 mn | 25 mt1 | 26 mt2 | 27 bias]
Rows 123/124/125 carry idx_a / idx_b / live as f32 (indices < 2^24 are
f32-exact), so the whole streamed payload is one tensor.

Accumulators `acc` are VMEM-resident as f32[96, G*128]: row q*8+s holds
quantity q (q = p for lam_n, 4+p for lam_t1, 8+p for lam_t2) of sub-tile s;
column g*128+l is lane l of group g. This (q,s)-row / group-major-lane
layout lets the kernel slice a group's accumulators with a dynamic *lane*
offset only (dynamic sublane offsets do not lower in Mosaic). velw and acc
stay fully VMEM-resident — only `con` streams per group. Outputs are
explicitly seeded from the input refs on the first grid step (never read
through alias seeding — see _solve_kernel._init and solve_packed's alias
docstring).
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
SUB = 8                 # manifold tiles per group ([8,128] vreg packing)


def _dot_precision():
    """MXU pass count for the one-hot gather/scatter contractions.

    HIGHEST (6 bf16 passes) is bitwise-exact and the default — the solve
    kernel's throughput ceiling is exactly these passes (roofline r5: the
    dots run AT the shape-capped f32-HI MXU limit). NUDGE_DOT_PRECISION=
    high|default trades exactness for fewer passes (measured one-hot gather
    error: HIGH ~1.5e-5 rel — the 3-pass algorithm drops the third bf16
    limb of the f32 side; DEFAULT ~4e-3 rel; scripts/precision_probe.py).
    Experimental knob for perf A/Bs, not a supported fidelity mode."""
    import os

    name = os.environ.get("NUDGE_DOT_PRECISION", "highest").upper()
    return getattr(jax.lax.Precision, name)
GROUP = SUB * LANES     # manifolds per grid step
CON_ROWS = 132          # 11 + 28*4 = 123 + idx/live + 4 pos_bias, padded
ACC_ROWS = 12           # 4 lam_n + 4 lam_t1 + 4 lam_t2
_PT = 28                # rows per point
_PT0 = 11               # first point row
_PB0 = 126              # pos_bias row of point p = _PB0 + p (split impulse)
_IDX_SENT = 1 << 28     # "dead lane" body index sentinel


def vel_rows(cfg: SimConfig) -> int:
    """velw table rows: 0:3 v | 3:6 w | 6 inv_mass | 7 pad, plus a pseudo
    channel 8:11 pv | 11:14 pw | 14:16 pad under split impulse."""
    return 16 if cfg.split_impulse else 8


def _rup(x, m):
    return -(-x // m) * m


def padded_groups(cfg: SimConfig) -> int:
    """Static padded group count: every color segment padded to a GROUP
    multiple, plus one trailing segment for invalid manifolds."""
    base = _rup(max(cfg.max_manifolds, GROUP), GROUP) // GROUP
    return base + cfg.max_colors + 1


def padded_tiles(cfg: SimConfig) -> int:
    """Padded 128-manifold tile count (= padded_groups * SUB)."""
    return padded_groups(cfg) * SUB


# ---------------------------------------------------------------------------
# packing (XLA side)
# ---------------------------------------------------------------------------

def spatial_subkey(body_a, body_b, dyn_a, dyn_b):
    """Within-color ordering key: the smallest DYNAMIC body id of the
    manifold. Static sides are excluded both here and from the gather
    windows — a static body's velocity/inv-mass gather is exactly zero and
    every term involving it carries its zero inverse inertia, so the kernels
    never need its tile. Sorting by the dynamic body id keeps each group's
    window over a narrow band of body tiles (ground contacts would otherwise
    pin every window to body tile 0)."""
    big = jnp.int32((1 << 24) - 1)
    return jnp.minimum(jnp.minimum(
        jnp.where(dyn_a, body_a, big), jnp.where(dyn_b, body_b, big)), big)


def color_sorted_slots(color, sub_key, m: int, cfg: SimConfig):
    """Group-padded color-sorted slot of every manifold (groups single-color,
    ordered by `sub_key` within a color). Returns (slot i32[M], mpad)."""
    mpad = padded_groups(cfg) * GROUP
    color = jnp.minimum(color, cfg.max_colors)  # invalid -> last segment
    key = color * jnp.int32(1 << 24) + sub_key
    order = jnp.argsort(key, stable=True)
    sc = color[order]
    starts = jnp.searchsorted(
        sc, jnp.arange(cfg.max_colors + 1, dtype=jnp.int32)).astype(jnp.int32)
    ends = jnp.concatenate([starts[1:], jnp.full((1,), m, jnp.int32)])
    sizes = ends - starts
    pstart = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(_rup(sizes, GROUP))[:-1].astype(jnp.int32),
    ])
    rank = jnp.arange(m, dtype=jnp.int32) - starts[sc]
    slot_sorted = pstart[sc] + rank
    slot = jnp.zeros((m,), jnp.int32).at[order].set(slot_sorted)
    return slot, mpad


WORD_BITS = 16          # membership bits per i32 word (kept positive)


def window_words(n_body_tiles: int) -> int:
    return -(-n_body_tiles // WORD_BITS)


def dynamic_windows(slot, valid, body_a, body_b, dyn_a, dyn_b, mpad,
                    n_body_tiles, group: int = GROUP):
    """Per-GROUP gather windows over DYNAMIC sides only (see
    spatial_subkey). Returns (tmin, tmax, bits):

      tmin/tmax i32[n_groups] — contiguous [tmin, tmax) body-tile bounds;
      bits i32[n_groups * W]  — per-group membership bitmask (WORD_BITS body
        tiles per word), letting the kernel loop skip body tiles none of the
        group's manifolds touch. Skewed color sizes make the contiguous range
        much wider than the member set on settled piles, so the skip is the
        difference between sweeping the pile and sweeping the neighborhood.
        Empty groups get tmin == tmax, which the kernels use to skip the
        whole group."""
    n_groups = mpad // group
    wlo = jnp.minimum(jnp.where(valid & dyn_a, body_a, 2 ** 30),
                      jnp.where(valid & dyn_b, body_b, 2 ** 30)) // LANES
    whi = jnp.maximum(jnp.where(valid & dyn_a, body_a, -1),
                      jnp.where(valid & dyn_b, body_b, -1)) // LANES
    wlo_pad = jnp.full((mpad,), 2 ** 30, jnp.int32).at[slot].set(
        wlo.astype(jnp.int32))
    whi_pad = jnp.full((mpad,), -1, jnp.int32).at[slot].set(
        whi.astype(jnp.int32))
    tmin = jnp.minimum(wlo_pad.reshape(n_groups, group).min(axis=1),
                       n_body_tiles).astype(jnp.int32)
    tmax = jnp.clip(whi_pad.reshape(n_groups, group).max(axis=1) + 1,
                    0, n_body_tiles).astype(jnp.int32)

    w = window_words(n_body_tiles)
    grp_of = slot // group
    dense = jnp.zeros((n_groups, w * WORD_BITS), jnp.int32)
    bta = jnp.clip(body_a // LANES, 0, n_body_tiles - 1)
    btb = jnp.clip(body_b // LANES, 0, n_body_tiles - 1)
    dense = dense.at[grp_of, bta].max((valid & dyn_a).astype(jnp.int32))
    dense = dense.at[grp_of, btb].max((valid & dyn_b).astype(jnp.int32))
    weights = (jnp.int32(1) << jnp.arange(WORD_BITS, dtype=jnp.int32))
    bits = jnp.sum(dense.reshape(n_groups, w, WORD_BITS) * weights, axis=-1)
    return tmin, jnp.maximum(tmax, tmin), bits.reshape(-1).astype(jnp.int32)


def acc_to_kernel_layout(af12, cfg: SimConfig, rows: int = ACC_ROWS):
    """[rows, mpad] (lane = slot) -> [rows*SUB, n_groups*LANES]
    (row = q*SUB + s, lane = g*LANES + l for slot = (g*SUB+s)*LANES+l)."""
    n_groups = padded_groups(cfg)
    return (af12.reshape(rows, n_groups, SUB, LANES)
            .transpose(0, 2, 1, 3)
            .reshape(rows * SUB, n_groups * LANES))


def acc_from_kernel_layout(acc_k, cfg: SimConfig, rows: int = ACC_ROWS):
    """Inverse of acc_to_kernel_layout: -> [rows, mpad]."""
    n_groups = padded_groups(cfg)
    return (acc_k.reshape(rows, SUB, n_groups, LANES)
            .transpose(0, 2, 1, 3)
            .reshape(rows, n_groups * GROUP))


def pack_solver_inputs(bodies: Bodies, con, acc, cfg: SimConfig):
    """Color-sort manifolds and scatter them into a group-padded layout where
    each 1024-wide group holds manifolds of a single color.

    Returns (velw, conf, accf, (tmin, tmax, bits), slot)."""
    n = bodies.pos.shape[0]
    m = con.color.shape[0]
    npad = _rup(max(n, LANES), LANES)
    mpad = padded_groups(cfg) * GROUP

    velw = jnp.zeros((vel_rows(cfg), npad), jnp.float32)
    velw = velw.at[0:3, :n].set(bodies.vel.T)
    velw = velw.at[3:6, :n].set(bodies.angvel.T)
    velw = velw.at[6, :n].set(bodies.inv_mass)

    dyn_a = con.im_a > 0.0
    dyn_b = con.im_b > 0.0
    slot, _ = color_sorted_slots(
        con.color, spatial_subkey(con.body_a, con.body_b, dyn_a, dyn_b),
        m, cfg)

    def put(buf, row, x, fill=0.0):
        y = jnp.full((mpad,) + x.shape[1:], fill, x.dtype)
        y = y.at[slot].set(x)
        if y.ndim == 1:
            return buf.at[row].set(y)
        return buf.at[row:row + y.shape[1]].set(y.T)

    cf = jnp.zeros((CON_ROWS, mpad), jnp.float32)
    cf = put(cf, 0, con.n)
    cf = put(cf, 3, con.t1)
    cf = put(cf, 6, con.t2)
    cf = put(cf, 9, con.mu)
    cf = put(cf, 10, jnp.where(con.valid, con.relax, 0.0))
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
        pm = pv[:, p]
        cf = put(cf, b + 24, jnp.where(pm, con.mn[:, p], 0.0))
        cf = put(cf, b + 25, jnp.where(pm, con.mt1[:, p], 0.0))
        cf = put(cf, b + 26, jnp.where(pm, con.mt2[:, p], 0.0))
        cf = put(cf, b + 27, jnp.where(pm, con.bias[:, p], 0.0))

    live = jnp.zeros((mpad,), jnp.int32).at[slot].set(
        con.valid.astype(jnp.int32))
    ia = jnp.full((mpad,), _IDX_SENT, jnp.int32).at[slot].set(
        jnp.where(con.valid, con.body_a, _IDX_SENT))
    ib = jnp.full((mpad,), _IDX_SENT, jnp.int32).at[slot].set(
        jnp.where(con.valid, con.body_b, _IDX_SENT))
    ia = jnp.where(live > 0, ia, _IDX_SENT)
    ib = jnp.where(live > 0, ib, _IDX_SENT)
    cf = cf.at[123].set(ia.astype(jnp.float32))
    cf = cf.at[124].set(ib.astype(jnp.float32))
    cf = cf.at[125].set(live.astype(jnp.float32))
    for p in range(CONTACT_POINTS):
        cf = put(cf, _PB0 + p,
                 jnp.where(pv[:, p], con.pos_bias[:, p], 0.0))

    acc_n, acc_t1, acc_t2 = acc
    af = jnp.zeros((ACC_ROWS, mpad), jnp.float32)
    af = put(af, 0, acc_n)
    af = put(af, 4, acc_t1)
    af = put(af, 8, acc_t2)

    if cfg.split_impulse:
        afp = jnp.zeros((CONTACT_POINTS, mpad), jnp.float32)
        afp = put(afp, 0, jnp.where(con.point_valid, con.pwarm, 0.0))
    else:
        afp = None

    # per-group body-tile windows over dynamic sides only
    win = dynamic_windows(slot, con.valid, con.body_a, con.body_b,
                          dyn_a, dyn_b, mpad, npad // LANES)

    return velw, cf, af, afp, win, slot


def unpack_solver_outputs(bodies: Bodies, velw, accf, slot, m, paccf=None):
    n = bodies.pos.shape[0]
    acc_n = accf[0:4, :].T[slot]
    acc_t1 = accf[4:8, :].T[slot]
    acc_t2 = accf[8:12, :].T[slot]
    bodies = bodies.replace(vel=velw[0:3, :n].T, angvel=velw[3:6, :n].T)
    if velw.shape[0] >= 16:
        pseudo = (velw[8:11, :n].T, velw[11:14, :n].T)
    else:
        z = jnp.zeros_like(bodies.vel)
        pseudo = (z, z)
    if paccf is not None:
        pseudo_acc = paccf[0:CONTACT_POINTS, :].T[slot]
    else:
        pseudo_acc = jnp.zeros_like(acc_n)
    return bodies, (acc_n, acc_t1, acc_t2), pseudo, pseudo_acc


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _cross3(a, b):
    """Cross product of [3,SUB,128] row stacks."""
    ax, ay, az = a[0:1], a[1:2], a[2:3]
    bx, by, bz = b[0:1], b[1:2], b[2:3]
    return jnp.concatenate(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=0
    )


def _solve_kernel(tmin_ref, tmax_ref, bits_ref, velw_ref, con_ref, acc_ref,
                  *rest, w_words, split, pfric):
    if split:
        pacc_ref, velw_out, acc_out, pacc, gA, gB = rest
    else:
        velw_out, acc_out, gA, gB = rest
    i = pl.program_id(0)
    t = pl.program_id(1)

    # seed the resident outputs from the inputs on the first grid step; with
    # input_output_aliases this is a redundant same-value copy, without it
    # (alias=False, see solve_packed) it is the required initialization.
    # pacc (pseudo-impulse accumulators, split impulse) is a resident
    # output seeded from the cache-warmed pacc_ref; the converged values
    # feed next frame's warm start through the contact cache.
    @pl.when((i == 0) & (t == 0))
    def _init():
        velw_out[:, :] = velw_ref[:, :]
        acc_out[:, :] = acc_ref[:, :]
        if split:
            pacc[:, :] = pacc_ref[:, :]

    bt0 = tmin_ref[t]
    bt1 = tmax_ref[t]

    # empty window <=> no valid manifold in the group (color padding /
    # invalid / parked): skip everything — the seeded acc stays correct
    @pl.when(bt1 > bt0)
    def _group():
        brow = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0
                                        ).astype(jnp.float32)
        hp = _dot_precision()

        live = (con_ref[125:126, :, :] > 0.5).astype(jnp.float32)  # [1,S,L]
        cols_g = pl.ds(t * LANES, LANES)

        def member(bt):
            """Does this group touch body tile bt? (bits skip, see
            dynamic_windows)."""
            word = bits_ref[t * w_words + bt // WORD_BITS]
            return ((word >> (bt % WORD_BITS)) & 1) > 0

        vrows = 16 if split else 8
        # ---- gather body columns (windowed one-hot matmuls, per sub-tile) --
        gA[:, :, :] = jnp.zeros((vrows, SUB, LANES), jnp.float32)
        gB[:, :, :] = jnp.zeros((vrows, SUB, LANES), jnp.float32)

        def gather_bt(bt, _):
            @pl.when(member(bt))
            def _():
                cols = pl.ds(bt * LANES, LANES)
                vt = velw_out[:, cols]
                for s in range(SUB):
                    ia_s = con_ref[123:124, s, :]          # [1,128] f32 ids
                    ib_s = con_ref[124:125, s, :]
                    oha = (brow + bt * LANES == ia_s).astype(jnp.float32)
                    ohb = (brow + bt * LANES == ib_s).astype(jnp.float32)
                    gA[:, s, :] = gA[:, s, :] + jnp.dot(
                        vt, oha, preferred_element_type=jnp.float32,
                        precision=hp)
                    gB[:, s, :] = gB[:, s, :] + jnp.dot(
                        vt, ohb, preferred_element_type=jnp.float32,
                        precision=hp)
            return 0

        jax.lax.fori_loop(bt0, bt1, gather_bt, 0)
        A = gA[:, :, :]
        B = gB[:, :, :]

        va, wa, ima = A[0:3], A[3:6], A[6:7]
        vb, wb, imb = B[0:3], B[3:6], B[6:7]
        va0, wa0, vb0, wb0 = va, wa, vb, wb
        if split:
            pva, pwa = A[8:11], A[11:14]
            pvb, pwb = B[8:11], B[11:14]
            pva0, pwa0, pvb0, pwb0 = pva, pwa, pvb, pwb

        cn = con_ref[0:3, :, :]
        t1 = con_ref[3:6, :, :]
        t2 = con_ref[6:9, :, :]
        mu = con_ref[9:10, :, :]
        relax = con_ref[10:11, :, :] * live

        acc_blk = acc_out[:, cols_g]                       # [96,128]
        if split:
            pacc_blk = pacc[:, cols_g]                     # [32,128]

        for p in range(CONTACT_POINTS):
            b0 = _PT0 + _PT * p
            ra = con_ref[b0:b0 + 3, :, :]
            rb = con_ref[b0 + 3:b0 + 6, :, :]
            jna = con_ref[b0 + 6:b0 + 9, :, :]
            jnb = con_ref[b0 + 9:b0 + 12, :, :]
            jt1a = con_ref[b0 + 12:b0 + 15, :, :]
            jt1b = con_ref[b0 + 15:b0 + 18, :, :]
            jt2a = con_ref[b0 + 18:b0 + 21, :, :]
            jt2b = con_ref[b0 + 21:b0 + 24, :, :]
            mn = con_ref[b0 + 24:b0 + 25, :, :]
            mt1 = con_ref[b0 + 25:b0 + 26, :, :]
            mt2 = con_ref[b0 + 26:b0 + 27, :, :]
            bias = con_ref[b0 + 27:b0 + 28, :, :]

            vrel = vb + _cross3(wb, rb) - va - _cross3(wa, ra)

            an = acc_blk[p * SUB:(p + 1) * SUB].reshape(1, SUB, LANES)
            at1 = acc_blk[(4 + p) * SUB:(5 + p) * SUB].reshape(1, SUB, LANES)
            at2 = acc_blk[(8 + p) * SUB:(9 + p) * SUB].reshape(1, SUB, LANES)

            vn = jnp.sum(vrel * cn, axis=0, keepdims=True)
            dln = (bias - vn) * mn
            dln = relax * (jnp.maximum(an + dln, 0.0) - an)

            if pfric:
                pp_b = pacc_blk[p * SUB:(p + 1) * SUB].reshape(1, SUB, LANES)
                bound = mu * (an + dln + pp_b)
            else:
                bound = mu * (an + dln)
            vt1 = jnp.sum(vrel * t1, axis=0, keepdims=True)
            dlt1 = relax * (jnp.clip(at1 - vt1 * mt1, -bound, bound) - at1)
            vt2 = jnp.sum(vrel * t2, axis=0, keepdims=True)
            dlt2 = relax * (jnp.clip(at2 - vt2 * mt2, -bound, bound) - at2)

            P = dln * cn + dlt1 * t1 + dlt2 * t2
            va = va - P * ima
            vb = vb + P * imb
            wa = wa - (dln * jna + dlt1 * jt1a + dlt2 * jt2a)
            wb = wb + (dln * jnb + dlt1 * jt1b + dlt2 * jt2b)

            acc_out[p * SUB:(p + 1) * SUB, cols_g] = (
                (an + dln).reshape(SUB, LANES))
            acc_out[(4 + p) * SUB:(5 + p) * SUB, cols_g] = (
                (at1 + dlt1).reshape(SUB, LANES))
            acc_out[(8 + p) * SUB:(9 + p) * SUB, cols_g] = (
                (at2 + dlt2).reshape(SUB, LANES))

            if split:
                pbias = con_ref[_PB0 + p:_PB0 + p + 1, :, :]
                pvrel = pvb + _cross3(pwb, rb) - pva - _cross3(pwa, ra)
                pvn = jnp.sum(pvrel * cn, axis=0, keepdims=True)
                pp = pacc_blk[p * SUB:(p + 1) * SUB].reshape(1, SUB, LANES)
                dlp = (pbias - pvn) * mn
                dlp = relax * (jnp.maximum(pp + dlp, 0.0) - pp)
                pacc[p * SUB:(p + 1) * SUB, cols_g] = (
                    (pp + dlp).reshape(SUB, LANES))
                Pp = dlp * cn
                pva = pva - Pp * ima
                pvb = pvb + Pp * imb
                pwa = pwa - dlp * jna
                pwb = pwb + dlp * jnb

        if split:
            dA = jnp.concatenate(
                [va - va0, wa - wa0, jnp.zeros((2, SUB, LANES)),
                 pva - pva0, pwa - pwa0, jnp.zeros((2, SUB, LANES))],
                0) * live
            dB = jnp.concatenate(
                [vb - vb0, wb - wb0, jnp.zeros((2, SUB, LANES)),
                 pvb - pvb0, pwb - pwb0, jnp.zeros((2, SUB, LANES))],
                0) * live
        else:
            dA = jnp.concatenate(
                [va - va0, wa - wa0, jnp.zeros((2, SUB, LANES))], 0) * live
            dB = jnp.concatenate(
                [vb - vb0, wb - wb0, jnp.zeros((2, SUB, LANES))], 0) * live

        # ---- scatter (conflict-free: the group is single-color) ----
        def scatter_bt(bt, _):
            @pl.when(member(bt))
            def _():
                cols = pl.ds(bt * LANES, LANES)
                upd = jnp.zeros((vrows, LANES), jnp.float32)
                for s in range(SUB):
                    ia_s = con_ref[123:124, s, :]
                    ib_s = con_ref[124:125, s, :]
                    oha = (brow + bt * LANES == ia_s).astype(jnp.float32)
                    ohb = (brow + bt * LANES == ib_s).astype(jnp.float32)
                    upd = upd + (
                        jax.lax.dot_general(
                            dA[:, s, :], oha, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32, precision=hp)
                        + jax.lax.dot_general(
                            dB[:, s, :], ohb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32, precision=hp)
                    )
                velw_out[:, cols] = velw_out[:, cols] + upd
            return 0

        jax.lax.fori_loop(bt0, bt1, scatter_bt, 0)


def solve_packed(velw, cf, af, win, cfg: SimConfig,
                 interpret: bool = False, alias: bool = True, afp=None):
    """Run the iterated solve on pre-packed tensors (from pack_solver_inputs
    or the Pallas setup kernel). `cf`/`af` are the 2D [rows, mpad] layouts;
    the group reshapes happen here. `afp` is the warm pseudo-accumulator
    [CONTACT_POINTS, mpad] (required under split impulse). Returns
    (velw_out, acc_out[ACC_ROWS, mpad], pacc_out[CONTACT_POINTS, mpad]|None).

    `alias=False` disables the velw/acc input->output buffer aliasing. It is
    REQUIRED when velw/af are outputs of another pallas_call with no other
    consumer: XLA then aliases that custom call's output buffer straight into
    this one and the compiled program returns deterministic garbage at large
    N (20480-body pile; every kernel verified correct in isolation and when
    the buffers had a second consumer — scripts/debug_scan_chain2.py). With
    XLA-op-produced inputs (pack_solver_inputs) aliasing is safe and saves
    the copy."""
    tmin, tmax, bits = win
    split = cfg.split_impulse
    npad = velw.shape[1]
    mpad = cf.shape[1]
    n_groups = mpad // GROUP
    w_words = window_words(npad // LANES)

    cf3 = cf.reshape(CON_ROWS, n_groups * SUB, LANES)
    af_k = acc_to_kernel_layout(af, cfg)
    vrows = vel_rows(cfg)
    prow = CONTACT_POINTS * SUB

    in_specs = [
        pl.BlockSpec((vrows, npad), lambda i, t, *_: (0, 0),
                     memory_space=pltpu.VMEM),         # velw (resident)
        pl.BlockSpec((CON_ROWS, SUB, LANES), lambda i, t, *_: (0, t, 0),
                     memory_space=pltpu.VMEM),         # con group stream
        pl.BlockSpec((ACC_ROWS * SUB, n_groups * LANES),
                     lambda i, t, *_: (0, 0),
                     memory_space=pltpu.VMEM),         # acc (resident)
    ]
    out_specs = [
        pl.BlockSpec((vrows, npad), lambda i, t, *_: (0, 0),
                     memory_space=pltpu.VMEM),         # velw out
        pl.BlockSpec((ACC_ROWS * SUB, n_groups * LANES),
                     lambda i, t, *_: (0, 0),
                     memory_space=pltpu.VMEM),         # acc out
    ]
    out_shape = [
        jax.ShapeDtypeStruct(velw.shape, jnp.float32),
        jax.ShapeDtypeStruct(af_k.shape, jnp.float32),
    ]
    operands = [velw, cf3, af_k]
    # velw->out0, acc->out1 (skipped when alias=False, see docstring)
    aliases = {3: 0, 5: 1}
    if split:
        if afp is None:
            afp = jnp.zeros((CONTACT_POINTS, mpad), jnp.float32)
        afp_k = acc_to_kernel_layout(afp, cfg, rows=CONTACT_POINTS)
        in_specs.append(pl.BlockSpec((prow, n_groups * LANES),
                                     lambda i, t, *_: (0, 0),
                                     memory_space=pltpu.VMEM))
        out_specs.append(pl.BlockSpec((prow, n_groups * LANES),
                                      lambda i, t, *_: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct(afp_k.shape, jnp.float32))
        operands.append(afp_k)
        aliases[6] = 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(cfg.solver_iters, n_groups),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((vrows, SUB, LANES), jnp.float32),  # gather A
            pltpu.VMEM((vrows, SUB, LANES), jnp.float32),  # gather B
        ],
    )
    outs = pl.pallas_call(
        partial(_solve_kernel, w_words=w_words, split=split,
                pfric=split and cfg.pseudo_friction),
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases if alias else {},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(tmin, tmax, bits, *operands)
    pacc_out = (acc_from_kernel_layout(outs[2], cfg, rows=CONTACT_POINTS)
                if split else None)
    return outs[0], acc_from_kernel_layout(outs[1], cfg), pacc_out


def solve_pallas(bodies: Bodies, con, acc, cfg: SimConfig,
                 interpret: bool = False):
    """Drop-in replacement for solver.solve() using the mega-kernel.
    Returns (bodies, acc, (pseudo_vel, pseudo_angvel), pseudo_acc) like
    solver.solve."""
    m = con.color.shape[0]
    velw, cf, af, afp, win, slot = pack_solver_inputs(
        bodies, con, acc, cfg)
    if cfg.split_impulse:
        # seed the pseudo-velocity channel to match the warm pacc (the XLA
        # path does this inside solve(); the kernel starts from velw rows)
        pacc0 = jnp.where(con.point_valid, con.pwarm, 0.0)
        Pp = jnp.sum(pacc0, 1)[:, None] * con.n
        pdw_a = jnp.sum(pacc0[..., None] * con.jna, axis=1)
        pdw_b = jnp.sum(pacc0[..., None] * con.jnb, axis=1)
        n = bodies.pos.shape[0]
        z = jnp.zeros((n, 3), jnp.float32)
        pvel0 = (z.at[con.body_a].add(-Pp * con.im_a[:, None])
                 .at[con.body_b].add(Pp * con.im_b[:, None]))
        pang0 = z.at[con.body_a].add(-pdw_a).at[con.body_b].add(pdw_b)
        velw = velw.at[8:11, :n].set(pvel0.T).at[11:14, :n].set(pang0.T)
    velw_out, acc_out, pacc_out = solve_packed(velw, cf, af, win, cfg,
                                               interpret=interpret, afp=afp)
    return unpack_solver_outputs(bodies, velw_out, acc_out, slot, m,
                                 paccf=pacc_out)


def kernel_fits(cfg: SimConfig, n_bodies: int) -> bool:
    """VMEM feasibility: resident body table + resident accumulators +
    streamed constraint group buffers. `con` itself is HBM-bound."""
    npad = _rup(max(n_bodies, LANES), LANES)
    mpad = padded_groups(cfg) * GROUP
    # two separate pallas calls, each must fit in the ~16MB VMEM. The fused
    # path always runs with alias=False (chained aliasing corrupts — see
    # module hazards), so input AND output buffers are simultaneously
    # resident: solve holds velw in+out (2x8 rows) plus acc in+out
    # (2xACC_ROWS rows of mpad); setup holds velw in+out plus the body table.
    from .setup_kernel import body_rows
    body_tbl_rows = body_rows(cfg)
    vr = vel_rows(cfg)
    # pseudo accumulators (split impulse) are a second resident in+out pair
    acc_rows_eff = ACC_ROWS + (4 if cfg.split_impulse else 0)
    resident = (2 * vr * npad * 4
                + max(2 * acc_rows_eff * mpad,
                      (vr + body_tbl_rows) * npad) * 4)
    buffers = 2 * CON_ROWS * GROUP * 4   # double-buffered con group stream
    return (resident + buffers) < _vmem_budget_bytes()


def _vmem_budget_bytes() -> int:
    """Per-chip budget for simultaneously-resident Pallas buffers.

    TPU v5 lite holds 120MB without complaint (measured 2026-08-19,
    scripts/vmem_probe.py: 60MB in + 60MB out copies run fine; the generic
    "~16MB/core" guide figure is wrong for v5e — its VMEM is backed by a
    128MB scratch window). Budget 96MB there, leaving >24MB for Mosaic
    temporaries/spills; a 12MB bound would cap max_manifolds at ~2 per body
    at n=20480, BELOW the ~3.2/body a settled dense pile needs, so the
    capacity-tuned bench would overflow and drop load-bearing contacts.

    Chips the probe has NOT blessed get the conservative 12MB floor
    (ADVICE r3: on a ~16MB-VMEM generation the 96MB budget would turn the
    graceful XLA fallback into a Mosaic compile failure at runtime).
    Override with NUDGE_VMEM_BUDGET_MB after probing a new chip."""
    import os

    env = os.environ.get("NUDGE_VMEM_BUDGET_MB")
    if env:
        return int(float(env) * 1024 * 1024)
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:                                  # noqa: BLE001
        kind = ""
    if "v5 lite" in kind or "v5e" in kind:
        return 96 * 1024 * 1024
    return 12 * 1024 * 1024
