"""Pallas TPU kernel for box-box narrowphase (SURVEY C6 — the reference's
largest component, `nudge.cpp` SAT + clipping).

The vmapped jnp `narrowphase.box_box` compiles to an HBM-bound program: XLA
materializes the [P,24,*] candidate intermediates and re-reads them per
consumer (~107 GB accessed per call at 82k pairs, arithmetic intensity 0.004
— measured on v5e). This kernel runs the identical math per 128-pair tile
with every intermediate in registers:

  - collider data (half extents, quat, pos, friction, body) is gathered from
    a resident table with the same windowed one-hot MXU matmuls + membership
    bitmask as the solver kernel (pairs come out of the grid in collider-id
    order, so windows are narrow);
  - lane variables are [1,128] rows; per-lane 3x3 matrices are Python-level
    3x3 tuples of rows; dynamic per-lane axis indexing (axis/u/v/w/b_axis of
    the reference's face-case math) becomes 3-way selects;
  - SAT over 15 axes, the closed-form 24-candidate clip, 4-point manifold
    reduction, and the edge-edge case mirror narrowphase.box_box exactly
    (same first-max argmax tie-breaking, same epsilons, same feature ids),
    so results match the jnp path to float tolerance.

Output is a [32, ppad] row tensor consumed by contacts.narrowphase_all.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SimConfig
from .narrowphase import _ABS_EPS, _FACE_EDGE_BIAS
from .solver_kernel import (
    LANES, WORD_BITS, _rup, dynamic_windows, window_words,
)

TBL_ROWS = 16
# collider table rows: 0:3 half | 3:7 quat | 7:10 pos | 10 friction | 11 body
OUT_ROWS = 32
# output rows: 0:3 normal | 3 friction | 4 body_a | 5 body_b |
#   6:18 pos (p-major) | 18:22 depth | 22:26 feat | 26:30 point_valid |
#   30 pair_live | 31 pad
_IDX_SENT = 1 << 24      # dead-lane collider id (f32-exact)
_NEG = -1e30


def _row(x):
    return x[None, :] if x.ndim == 1 else x


# ---- row-math helpers (operate on [1,128] rows) ---------------------------

def _sel3(k, a, b, c):
    """Per-lane 3-way select by index row k in {0,1,2}."""
    return jnp.where(k == 0, a, jnp.where(k == 1, b, c))


def _sel3v(k, va, vb, vc):
    return tuple(_sel3(k, va[i], vb[i], vc[i]) for i in range(3))


def _argmax_rows(rows):
    """First-max argmax over a list of rows (mirrors jnp.argmax)."""
    best = rows[0]
    idx = jnp.zeros_like(rows[0])
    for k in range(1, len(rows)):
        take = rows[k] > best
        best = jnp.where(take, rows[k], best)
        idx = jnp.where(take, float(k), idx)
    return idx, best


def _pick(idx, rows):
    """rows[idx] per lane (idx unique within the list)."""
    out = jnp.zeros_like(rows[0])
    for k, r in enumerate(rows):
        out = out + jnp.where(idx == k, r, 0.0)
    return out


def _dot_v(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross_v(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _matvec(M, v):
    return tuple(M[i][0] * v[0] + M[i][1] * v[1] + M[i][2] * v[2]
                 for i in range(3))


def _quat_to_mat_rows(x, y, z, w):
    """mathx.quat_to_mat as a 3x3 tuple of rows."""
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return (
        (1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy)),
        (2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx)),
        (2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy)),
    )


def _box_box_rows(ha, qa, pa, hb, qb, pb):
    """narrowphase.box_box translated to [1,128]-row math. Inputs are
    3/4-tuples of rows; returns (normal(3), pos[4](3), depth[4], feat[4],
    valid[4]) with identical semantics to the vmapped jnp version."""
    Ra = _quat_to_mat_rows(*qa)
    Rb = _quat_to_mat_rows(*qb)
    # R = Ra^T Rb; t = Ra^T (pb - pa)
    d = tuple(pb[i] - pa[i] for i in range(3))
    R = tuple(tuple(sum(Ra[k][i] * Rb[k][j] for k in range(3))
                    for j in range(3)) for i in range(3))
    t = tuple(sum(Ra[k][i] * d[k] for k in range(3)) for i in range(3))
    absR = tuple(tuple(jnp.abs(R[i][j]) + _ABS_EPS for j in range(3))
                 for i in range(3))

    # --- 6 face axes ---
    sA = [jnp.abs(t[i]) - (ha[i] + sum(absR[i][j] * hb[j] for j in range(3)))
          for i in range(3)]
    tB = [sum(R[i][j] * t[i] for i in range(3)) for j in range(3)]
    sB = [jnp.abs(tB[j]) - (sum(absR[i][j] * ha[i] for i in range(3)) + hb[j])
          for j in range(3)]
    s_face = sA + sB
    best_face, s_face_best = _argmax_rows(s_face)

    # --- 9 edge-edge axes (i, j) row-major ---
    i1 = (1, 2, 0)
    i2 = (2, 0, 1)
    s_edge = []
    for i in range(3):
        for j in range(3):
            j1, j2 = i1[j], i2[j]
            num = (
                jnp.abs(t[i2[i]] * R[i1[i]][j] - t[i1[i]] * R[i2[i]][j])
                - ha[i1[i]] * absR[i2[i]][j]
                - ha[i2[i]] * absR[i1[i]][j]
                - (hb[j1] * absR[i][j2] + hb[j2] * absR[i][j1])
            )
            L2 = R[i1[i]][j] ** 2 + R[i2[i]][j] ** 2
            L = jnp.sqrt(jnp.maximum(L2, 1e-12))
            s_edge.append(jnp.where(L2 > 1e-6, num / L, _NEG))
    best_edge, s_edge_best = _argmax_rows(s_edge)

    separated = jnp.maximum(s_face_best, s_edge_best) > 0.0
    pen_face = -s_face_best
    pen_edge = -s_edge_best
    edge_case = (pen_edge < pen_face * _FACE_EDGE_BIAS) & (s_edge_best > -1e29)

    # ------------------------------------------------------------------
    # FACE CASE
    # ------------------------------------------------------------------
    ref_is_b = best_face >= 3
    axis = best_face - jnp.where(ref_is_b, 3.0, 0.0)
    R_ri = tuple(tuple(jnp.where(ref_is_b, R[j][i], R[i][j])
                       for j in range(3)) for i in range(3))
    t_ri = tuple(jnp.where(ref_is_b, -tB[i], t[i]) for i in range(3))
    h_ref = tuple(jnp.where(ref_is_b, hb[i], ha[i]) for i in range(3))
    h_inc = tuple(jnp.where(ref_is_b, ha[i], hb[i]) for i in range(3))
    t_ri_w = _sel3(axis, *t_ri)
    nsign = jnp.where(t_ri_w >= 0.0, 1.0, -1.0)

    u = _sel3(axis, 1.0, 2.0, 0.0)
    v = _sel3(axis, 2.0, 0.0, 1.0)

    # incident face: |R_ri[w, :]| column most anti-parallel to ref normal
    Rw = tuple(_sel3(axis, R_ri[0][j], R_ri[1][j], R_ri[2][j])
               for j in range(3))
    nd = tuple(Rw[j] * nsign for j in range(3))
    b_axis, _ = _argmax_rows([jnp.abs(nd[0]), jnp.abs(nd[1]), jnp.abs(nd[2])])
    nd_b = _sel3(b_axis, *nd)
    s_inc = -jnp.sign(nd_b)
    b1 = _sel3(b_axis, 1.0, 2.0, 0.0)
    b2 = _sel3(b_axis, 2.0, 0.0, 1.0)

    h_inc_b = _sel3(b_axis, *h_inc)
    h_inc_b1 = _sel3(b1, *h_inc)
    h_inc_b2 = _sel3(b2, *h_inc)
    su = (1.0, 1.0, -1.0, -1.0)
    sv = (1.0, -1.0, -1.0, 1.0)
    pts0 = []
    for k in range(4):
        corner = tuple(
            s_inc * h_inc_b * (b_axis == c)
            + su[k] * h_inc_b1 * (b1 == c)
            + sv[k] * h_inc_b2 * (b2 == c)
            for c in range(3)
        )
        p = _matvec(R_ri, corner)
        pts0.append(tuple(p[i] + t_ri[i] for i in range(3)))

    h_u = _sel3(u, *h_ref)
    h_v = _sel3(v, *h_ref)
    h_w = _sel3(axis, *h_ref)
    qu = [_sel3(u, *pts0[k]) for k in range(4)]
    qv = [_sel3(v, *pts0[k]) for k in range(4)]
    qu_n = [qu[(k + 1) % 4] for k in range(4)]
    qv_n = [qv[(k + 1) % 4] for k in range(4)]
    eps = 1e-6

    # candidates: 24 x (u, v, w, valid)
    cand_u, cand_v, cand_w, cand_val = [], [], [], []

    # type A: incident verts inside the rect
    for k in range(4):
        cand_u.append(qu[k])
        cand_v.append(qv[k])
        cand_w.append(_sel3(axis, *pts0[k]))
        cand_val.append((jnp.abs(qu[k]) <= h_u + eps)
                        & (jnp.abs(qv[k]) <= h_v + eps))

    # type B: rect corners inside the incident quad
    cu_c = (1.0, 1.0, -1.0, -1.0)
    cv_c = (1.0, -1.0, -1.0, 1.0)
    area2 = sum(qu[l] * qv_n[l] - qu_n[l] * qv[l] for l in range(4))
    sgn = jnp.where(area2 >= 0.0, 1.0, -1.0)
    n_inc = tuple(_sel3(b_axis, R_ri[i][0], R_ri[i][1], R_ri[i][2]) * s_inc
                  for i in range(3))
    d_pl = _dot_v(n_inc, pts0[0])
    n_w = _sel3(axis, *n_inc)
    n_w_safe = jnp.where(jnp.abs(n_w) > 1e-3, n_w, 1e-3)
    n_u = _sel3(u, *n_inc)
    n_v = _sel3(v, *n_inc)
    plane_ok = jnp.abs(n_w) > 1e-3
    for k in range(4):
        cuk = cu_c[k] * h_u
        cvk = cv_c[k] * h_v
        inside = None
        for l in range(4):
            crossc = ((qu_n[l] - qu[l]) * (cvk - qv[l])
                      - (qv_n[l] - qv[l]) * (cuk - qu[l]))
            ok = sgn * crossc >= -eps
            inside = ok if inside is None else (inside & ok)
        cand_u.append(cuk)
        cand_v.append(cvk)
        cand_w.append((d_pl - n_u * cuk - n_v * cvk) / n_w_safe)
        cand_val.append(inside & plane_ok)

    # type C: 4 incident edges x 4 rect border lines
    pw = [_sel3(axis, *pts0[k]) for k in range(4)]
    pw_n = [pw[(k + 1) % 4] for k in range(4)]
    line_vals = (h_u, -h_u, h_v, -h_v)
    for k in range(4):
        for l in range(4):
            is_u = l < 2
            src = qu[k] if is_u else qv[k]
            dst = qu_n[k] if is_u else qv_n[k]
            den = dst - src
            den = jnp.where(jnp.abs(den) > 1e-9, den, 1e-9)
            tt = (line_vals[l] - src) / den
            other = qv[k] if is_u else qu[k]
            other_n = qv_n[k] if is_u else qu_n[k]
            oth = other + tt * (other_n - other)
            oth_h = h_v if is_u else h_u
            cand_u.append(qu[k] + tt * (qu_n[k] - qu[k]))
            cand_v.append(qv[k] + tt * (qv_n[k] - qv[k]))
            cand_w.append(pw[k] + tt * (pw_n[k] - pw[k]))
            cand_val.append((tt >= -eps) & (tt <= 1.0 + eps)
                            & (jnp.abs(oth) <= oth_h + eps))

    depth_all = [h_w - nsign * cand_w[c] for c in range(24)]
    valid_all = [cand_val[c] & (depth_all[c] > 0.0) for c in range(24)]

    # --- reduce 24 candidates to 4 (narrowphase._reduce_manifold) ---
    s0 = [jnp.where(valid_all[c], depth_all[c], _NEG) for c in range(24)]
    i0, _ = _argmax_rows(s0)
    v0 = valid_all[0]
    for c in range(1, 24):
        v0 = v0 | valid_all[c]
    remaining = [valid_all[c] & (i0 != c) for c in range(24)]

    u0 = _pick(i0, cand_u)
    v0c = _pick(i0, cand_v)
    d1s = [jnp.where(remaining[c],
                     (cand_u[c] - u0) ** 2 + (cand_v[c] - v0c) ** 2, _NEG)
           for c in range(24)]
    i1_, _ = _argmax_rows(d1s)
    v1 = remaining[0]
    for c in range(1, 24):
        v1 = v1 | remaining[c]
    remaining = [remaining[c] & (i1_ != c) for c in range(24)]

    e01u = _pick(i1_, cand_u) - u0
    e01v = _pick(i1_, cand_v) - v0c
    area = [e01u * (cand_v[c] - v0c) - e01v * (cand_u[c] - u0)
            for c in range(24)]
    s2 = [jnp.where(remaining[c], jnp.abs(area[c]), _NEG) for c in range(24)]
    i2_, _ = _argmax_rows(s2)
    v2 = remaining[0]
    for c in range(1, 24):
        v2 = v2 | remaining[c]
    a2 = _pick(i2_, area)
    remaining = [remaining[c] & (i2_ != c) for c in range(24)]

    s3 = [jnp.where(remaining[c], -jnp.sign(a2) * area[c], _NEG)
          for c in range(24)]
    i3_, _ = _argmax_rows(s3)
    v3 = remaining[0]
    for c in range(1, 24):
        v3 = v3 | remaining[c]

    keep_idx = [i0, i1_, i2_, i3_]
    keep_valid = [v0, v1, v2, v3]

    Rref = tuple(tuple(jnp.where(ref_is_b, Rb[i][j], Ra[i][j])
                       for j in range(3)) for i in range(3))
    pref = tuple(jnp.where(ref_is_b, pb[i], pa[i]) for i in range(3))
    n_ref_world = tuple(
        _sel3(axis, Rref[i][0], Rref[i][1], Rref[i][2]) * nsign
        for i in range(3))
    normal_f = tuple(jnp.where(ref_is_b, -n_ref_world[i], n_ref_world[i])
                     for i in range(3))

    pos_f, depth_f, feat_f, valid_f = [], [], [], []
    for r in range(4):
        cu_r = _pick(keep_idx[r], cand_u)
        cv_r = _pick(keep_idx[r], cand_v)
        cw_r = _pick(keep_idx[r], cand_w)
        # ref-frame 3D point: u/v/w components scattered back to xyz
        local = tuple(cu_r * (u == c) + cv_r * (v == c) + cw_r * (axis == c)
                      for c in range(3))
        pr = _matvec(Rref, local)
        pos_f.append(tuple(pr[i] + pref[i] for i in range(3)))
        depth_f.append(_pick(keep_idx[r], depth_all))
        feat_f.append(keep_idx[r]
                      + jnp.where(ref_is_b, 32.0, 0.0)
                      + axis * 64.0
                      + jnp.where(nsign > 0, 256.0, 0.0))
        valid_f.append(keep_valid[r] & (_pick(keep_idx[r],
                                              [va.astype(jnp.float32)
                                               for va in valid_all]) > 0.5))

    # ------------------------------------------------------------------
    # EDGE CASE
    # ------------------------------------------------------------------
    ei = jnp.floor(best_edge / 3.0)
    ej = best_edge - ei * 3.0
    e_ei = tuple((ei == c).astype(jnp.float32) for c in range(3))
    R_col_ej = tuple(_sel3(ej, R[i][0], R[i][1], R[i][2]) for i in range(3))
    ax = _cross_v(e_ei, R_col_ej)
    ax_n = jnp.sqrt(jnp.maximum(_dot_v(ax, ax), 1e-24))
    axis_a = tuple(ax[i] / ax_n for i in range(3))
    flip = jnp.where(_dot_v(axis_a, t) >= 0.0, 1.0, -1.0)
    axis_a = tuple(axis_a[i] * flip for i in range(3))

    sa = tuple(jnp.where(axis_a[c] >= 0.0, 1.0, -1.0) for c in range(3))
    c1 = tuple(sa[c] * ha[c] * (1.0 - e_ei[c]) for c in range(3))
    d1v = e_ei
    axis_b = tuple(-sum(R[i][j] * axis_a[i] for i in range(3))
                   for j in range(3))
    sb = tuple(jnp.where(axis_b[c] >= 0.0, 1.0, -1.0) for c in range(3))
    e_ej = tuple((ej == c).astype(jnp.float32) for c in range(3))
    inner = tuple(sb[j] * hb[j] * (1.0 - e_ej[j]) for j in range(3))
    Ri = _matvec(R, inner)
    c2 = tuple(Ri[i] + t[i] for i in range(3))
    d2v = R_col_ej

    r12 = tuple(c2[i] - c1[i] for i in range(3))
    b_dd = _dot_v(d1v, d2v)
    denom = jnp.maximum(1.0 - b_dd * b_dd, 1e-9)
    ha_ei = _sel3(ei, *ha)
    hb_ej = _sel3(ej, *hb)
    dr1 = _dot_v(d1v, r12)
    dr2 = _dot_v(d2v, r12)
    s_par = jnp.clip((dr1 - b_dd * dr2) / denom, -ha_ei, ha_ei)
    u_par = jnp.clip((b_dd * dr1 - dr2) / denom, -hb_ej, hb_ej)
    mid = tuple(0.5 * ((c1[i] + s_par * d1v[i]) + (c2[i] + u_par * d2v[i]))
                for i in range(3))
    pe = _matvec(Ra, mid)
    pos_e = tuple(pe[i] + pa[i] for i in range(3))
    ne = _matvec(Ra, axis_a)

    sa_i1 = _sel3(ei, sa[1], sa[2], sa[0])
    sa_i2 = _sel3(ei, sa[2], sa[0], sa[1])
    sb_i1 = _sel3(ej, sb[1], sb[2], sb[0])
    sb_i2 = _sel3(ej, sb[2], sb[0], sb[1])
    sign_bits = ((sa_i1 > 0) + 2.0 * (sa_i2 > 0)
                 + 4.0 * (sb_i1 > 0) + 8.0 * (sb_i2 > 0))
    feat_e = 1024.0 + (ei * 3.0 + ej) * 16.0 + sign_bits

    # ------------------------------------------------------------------
    # select + gate
    # ------------------------------------------------------------------
    normal = tuple(jnp.where(edge_case, ne[i], normal_f[i]) for i in range(3))
    not_sep = jnp.where(separated, 0.0, 1.0)
    pos, depth, feat, valid = [], [], [], []
    for r in range(4):
        first = 1.0 if r == 0 else 0.0
        pos.append(tuple(
            jnp.where(edge_case, pos_e[i] * first, pos_f[r][i])
            for i in range(3)))
        depth.append(jnp.where(edge_case, pen_edge * first, depth_f[r]))
        feat.append(jnp.where(edge_case, feat_e * first, feat_f[r]))
        # f32 mask rows (Mosaic cannot lower selects between i1 vectors)
        ve = jnp.where(pen_edge > 0.0, first, 0.0)
        vf = jnp.where(valid_f[r], 1.0, 0.0)
        valid.append(jnp.where(edge_case, ve, vf) * not_sep)

    return normal, pos, depth, feat, valid


def _make_np_kernel(w_words: int):
    # friction is always sqrt(fa*fb) from the per-collider table the builder
    # pre-fills (matching the jnp path); no cfg-default fallback exists here
    def kernel(tmin_ref, tmax_ref, bits_ref, tbl_ref, pair_ref, out_ref,
               gA, gB):
        t = pl.program_id(0)
        brow = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0
                                        ).astype(jnp.float32)
        hp = jax.lax.Precision.HIGHEST

        ia = pair_ref[0:1, :]
        ib = pair_ref[1:2, :]
        pair_live = pair_ref[2:3, :] > 0.5

        def member(bt):
            word = bits_ref[t * w_words + bt // WORD_BITS]
            return ((word >> (bt % WORD_BITS)) & 1) > 0

        gA[:, :] = jnp.zeros((TBL_ROWS, LANES), jnp.float32)
        gB[:, :] = jnp.zeros((TBL_ROWS, LANES), jnp.float32)

        def gather_bt(bt, _):
            @pl.when(member(bt))
            def _():
                cols = pl.ds(bt * LANES, LANES)
                tbl = tbl_ref[:, cols]
                oha = (brow + bt * LANES == ia).astype(jnp.float32)
                ohb = (brow + bt * LANES == ib).astype(jnp.float32)
                gA[:, :] = gA[:, :] + jnp.dot(
                    tbl, oha, preferred_element_type=jnp.float32,
                    precision=hp)
                gB[:, :] = gB[:, :] + jnp.dot(
                    tbl, ohb, preferred_element_type=jnp.float32,
                    precision=hp)
            return 0

        jax.lax.fori_loop(tmin_ref[t], tmax_ref[t], gather_bt, 0)
        A = gA[:, :]
        B = gB[:, :]

        def vec(X, r0, n):
            return tuple(X[r0 + i:r0 + i + 1, :] for i in range(n))

        ha, qa, pa = vec(A, 0, 3), vec(A, 3, 4), vec(A, 7, 3)
        hb, qb, pb = vec(B, 0, 3), vec(B, 3, 4), vec(B, 7, 3)

        normal, pos, depth, feat, valid = _box_box_rows(
            ha, qa, pa, hb, qb, pb)

        fr = jnp.sqrt(jnp.maximum(A[10:11, :] * B[10:11, :], 0.0))
        live_f = pair_live.astype(jnp.float32)

        rows = [normal[0], normal[1], normal[2], fr,
                A[11:12, :], B[11:12, :]]                    # 0:6
        for r in range(4):
            rows += [pos[r][0], pos[r][1], pos[r][2]]        # 6:18
        rows += [depth[r] for r in range(4)]                 # 18:22
        rows += [feat[r] for r in range(4)]                  # 22:26
        rows += [valid[r] * live_f for r in range(4)]        # 26:30 (f32 mask)
        rows += [live_f, jnp.zeros((1, LANES), jnp.float32)]  # 30:32
        out_ref[:, :] = jnp.concatenate(rows, axis=0) * live_f

    return kernel


def np_kernel_fits(n_boxes: int) -> bool:
    nbpad = _rup(max(n_boxes, LANES), LANES)
    return TBL_ROWS * nbpad * 4 < 6 * 1024 * 1024


def box_box_pallas(bx, wc, bb, cfg: SimConfig, interpret: bool = False):
    """Run the box-box narrowphase kernel over candidate pairs `bb`.

    Returns the same slot dict fields as the vmapped jnp path in
    contacts.narrowphase_all (body_a, body_b, ga, gb, normal, friction, pos,
    depth, feat, point_valid) with arrays of length bb capacity."""
    nb = bx.half.shape[0]
    nbpad = _rup(max(nb, LANES), LANES)
    p = bb.a.shape[0]
    ppad = _rup(max(p, LANES), LANES)

    tbl = jnp.zeros((TBL_ROWS, nbpad), jnp.float32)
    tbl = tbl.at[0:3, :nb].set(bx.half.T)
    tbl = tbl.at[3:7, :nb].set(wc.box_quat.T)
    tbl = tbl.at[7:10, :nb].set(wc.box_pos.T)
    tbl = tbl.at[10, :nb].set(bx.friction)
    tbl = tbl.at[11, :nb].set(bx.body.astype(jnp.float32))

    def pad(x, fill):
        return jnp.full((ppad,), fill, x.dtype).at[:p].set(x)

    a_p = pad(bb.a, 0)
    b_p = pad(bb.b, 0)
    live_p = pad(bb.valid, False)
    pair = jnp.zeros((8, ppad), jnp.float32)
    pair = pair.at[0].set(jnp.where(live_p, a_p, _IDX_SENT
                                    ).astype(jnp.float32))
    pair = pair.at[1].set(jnp.where(live_p, b_p, _IDX_SENT
                                    ).astype(jnp.float32))
    pair = pair.at[2].set(live_p.astype(jnp.float32))

    ones = jnp.ones((ppad,), bool)
    tmin, tmax, bits = dynamic_windows(
        jnp.arange(ppad, dtype=jnp.int32), live_p, a_p, b_p, ones, ones,
        ppad, nbpad // LANES, group=LANES)

    n_tiles = ppad // LANES
    w_words = window_words(nbpad // LANES)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TBL_ROWS, nbpad), lambda t, *_: (0, 0),
                         memory_space=pltpu.VMEM),          # collider table
            pl.BlockSpec((8, LANES), lambda t, *_: (0, t),
                         memory_space=pltpu.VMEM),          # pair stream
        ],
        out_specs=[
            pl.BlockSpec((OUT_ROWS, LANES), lambda t, *_: (0, t),
                         memory_space=pltpu.VMEM),          # manifold stream
        ],
        scratch_shapes=[
            pltpu.VMEM((TBL_ROWS, LANES), jnp.float32),
            pltpu.VMEM((TBL_ROWS, LANES), jnp.float32),
        ],
    )
    (out,) = pl.pallas_call(
        _make_np_kernel(w_words),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((OUT_ROWS, ppad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(tmin, tmax, bits, tbl, pair)

    P = 4
    return dict(
        body_a=out[4, :p].astype(jnp.int32),
        body_b=out[5, :p].astype(jnp.int32),
        ga=bb.a.astype(jnp.int32),
        gb=bb.b.astype(jnp.int32),
        normal=out[0:3, :p].T,
        friction=out[3, :p],
        pos=out[6:18, :p].T.reshape(p, P, 3),
        depth=out[18:22, :p].T,
        feat=out[22:26, :p].T.astype(jnp.int32),
        point_valid=out[26:30, :p].T > 0.5,
    )


# ---------------------------------------------------------------------------
# 1-point narrowphase kernel: box-sphere + sphere-sphere in one call
# (SURVEY C7; removes the last vmapped-jnp narrowphase dispatches at scale —
# the jnp path costs ~100 op dispatches/step regardless of pair count)
# ---------------------------------------------------------------------------

S_OUT_ROWS = 16
# rows: 0:3 normal | 3 friction | 4 body_a | 5 body_b | 6:9 pos | 9 depth |
#       10 valid | 11:16 pad


def _box_sphere_rows(ha, qa, pa, rb, pb):
    """narrowphase.box_sphere as [1,128]-row math. Returns
    (normal(3), pos(3), depth) — world frame, A(box)->B(sphere)."""
    Ra = _quat_to_mat_rows(*qa)
    d = tuple(pb[i] - pa[i] for i in range(3))
    c = tuple(sum(Ra[k][i] * d[k] for k in range(3)) for i in range(3))
    cl = tuple(jnp.minimum(jnp.maximum(c[i], -ha[i]), ha[i])
               for i in range(3))
    delta = tuple(c[i] - cl[i] for i in range(3))
    d2 = _dot_v(delta, delta)
    outside = d2 > 1e-12
    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))

    n_out = tuple(delta[i] / dist for i in range(3))
    depth_out = rb - dist

    # center inside the box: push out the least-penetrated face
    face_pen = [ha[i] - jnp.abs(c[i]) for i in range(3)]
    k, _ = _argmax_rows([-face_pen[i] for i in range(3)])
    c_k = _sel3(k, *c)
    sgn = jnp.where(c_k >= 0.0, 1.0, -1.0)
    n_in = tuple((k == i) * sgn for i in range(3))
    depth_in = rb + _sel3(k, *face_pen)
    pos_in = tuple(jnp.where(k == i, sgn * ha[i], c[i]) for i in range(3))

    n_loc = tuple(jnp.where(outside, n_out[i], n_in[i]) for i in range(3))
    pos_loc = tuple(jnp.where(outside, cl[i], pos_in[i]) for i in range(3))
    depth = jnp.where(outside, depth_out, depth_in)

    pw = _matvec(Ra, pos_loc)
    nw = _matvec(Ra, n_loc)
    return nw, tuple(pw[i] + pa[i] for i in range(3)), depth


def _sphere_sphere_rows(ra, pa, rb, pb):
    """narrowphase.sphere_sphere as row math."""
    d = tuple(pb[i] - pa[i] for i in range(3))
    d2 = _dot_v(d, d)
    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
    deg = d2 <= 1e-12
    up = (0.0, 1.0, 0.0)
    n = tuple(jnp.where(deg, up[i], d[i] / dist) for i in range(3))
    depth = ra + rb - dist
    pos = tuple(pa[i] + n[i] * (ra - 0.5 * depth) for i in range(3))
    return n, pos, depth


def _make_1pt_kernel(w_words: int):
    def kernel(tmin_ref, tmax_ref, bits_ref, tbl_ref, pair_ref, out_ref,
               gA, gB):
        t = pl.program_id(0)
        brow = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0
                                        ).astype(jnp.float32)
        hp = jax.lax.Precision.HIGHEST

        ia = pair_ref[0:1, :]
        ib = pair_ref[1:2, :]
        pair_live = pair_ref[2:3, :] > 0.5

        def member(bt):
            word = bits_ref[t * w_words + bt // WORD_BITS]
            return ((word >> (bt % WORD_BITS)) & 1) > 0

        gA[:, :] = jnp.zeros((TBL_ROWS, LANES), jnp.float32)
        gB[:, :] = jnp.zeros((TBL_ROWS, LANES), jnp.float32)

        def gather_bt(bt, _):
            @pl.when(member(bt))
            def _():
                cols = pl.ds(bt * LANES, LANES)
                tbl = tbl_ref[:, cols]
                oha = (brow + bt * LANES == ia).astype(jnp.float32)
                ohb = (brow + bt * LANES == ib).astype(jnp.float32)
                gA[:, :] = gA[:, :] + jnp.dot(
                    tbl, oha, preferred_element_type=jnp.float32,
                    precision=hp)
                gB[:, :] = gB[:, :] + jnp.dot(
                    tbl, ohb, preferred_element_type=jnp.float32,
                    precision=hp)
            return 0

        jax.lax.fori_loop(tmin_ref[t], tmax_ref[t], gather_bt, 0)
        A = gA[:, :]
        B = gB[:, :]

        def vec(X, r0, n):
            return tuple(X[r0 + i:r0 + i + 1, :] for i in range(n))

        ha, qa, pa = vec(A, 0, 3), vec(A, 3, 4), vec(A, 7, 3)
        pb = vec(B, 7, 3)
        ra = A[0:1, :]
        rb = B[0:1, :]
        a_is_sphere = A[12:13, :] > 0.5

        n_bs, p_bs, d_bs = _box_sphere_rows(ha, qa, pa, rb, pb)
        n_ss, p_ss, d_ss = _sphere_sphere_rows(ra, pa, rb, pb)

        normal = tuple(jnp.where(a_is_sphere, n_ss[i], n_bs[i])
                       for i in range(3))
        pos = tuple(jnp.where(a_is_sphere, p_ss[i], p_bs[i])
                    for i in range(3))
        depth = jnp.where(a_is_sphere, d_ss, d_bs)

        fr = jnp.sqrt(jnp.maximum(A[10:11, :] * B[10:11, :], 0.0))
        live_f = pair_live.astype(jnp.float32)
        valid = jnp.where(depth > 0.0, 1.0, 0.0) * live_f

        rows = [normal[0], normal[1], normal[2], fr,
                A[11:12, :], B[11:12, :],
                pos[0], pos[1], pos[2], depth, valid]
        rows += [jnp.zeros((1, LANES), jnp.float32)] * (S_OUT_ROWS - len(rows))
        out_ref[:, :] = jnp.concatenate(rows, axis=0) * live_f

    return kernel


def unified_collider_table(bx, sp, wc, cfg: SimConfig):
    """[TBL_ROWS, ncolpad] table over global collider ids (boxes then
    spheres). Sphere columns: radius in row 0, identity quat, is_sphere=1."""
    nb = bx.half.shape[0]
    ns = sp.radius.shape[0]
    ncolpad = _rup(max(nb + ns, LANES), LANES)
    tbl = jnp.zeros((TBL_ROWS, ncolpad), jnp.float32)
    tbl = tbl.at[0:3, :nb].set(bx.half.T)
    tbl = tbl.at[3:7, :nb].set(wc.box_quat.T)
    tbl = tbl.at[7:10, :nb].set(wc.box_pos.T)
    tbl = tbl.at[10, :nb].set(bx.friction)
    tbl = tbl.at[11, :nb].set(bx.body.astype(jnp.float32))
    tbl = tbl.at[0, nb:nb + ns].set(sp.radius)
    tbl = tbl.at[6, nb:nb + ns].set(1.0)            # identity quat (w)
    tbl = tbl.at[7:10, nb:nb + ns].set(wc.sph_pos.T)
    tbl = tbl.at[10, nb:nb + ns].set(sp.friction)
    tbl = tbl.at[11, nb:nb + ns].set(sp.body.astype(jnp.float32))
    tbl = tbl.at[12, nb:nb + ns].set(1.0)
    return tbl, ncolpad


def pairs_1pt_pallas(bx, sp, wc, bs, ss, cfg: SimConfig,
                     interpret: bool = False):
    """Box-sphere and sphere-sphere narrowphase in one Pallas call over the
    concatenated candidate streams. Pair ids are GLOBAL collider ids (sphere
    gid = max_boxes + sphere index), matching the unified table columns.
    Returns one slot dict (same fields as the jnp parts, P-slot padded)."""
    nb = bx.half.shape[0]
    tbl, ncolpad = unified_collider_table(bx, sp, wc, cfg)

    a_all = jnp.concatenate([bs.a, nb + ss.a]).astype(jnp.int32)
    b_all = nb + jnp.concatenate([bs.b, ss.b]).astype(jnp.int32)
    live_all = jnp.concatenate([bs.valid, ss.valid])
    p = a_all.shape[0]
    ppad = _rup(max(p, LANES), LANES)

    def pad(x, fill):
        return jnp.full((ppad,), fill, x.dtype).at[:p].set(x)

    a_p = pad(a_all, 0)
    b_p = pad(b_all, 0)
    live_p = pad(live_all, False)
    pair = jnp.zeros((8, ppad), jnp.float32)
    pair = pair.at[0].set(jnp.where(live_p, a_p, _IDX_SENT
                                    ).astype(jnp.float32))
    pair = pair.at[1].set(jnp.where(live_p, b_p, _IDX_SENT
                                    ).astype(jnp.float32))
    pair = pair.at[2].set(live_p.astype(jnp.float32))

    ones = jnp.ones((ppad,), bool)
    tmin, tmax, bits = dynamic_windows(
        jnp.arange(ppad, dtype=jnp.int32), live_p, a_p, b_p, ones, ones,
        ppad, ncolpad // LANES, group=LANES)

    n_tiles = ppad // LANES
    w_words = window_words(ncolpad // LANES)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TBL_ROWS, ncolpad), lambda t, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda t, *_: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S_OUT_ROWS, LANES), lambda t, *_: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((TBL_ROWS, LANES), jnp.float32),
            pltpu.VMEM((TBL_ROWS, LANES), jnp.float32),
        ],
    )
    (out,) = pl.pallas_call(
        _make_1pt_kernel(w_words),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((S_OUT_ROWS, ppad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(tmin, tmax, bits, tbl, pair)

    from .narrowphase import BOX_BOX_POINTS as P
    pos = jnp.zeros((p, P, 3), jnp.float32).at[:, 0].set(out[6:9, :p].T)
    depth = jnp.zeros((p, P), jnp.float32).at[:, 0].set(out[9, :p])
    pv = jnp.zeros((p, P), bool).at[:, 0].set(out[10, :p] > 0.5)
    return dict(
        body_a=out[4, :p].astype(jnp.int32),
        body_b=out[5, :p].astype(jnp.int32),
        # box arrays are capacity-sized (nb == cfg.max_boxes), so table
        # columns coincide with the global gid space used by the cache
        ga=a_all,
        gb=b_all,
        normal=out[0:3, :p].T,
        friction=out[3, :p],
        pos=pos, depth=depth,
        feat=jnp.zeros((p, P), jnp.int32),
        point_valid=pv,
    )
