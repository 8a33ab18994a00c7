"""Narrowphase collision: box-box SAT + face clipping, box-sphere, sphere-sphere.

This is the TPU rebuild of the reference's largest component (SURVEY.md C6/C7:
SIMD SAT over 15 axes, Sutherland-Hodgman face clipping with per-feature ids,
edge-edge closest points — `nudge.cpp`, the biggest single chunk of the file).
Design differences from the C++/SSE original, per SURVEY.md §7:

  - one *branchless, fixed-shape* per-pair function, `vmap`-ed over padded
    candidate-pair batches (the SIMD-lanes analog);
  - the face clip is CLOSED-FORM: the polygon "incident quad ∩ reference
    rect" is spanned by 24 fixed candidate points (verts-in-rect,
    corners-in-quad, edge×edge intersections), each with a validity mask —
    no Sutherland-Hodgman scan, no compaction sorts;
  - face-vs-edge case selection is a `where` over both computed results.

Contacts carry persistent feature ids (reference: 64-bit contact tags,
SURVEY.md C8): the candidate slot index is a deterministic geometric feature,
so warm-start matching survives frame-to-frame manifold changes.

Conventions: contact `normal` points from collider A to collider B; `depth` > 0
means penetrating; contact `pos` is in world space on the incident feature.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..mathx import cross, dot, normalize, quat_to_mat

# A box-box manifold is reduced to 4 well-spread points; this keeps the
# solver's per-manifold work and the coloring pressure bounded — the standard
# manifold reduction every production engine applies (the reference emits the
# raw clip output [MED]; 4-point reduction is behavior-preserving for
# stacking).
from ..config import CONTACT_POINTS as BOX_BOX_POINTS  # noqa: E402


def _reduce_manifold(uv, depth, valid):
    """Pick <=4 representative points from the clipped candidate set:
    deepest, farthest from it, then the two max-|area| extremes. Returns
    (idx[4] i32, valid4[4] bool). `uv`[K,2] are reference-face plane coords."""
    big_neg = jnp.float32(-1e30)
    idxs = jnp.arange(uv.shape[0])

    s0 = jnp.where(valid, depth, big_neg)
    i0 = jnp.argmax(s0)
    v0 = jnp.any(valid)
    remaining = valid & (idxs != i0)

    d1 = jnp.sum((uv - uv[i0]) ** 2, axis=-1)
    i1 = jnp.argmax(jnp.where(remaining, d1, big_neg))
    v1 = jnp.any(remaining)
    remaining = remaining & (idxs != i1)

    e01 = uv[i1] - uv[i0]
    rel = uv - uv[i0]
    area = e01[0] * rel[:, 1] - e01[1] * rel[:, 0]   # signed 2x triangle area
    i2 = jnp.argmax(jnp.where(remaining, jnp.abs(area), big_neg))
    v2 = jnp.any(remaining)
    a2 = area[i2]
    remaining = remaining & (idxs != i2)

    opposite = -jnp.sign(a2) * area
    i3 = jnp.argmax(jnp.where(remaining, opposite, big_neg))
    v3 = jnp.any(remaining)

    return (jnp.stack([i0, i1, i2, i3]),
            jnp.stack([v0, v1, v2, v3]))

_FACE_EDGE_BIAS = 0.95   # edge axis must beat the best face axis by 5% to win
_ABS_EPS = 1e-5          # epsilon added to |R| (ODE-style near-parallel robustness)


def box_box(ha, qa, pa, hb, qb, pb):
    """Collide two oriented boxes. Returns a fixed-shape manifold dict:
    pos[4,3] (world), normal[3] (world, A->B), depth[4], feat[4] i32,
    valid[4] bool (BOX_BOX_POINTS=4 reduced manifold).

    SAT over the 15 classic axes with |R|+eps robustness; face case clips the
    incident face against the reference face's side bands; edge case does the
    segment-segment closest point. Reference: `nudge.cpp` box-box narrowphase
    (SURVEY.md C6, call stack §3.B).
    """
    Ra = quat_to_mat(qa)
    Rb = quat_to_mat(qb)
    R = Ra.T @ Rb                       # B axes in A frame
    t = Ra.T @ (pb - pa)                # B center in A frame
    absR = jnp.abs(R) + _ABS_EPS

    # --- 6 face axes ---
    sA = jnp.abs(t) - (ha + absR @ hb)          # [3]
    tB = R.T @ t
    sB = jnp.abs(tB) - (absR.T @ ha + hb)       # [3]
    s_face = jnp.concatenate([sA, sB])          # [6]
    best_face = jnp.argmax(s_face)
    s_face_best = s_face[best_face]

    # --- 9 edge-edge axes: axis(i,j) = cross(a_i, b_j) ---
    i1 = jnp.array([1, 2, 0])
    i2 = jnp.array([2, 0, 1])
    # separation along the unnormalized axis:
    #   |t[i2]·R[i1,j] − t[i1]·R[i2,j]|
    #     − ha[i1]·|R|[i2,j] − ha[i2]·|R|[i1,j]
    #     − hb[j1]·|R|[i,j2] − hb[j2]·|R|[i,j1]
    b_term = hb[i1][None, :] * absR[:, i2] + hb[i2][None, :] * absR[:, i1]
    num = (
        jnp.abs(t[i2][:, None] * R[i1, :] - t[i1][:, None] * R[i2, :])
        - ha[i1][:, None] * absR[i2, :]
        - ha[i2][:, None] * absR[i1, :]
        - b_term
    )                                            # [3,3] over (i, j)
    L2 = R[i1, :] ** 2 + R[i2, :] ** 2           # |cross(a_i, b_j)|², [3,3]
    L = jnp.sqrt(jnp.maximum(L2, 1e-12))
    s_edge = jnp.where(L2 > 1e-6, num / L, -jnp.inf)  # parallel -> never wins
    best_edge = jnp.argmax(s_edge)
    s_edge_best = s_edge.reshape(-1)[best_edge]

    separated = jnp.maximum(s_face_best, s_edge_best) > 0.0

    pen_face = -s_face_best
    pen_edge = -s_edge_best
    edge_case = (pen_edge < pen_face * _FACE_EDGE_BIAS) & jnp.isfinite(pen_edge)

    # ------------------------------------------------------------------
    # FACE CASE — clip incident face against reference face side bands
    # ------------------------------------------------------------------
    ref_is_b = best_face >= 3
    axis = best_face % 3
    R_ri = jnp.where(ref_is_b, R.T, R)          # incident -> reference frame
    t_ri = jnp.where(ref_is_b, -(R.T @ t), t)   # incident center in ref frame
    h_ref = jnp.where(ref_is_b, hb, ha)
    h_inc = jnp.where(ref_is_b, ha, hb)
    nsign = jnp.where(t_ri[axis] >= 0.0, 1.0, -1.0)

    w = axis
    u = (axis + 1) % 3
    v = (axis + 2) % 3

    # incident face: the incident axis most anti-parallel to the ref normal
    nd = R_ri[w, :] * nsign
    b_axis = jnp.argmax(jnp.abs(nd))
    s_inc = -jnp.sign(nd[b_axis])
    b1 = (b_axis + 1) % 3
    b2 = (b_axis + 2) % 3

    e = jnp.eye(3, dtype=jnp.float32)
    su = jnp.array([1.0, 1.0, -1.0, -1.0])
    sv = jnp.array([1.0, -1.0, -1.0, 1.0])
    corners_inc = (
        s_inc * h_inc[b_axis] * e[b_axis][None, :]
        + su[:, None] * h_inc[b1] * e[b1][None, :]
        + sv[:, None] * h_inc[b2] * e[b2][None, :]
    )                                            # [4,3] incident frame, CCW
    pts0 = corners_inc @ R_ri.T + t_ri           # [4,3] reference frame, CCW

    # Closed-form clip: the polygon "incident quad ∩ reference rect" is
    # spanned by 24 fixed candidates — 4 incident verts inside the rect,
    # 4 rect corners inside the quad, 16 quad-edge x rect-edge intersections.
    # Pure elementwise math (no scans/sorts — replaces the sequential
    # Sutherland-Hodgman of the C++ reference, SURVEY C6); each candidate
    # slot is its own frame-stable feature id.
    eps = 1e-6
    h_u, h_v, h_w = h_ref[u], h_ref[v], h_ref[w]
    qu = pts0[:, u]
    qv = pts0[:, v]
    qn = jnp.arange(4)
    qu_n = qu[(qn + 1) % 4]
    qv_n = qv[(qn + 1) % 4]

    # type A: incident verts inside the rect
    pos_a3 = pts0                                              # [4,3]
    val_a = (jnp.abs(qu) <= h_u + eps) & (jnp.abs(qv) <= h_v + eps)

    # type B: rect corners inside the incident quad (2D half-plane tests)
    cu = jnp.array([1.0, 1.0, -1.0, -1.0]) * h_u               # [4]
    cv = jnp.array([1.0, -1.0, -1.0, 1.0]) * h_v
    eu = (qu_n - qu)[None, :]                                  # [1,4] edges
    ev = (qv_n - qv)[None, :]
    crossc = eu * (cv[:, None] - qv[None, :]) - ev * (cu[:, None] - qu[None, :])
    area2 = jnp.sum(qu * qv_n - qu_n * qv)
    sgn = jnp.where(area2 >= 0.0, 1.0, -1.0)
    val_b = jnp.all(sgn * crossc >= -eps, axis=1)              # [4]
    # w from the incident-face plane  n_inc·p = d
    n_inc = R_ri[:, b_axis] * s_inc
    d_pl = jnp.sum(n_inc * pts0[0])
    n_w_safe = jnp.where(jnp.abs(n_inc[w]) > 1e-3, n_inc[w], 1e-3)
    cw = (d_pl - n_inc[u] * cu - n_inc[v] * cv) / n_w_safe
    pos_b3 = (jnp.zeros((4, 3))
              .at[:, u].set(cu).at[:, v].set(cv).at[:, w].set(cw))
    val_b &= jnp.abs(n_inc[w]) > 1e-3

    # type C: 4 incident edges x 4 rect border lines
    # lines 0,1: u = ±h_u (check v in band); lines 2,3: v = ±h_v (check u)
    line_val = jnp.array([h_u, -h_u, h_v, -h_v])               # [4]
    p_line = jnp.where(jnp.arange(4) < 2, 1.0, 0.0)            # 1 -> u-line
    src = jnp.where(p_line[None, :] > 0.5, qu[:, None], qv[:, None])  # [4e,4l]
    dst = jnp.where(p_line[None, :] > 0.5, qu_n[:, None], qv_n[:, None])
    den = dst - src
    den = jnp.where(jnp.abs(den) > 1e-9, den, 1e-9)
    tt = (line_val[None, :] - src) / den                       # [4,4]
    other = jnp.where(p_line[None, :] > 0.5, qv[:, None], qu[:, None])
    other_n = jnp.where(p_line[None, :] > 0.5, qv_n[:, None], qu_n[:, None])
    oth = other + tt * (other_n - other)
    oth_h = jnp.where(p_line[None, :] > 0.5, h_v, h_u)
    val_c = (tt >= -eps) & (tt <= 1.0 + eps) & (jnp.abs(oth) <= oth_h + eps)
    pos_c3 = (pts0[:, None, :]
              + tt[:, :, None] * (pts0[(qn + 1) % 4][:, None, :]
                                  - pts0[:, None, :]))          # [4,4,3]

    cand = jnp.concatenate([pos_a3, pos_b3, pos_c3.reshape(16, 3)], axis=0)
    cand_valid = jnp.concatenate([val_a, val_b, val_c.reshape(16)])
    depth_all = h_w - nsign * cand[:, w]                       # [24]
    valid_all = cand_valid & (depth_all > 0.0)

    # reduce <=24 candidates to <=4 representatives (see _reduce_manifold)
    uv = jnp.stack([cand[:, u], cand[:, v]], axis=-1)
    keep_idx, keep_valid = _reduce_manifold(uv, depth_all, valid_all)
    pts4 = cand[keep_idx]
    depth_f = depth_all[keep_idx]
    valid_f = keep_valid & valid_all[keep_idx]

    Rref = jnp.where(ref_is_b, Rb, Ra)
    pref = jnp.where(ref_is_b, pb, pa)
    pos_f = pts4 @ Rref.T + pref                 # world
    n_ref_world = Rref[:, axis] * nsign          # ref face outward normal
    normal_f = jnp.where(ref_is_b, -n_ref_world, n_ref_world)  # A -> B

    # feature id = candidate slot (frame-stable) + face identity bits
    feat_f = (
        keep_idx.astype(jnp.int32)
        + (ref_is_b.astype(jnp.int32) << 5)
        + (axis.astype(jnp.int32) << 6)
        + ((nsign > 0).astype(jnp.int32) << 8)
    )

    # ------------------------------------------------------------------
    # EDGE CASE — closest points between the two supporting edges
    # ------------------------------------------------------------------
    ei = best_edge // 3
    ej = best_edge % 3
    axis_a = normalize(cross(e[ei], R[:, ej]))   # A frame
    axis_a = axis_a * jnp.where(dot(axis_a, t) >= 0.0, 1.0, -1.0)  # A -> B

    # support edge on A along +axis_a; on B along -axis_a
    sa = jnp.sign(axis_a) + (axis_a == 0.0)
    c1 = sa * ha * (1.0 - e[ei])                 # edge center, A frame
    d1 = e[ei]
    axis_b = -(R.T @ axis_a)
    sb = jnp.sign(axis_b) + (axis_b == 0.0)
    c2 = R @ (sb * hb * (1.0 - e[ej])) + t       # edge center, A frame
    d2 = R[:, ej]

    r12 = c2 - c1
    b_dd = dot(d1, d2)
    denom = jnp.maximum(1.0 - b_dd * b_dd, 1e-9)
    s_par = jnp.clip((dot(d1, r12) - b_dd * dot(d2, r12)) / denom, -ha[ei], ha[ei])
    u_par = jnp.clip((b_dd * dot(d1, r12) - dot(d2, r12)) / denom, -hb[ej], hb[ej])
    pos_e = Ra @ (0.5 * ((c1 + s_par * d1) + (c2 + u_par * d2))) + pa
    normal_e = Ra @ axis_a
    sign_bits = (
        (sa[i1[ei]] > 0).astype(jnp.int32)
        + 2 * (sa[i2[ei]] > 0).astype(jnp.int32)
        + 4 * (sb[i1[ej]] > 0).astype(jnp.int32)
        + 8 * (sb[i2[ej]] > 0).astype(jnp.int32)
    )
    feat_e = 1024 + (ei * 3 + ej) * 16 + sign_bits

    # ------------------------------------------------------------------
    # select + gate
    # ------------------------------------------------------------------
    pos = jnp.where(edge_case, jnp.zeros_like(pos_f).at[0].set(pos_e), pos_f)
    depth = jnp.where(
        edge_case, jnp.zeros_like(depth_f).at[0].set(pen_edge), depth_f
    )
    feat = jnp.where(edge_case, jnp.zeros_like(feat_f).at[0].set(feat_e), feat_f)
    valid_e = jnp.zeros_like(valid_f).at[0].set(pen_edge > 0.0)
    valid = jnp.where(edge_case, valid_e, valid_f) & ~separated
    normal = jnp.where(edge_case, normal_e, normal_f)

    return {"pos": pos, "normal": normal, "depth": depth, "feat": feat,
            "valid": valid}


def box_sphere(h, qa, pa, radius, pb):
    """Box (A) vs sphere (B): one contact. Returns pos[3], normal[3] (A->B),
    depth scalar, feat=0, valid bool. Reference: SURVEY.md C7."""
    Ra = quat_to_mat(qa)
    c = Ra.T @ (pb - pa)                # sphere center in box frame
    clamped = jnp.clip(c, -h, h)
    delta = c - clamped
    d2 = dot(delta, delta)
    outside = d2 > 1e-12
    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))

    # center outside the box: push along center-to-closest-point
    n_out = delta / dist
    depth_out = radius - dist
    pos_out = clamped

    # center inside the box: push out the least-penetrated face
    face_pen = h - jnp.abs(c)
    k = jnp.argmin(face_pen)
    sgn = jnp.where(c[k] >= 0.0, 1.0, -1.0)
    n_in = jnp.zeros(3).at[k].set(sgn)
    depth_in = radius + face_pen[k]
    pos_in = c.at[k].set(sgn * h[k])

    n_local = jnp.where(outside, n_out, n_in)
    depth = jnp.where(outside, depth_out, depth_in)
    pos_local = jnp.where(outside, pos_out, pos_in)

    return {
        "pos": Ra @ pos_local + pa,
        "normal": Ra @ n_local,
        "depth": depth,
        "feat": jnp.int32(0),
        "valid": depth > 0.0,
    }


def sphere_sphere(ra, pa, rb, pb):
    """Sphere vs sphere: one contact at the overlap midpoint."""
    d = pb - pa
    d2 = dot(d, d)
    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
    n = jnp.where(d2 > 1e-12, d / dist, jnp.array([0.0, 1.0, 0.0]))
    depth = ra + rb - dist
    pos = pa + n * (ra - 0.5 * depth)
    return {"pos": pos, "normal": n, "depth": depth, "feat": jnp.int32(0),
            "valid": depth > 0.0}
