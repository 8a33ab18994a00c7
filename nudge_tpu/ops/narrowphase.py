"""Narrowphase collision: box-box SAT + face clipping, box-sphere, sphere-sphere.

This is the TPU rebuild of the reference's largest component (SURVEY.md C6/C7:
SIMD SAT over 15 axes, Sutherland-Hodgman face clipping with per-feature ids,
edge-edge closest points — `nudge.cpp`, the biggest single chunk of the file).
Design differences from the C++/SSE original, per SURVEY.md §7:

  - one *branchless, fixed-shape* per-pair function, `vmap`-ed over padded
    candidate-pair batches (the SIMD-lanes analog);
  - the variable-size clip polygon lives in 8 fixed slots with a count +
    validity mask; per-plane compaction is a tiny batched argsort;
  - face-vs-edge case selection is a `where` over both computed results.

Contacts carry persistent feature ids (reference: 64-bit contact tags,
SURVEY.md C8) built from clip-edge ids in the classic Box2D (inEdge, outEdge)
scheme, so warm-start matching survives frame-to-frame manifold changes.

Conventions: contact `normal` points from collider A to collider B; `depth` > 0
means penetrating; contact `pos` is in world space on the incident feature.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..mathx import cross, dot, normalize, quat_to_mat

# Internal clip-polygon slots (a quad clipped by 4 planes yields at most 8
# vertices) and the reduced manifold size a box-box pair emits. Reduction to
# 4 well-spread points keeps the solver's per-manifold work and the coloring
# pressure bounded — the standard manifold-reduction every production engine
# applies (the reference emits the raw clip output [MED]; 4-point reduction
# is behavior-preserving for stacking).
BOX_BOX_SLOTS = 8

from ..config import CONTACT_POINTS as BOX_BOX_POINTS  # noqa: E402


def _reduce_manifold(uv, depth, valid):
    """Pick <=4 representative points from <=8 clipped candidates:
    deepest, farthest from it, then the two max-|area| extremes. Returns
    (idx[4] i32, valid4[4] bool). `uv`[8,2] are reference-face plane coords."""
    big_neg = jnp.float32(-1e30)
    idxs = jnp.arange(BOX_BOX_SLOTS)

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


def _clip_quad_against_faceband(pts, feat_in, feat_out, count, h_u, h_v, u, v):
    """Sutherland-Hodgman clip of a convex polygon (first `count` of 8 slots
    in `pts`[8,3] valid, in reference-box frame) against the 4 side planes of
    the reference face: |p[u]| <= h_u, |p[v]| <= h_v.

    Vertices carry Box2D-style (in_edge, out_edge) feature ids: incident-face
    edges are 0..3, reference side planes are 4..7.
    Returns (pts, feat_in, feat_out, count).
    """

    def one_plane(carry, plane):
        pts, f_in, f_out, n = carry
        coord_axis, side, plane_id = plane
        k = jnp.arange(BOX_BOX_SLOTS)
        k_next = jnp.where(k + 1 >= n, 0, k + 1)

        a = pts
        b = pts[k_next]
        h = jnp.where(coord_axis == u, h_u, h_v)
        da = h - side * a[:, coord_axis]
        db = h - side * b[:, coord_axis]
        in_a = da >= 0.0
        in_b = db >= 0.0
        edge_live = k < n

        # slot 2k: keep vertex a when inside; slot 2k+1: crossing point
        keep_valid = edge_live & in_a
        cross_valid = edge_live & (in_a != in_b)
        denom = jnp.where(jnp.abs(da - db) > 1e-12, da - db, 1e-12)
        pc = a + (da / denom)[:, None] * (b - a)
        # exiting (a inside): in_edge = polygon edge (= a.out), out_edge = plane
        # entering: in_edge = plane, out_edge = polygon edge (= a.out)
        c_in = jnp.where(in_a, f_out, 4 + plane_id)
        c_out = jnp.where(in_a, 4 + plane_id, f_out)

        # interleave a0, x0, a1, x1, ... to preserve polygon winding
        out_pts = jnp.stack([a, pc], axis=1).reshape(2 * BOX_BOX_SLOTS, 3)
        out_fin = jnp.stack([f_in, c_in], axis=1).reshape(-1)
        out_fout = jnp.stack([f_out, c_out], axis=1).reshape(-1)
        out_valid = jnp.stack([keep_valid, cross_valid], axis=1).reshape(-1)

        # stable-compact valid slots to the front; convex => at most 8 survive
        key = (~out_valid) * (2 * BOX_BOX_SLOTS) + jnp.arange(2 * BOX_BOX_SLOTS)
        perm = jnp.argsort(key)
        new_n = jnp.minimum(jnp.sum(out_valid.astype(jnp.int32)), BOX_BOX_SLOTS)
        return (
            out_pts[perm][:BOX_BOX_SLOTS],
            out_fin[perm][:BOX_BOX_SLOTS],
            out_fout[perm][:BOX_BOX_SLOTS],
            new_n,
        ), None

    planes = (
        jnp.stack([u, u, v, v]).astype(jnp.int32),
        jnp.array([1.0, -1.0, 1.0, -1.0], jnp.float32),
        jnp.arange(4, dtype=jnp.int32),
    )
    (pts, feat_in, feat_out, count), _ = jax.lax.scan(
        one_plane, (pts, feat_in, feat_out, count), planes
    )
    return pts, feat_in, feat_out, count


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
    pts0 = corners_inc @ R_ri.T + t_ri           # [4,3] reference frame
    pts = jnp.zeros((BOX_BOX_SLOTS, 3), jnp.float32).at[:4].set(pts0)
    feat_in = jnp.zeros((BOX_BOX_SLOTS,), jnp.int32).at[:4].set(
        jnp.array([3, 0, 1, 2], jnp.int32)       # corner k: in_edge = (k-1)%4
    )
    feat_out = jnp.zeros((BOX_BOX_SLOTS,), jnp.int32).at[:4].set(
        jnp.arange(4, dtype=jnp.int32)           # corner k: out_edge = k
    )

    pts, feat_in, feat_out, n_clip = _clip_quad_against_faceband(
        pts, feat_in, feat_out, jnp.int32(4), h_ref[u], h_ref[v], u, v
    )

    slot = jnp.arange(BOX_BOX_SLOTS)
    depth_all = h_ref[w] - nsign * pts[:, w]     # > 0 penetrating
    valid_all = (slot < n_clip) & (depth_all > 0.0)

    # reduce <=8 clip points to <=4 representatives (see _reduce_manifold)
    uv = jnp.stack([pts[:, u], pts[:, v]], axis=-1)
    keep_idx, keep_valid = _reduce_manifold(uv, depth_all, valid_all)
    pts4 = pts[keep_idx]
    depth_f = depth_all[keep_idx]
    valid_f = keep_valid & valid_all[keep_idx]

    Rref = jnp.where(ref_is_b, Rb, Ra)
    pref = jnp.where(ref_is_b, pb, pa)
    pos_f = pts4 @ Rref.T + pref                 # world
    n_ref_world = Rref[:, axis] * nsign          # ref face outward normal
    normal_f = jnp.where(ref_is_b, -n_ref_world, n_ref_world)  # A -> B

    feat_f = (
        feat_in[keep_idx] * 8
        + feat_out[keep_idx]
        + (ref_is_b.astype(jnp.int32) << 6)
        + (axis.astype(jnp.int32) << 7)
        + ((nsign > 0).astype(jnp.int32) << 9)
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
