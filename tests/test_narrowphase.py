"""Narrowphase oracle tests (SURVEY.md §4 items 1, 6).

Box-box is validated against an independent float64 numpy SAT oracle plus
analytic manifold cases; properties (containment, depth-vs-translation) are
checked on random penetrating pairs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nudge_tpu.ops import narrowphase as nps
from nudge_tpu import mathx as m


# ---------------------------------------------------------------------------
# float64 numpy SAT oracle (independent implementation, no shared code)
# ---------------------------------------------------------------------------

def quat_to_mat_np(q):
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], dtype=np.float64)


def boxes_overlap_oracle(ha, qa, pa, hb, qb, pb):
    """Exact separating-axis test for two OBBs in float64."""
    Ra, Rb = quat_to_mat_np(qa), quat_to_mat_np(qb)
    axes = [Ra[:, i] for i in range(3)] + [Rb[:, j] for j in range(3)]
    for i in range(3):
        for j in range(3):
            c = np.cross(Ra[:, i], Rb[:, j])
            n = np.linalg.norm(c)
            if n > 1e-9:
                axes.append(c / n)
    t = np.asarray(pb, np.float64) - np.asarray(pa, np.float64)
    for ax in axes:
        ra = np.sum(np.abs(Ra.T @ ax) * ha)
        rb = np.sum(np.abs(Rb.T @ ax) * hb)
        if abs(np.dot(t, ax)) > ra + rb:
            return False
    return True


def rand_quat(rng):
    q = rng.normal(size=4)
    return (q / np.linalg.norm(q)).astype(np.float32)


_bb_jit = jax.jit(nps.box_box)


def run_bb(ha, qa, pa, hb, qb, pb):
    return jax.tree.map(np.asarray, _bb_jit(
        jnp.asarray(ha, jnp.float32), jnp.asarray(qa, jnp.float32),
        jnp.asarray(pa, jnp.float32), jnp.asarray(hb, jnp.float32),
        jnp.asarray(qb, jnp.float32), jnp.asarray(pb, jnp.float32)))


IDQ = np.array([0, 0, 0, 1], np.float32)


# ---------------------------------------------------------------------------
# analytic manifold cases
# ---------------------------------------------------------------------------

def test_face_face_aligned():
    # unit cubes stacked with 0.1 overlap
    r = run_bb([0.5] * 3, IDQ, [0, 0, 0], [0.5] * 3, IDQ, [0, 0.9, 0])
    valid = r["valid"]
    assert valid.sum() == 4
    np.testing.assert_allclose(r["normal"], [0, 1, 0], atol=1e-5)
    np.testing.assert_allclose(r["depth"][valid], 0.1, atol=1e-5)
    pts = np.sort(r["pos"][valid][:, [0, 2]].round(5), axis=0)
    # contact x/z at the shared-face corners ±0.5
    assert set(map(tuple, r["pos"][valid][:, [0, 2]].round(4).tolist())) == {
        (0.5, 0.5), (0.5, -0.5), (-0.5, -0.5), (-0.5, 0.5)}
    # feature ids distinct (warm-start identity)
    feats = r["feat"][valid]
    assert len(set(feats.tolist())) == 4


def test_face_face_offset():
    # top box shifted +0.5 in x: overlap strip x in [0, 0.5]
    r = run_bb([0.5] * 3, IDQ, [0, 0, 0], [0.5] * 3, IDQ, [0.5, 0.9, 0])
    valid = r["valid"]
    assert valid.sum() == 4
    xs = r["pos"][valid][:, 0]
    assert xs.min() >= -1e-4 and xs.max() <= 0.5 + 1e-4
    np.testing.assert_allclose(r["normal"], [0, 1, 0], atol=1e-5)


def test_face_face_rotated_45_octagon_reduced_to_4():
    # the raw clip is an octagon (8 points); manifold reduction keeps 4
    # well-spread representatives
    q45 = np.asarray(m.quat_from_axis_angle(jnp.array([0., 1., 0.]), np.pi / 4))
    r = run_bb([0.5] * 3, IDQ, [0, 0, 0], [0.5] * 3, q45, [0, 0.9, 0])
    assert r["valid"].sum() == 4
    np.testing.assert_allclose(np.abs(r["normal"][1]), 1.0, atol=1e-5)
    feats = r["feat"][r["valid"]]
    assert len(set(feats.tolist())) == 4
    # kept points should span the overlap region, not cluster
    pts = r["pos"][r["valid"]][:, [0, 2]]
    assert np.ptp(pts[:, 0]) > 0.4 and np.ptp(pts[:, 1]) > 0.4


def test_edge_edge_cross():
    # box A axis-aligned; box B rotated 45 deg about x AND 45 about z so its
    # edge crosses A's top edge
    qx = m.quat_from_axis_angle(jnp.array([1., 0., 0.]), np.pi / 4)
    r = run_bb([0.5] * 3, IDQ, [0, 0, 0],
               [0.5] * 3, np.asarray(qx), [0, 0.5 + 0.70, 0.5])
    # B's lower edge (along x) presses into A's top face region near z=0.5
    # depending on depth this may be a face or edge contact; just require
    # a valid sane manifold
    valid = r["valid"]
    assert valid.sum() >= 1
    assert np.all(np.isfinite(r["pos"][valid]))
    assert r["depth"][valid].max() < 0.2


def test_true_edge_edge_case():
    # Two long boxes crossing like an X, each rolled 45° about its own long
    # axis so the closest features are single edges: A long in x (top edge
    # along x at y=+h), B long in z (bottom edge along z at its y−h), with
    # h = 0.1·√2. Offset so the edges overlap by 0.02.
    qa = m.quat_from_axis_angle(jnp.array([1., 0., 0.]), np.pi / 4)
    qb = m.quat_from_axis_angle(jnp.array([0., 0., 1.]), np.pi / 4)
    ha = np.array([1.0, 0.1, 0.1], np.float32)
    hb = np.array([0.1, 0.1, 1.0], np.float32)
    h = 0.1 * np.sqrt(2)
    r = run_bb(ha, np.asarray(qa), [0, 0, 0],
               hb, np.asarray(qb), [0, 2 * h - 0.02, 0])
    valid = r["valid"]
    assert valid.sum() == 1          # edge contact -> single point
    assert r["feat"][valid][0] >= 1024  # edge feature id space
    np.testing.assert_allclose(r["pos"][valid][0], [0, h - 0.01, 0], atol=2e-2)
    np.testing.assert_allclose(r["depth"][valid][0], 0.02, atol=5e-3)
    np.testing.assert_allclose(r["normal"], [0, 1, 0], atol=1e-2)


def test_separated_no_contacts():
    r = run_bb([0.5] * 3, IDQ, [0, 0, 0], [0.5] * 3, IDQ, [0, 1.2, 0])
    assert r["valid"].sum() == 0
    rng = np.random.default_rng(0)
    for _ in range(10):
        q = rand_quat(rng)
        r = run_bb([0.5] * 3, q, [0, 0, 0], [0.3, 0.4, 0.5],
                   rand_quat(rng), [2.5, 0, 0])
        assert r["valid"].sum() == 0


# ---------------------------------------------------------------------------
# randomized properties vs oracle
# ---------------------------------------------------------------------------

_bb_batch = jax.jit(jax.vmap(nps.box_box))


def _random_batch(rng, n, span):
    ha = rng.uniform(0.2, 1.0, (n, 3)).astype(np.float32)
    hb = rng.uniform(0.2, 1.0, (n, 3)).astype(np.float32)
    qa = np.stack([rand_quat(rng) for _ in range(n)])
    qb = np.stack([rand_quat(rng) for _ in range(n)])
    pa = np.zeros((n, 3), np.float32)
    pb = rng.uniform(-span, span, (n, 3)).astype(np.float32)
    return ha, qa, pa, hb, qb, pb


def test_sat_matches_oracle_random():
    rng = np.random.default_rng(42)
    n = 512
    ha, qa, pa, hb, qb, pb = _random_batch(rng, n, 2.2)
    r = jax.tree.map(np.asarray, _bb_batch(ha, qa, pa, hb, qb, pb))
    got = r["valid"].sum(axis=1) > 0
    mismatches = 0
    for i in range(n):
        oracle = boxes_overlap_oracle(ha[i], qa[i], pa[i], hb[i], qb[i], pb[i])
        if got[i] != oracle:
            # tolerate disagreement only in grazing configurations
            grazing = not boxes_overlap_oracle(
                ha[i] - 5e-3, qa[i], pa[i], hb[i] - 5e-3, qb[i], pb[i]
            ) if oracle else boxes_overlap_oracle(
                ha[i] + 5e-3, qa[i], pa[i], hb[i] + 5e-3, qb[i], pb[i]
            )
            assert grazing, f"SAT mismatch beyond tolerance at {i}"
            mismatches += 1
    assert mismatches < n // 20


def test_contact_points_inside_boxes_shallow():
    """For shallow penetration, contact points must lie (almost) inside both
    boxes. (For deep overlap, incident-face points can legitimately pass the
    reference box's far face, so gate on depth.)"""
    rng = np.random.default_rng(7)
    n = 512
    ha, qa, pa, hb, qb, pb = _random_batch(rng, n, 1.2)
    r = jax.tree.map(np.asarray, _bb_batch(ha, qa, pa, hb, qb, pb))
    checked = 0
    for i in range(n):
        valid = r["valid"][i]
        if not valid.any():
            continue
        dmax = r["depth"][i][valid].max()
        assert np.all(r["depth"][i][valid] > 0)
        if dmax > 0.2 * min(ha[i].min(), hb[i].min()):
            continue  # deep overlap: containment not guaranteed by design
        checked += 1
        Ra, Rb = quat_to_mat_np(qa[i]), quat_to_mat_np(qb[i])
        eps = 5e-2
        for p in r["pos"][i][valid]:
            assert np.all(np.abs(Ra.T @ p) <= ha[i] + eps)
            assert np.all(np.abs(Rb.T @ (p - pb[i])) <= hb[i] + eps)
    assert checked > 20


def test_depth_decreases_along_normal():
    """Moving B along +normal (A->B) must reduce max penetration."""
    rng = np.random.default_rng(13)
    n = 256
    ha, qa, pa, hb, qb, pb = _random_batch(rng, n, 0.8)
    r = jax.tree.map(np.asarray, _bb_batch(ha, qa, pa, hb, qb, pb))
    step = 0.03
    pb2 = pb + step * r["normal"]
    r2 = jax.tree.map(np.asarray, _bb_batch(ha, qa, pa, hb, qb, pb2))
    d0 = np.where(r["valid"], r["depth"], 0.0).max(axis=1)
    d1 = np.where(r2["valid"], r2["depth"], 0.0).max(axis=1)
    sel = d0 > 0.05
    assert sel.sum() > 30
    assert np.all(d1[sel] < d0[sel] + 1e-4)


# ---------------------------------------------------------------------------
# box-sphere / sphere-sphere (closed form)
# ---------------------------------------------------------------------------

_bs_jit = jax.jit(nps.box_sphere)


def run_bs(h, qa, pa, r, pb):
    return jax.tree.map(np.asarray, _bs_jit(
        jnp.asarray(h, jnp.float32), jnp.asarray(qa, jnp.float32),
        jnp.asarray(pa, jnp.float32), jnp.float32(r),
        jnp.asarray(pb, jnp.float32)))


def test_box_sphere_face():
    r = run_bs([0.5] * 3, IDQ, [0, 0, 0], 0.25, [0, 0.7, 0])
    assert r["valid"]
    np.testing.assert_allclose(r["normal"], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(r["depth"], 0.05, atol=1e-6)
    np.testing.assert_allclose(r["pos"], [0, 0.5, 0], atol=1e-6)


def test_box_sphere_corner():
    c = np.array([0.6, 0.6, 0.6], np.float32)
    r = run_bs([0.5] * 3, IDQ, [0, 0, 0], 0.25, c)
    assert r["valid"]
    dist = np.linalg.norm(c - 0.5)
    np.testing.assert_allclose(r["depth"], 0.25 - dist, atol=1e-6)
    np.testing.assert_allclose(r["normal"], (c - 0.5) / dist, atol=1e-5)


def test_box_sphere_center_inside():
    r = run_bs([0.5] * 3, IDQ, [0, 0, 0], 0.25, [0.0, 0.4, 0.0])
    assert r["valid"]
    np.testing.assert_allclose(r["normal"], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(r["depth"], 0.25 + 0.1, atol=1e-6)


def test_box_sphere_separated():
    assert not run_bs([0.5] * 3, IDQ, [0, 0, 0], 0.25, [0, 1.0, 0])["valid"]


def test_sphere_sphere():
    f = jax.jit(nps.sphere_sphere)
    r = jax.tree.map(np.asarray, jax.jit(nps.sphere_sphere)(
        jnp.float32(0.5), jnp.zeros(3), jnp.float32(0.3),
        jnp.array([0.7, 0.0, 0.0])))
    assert r["valid"]
    np.testing.assert_allclose(r["depth"], 0.1, atol=1e-6)
    np.testing.assert_allclose(r["normal"], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(r["pos"], [0.45, 0, 0], atol=1e-6)


def test_vmap_box_box_matches_scalar():
    rng = np.random.default_rng(3)
    n = 32
    ha = rng.uniform(0.3, 1.0, (n, 3)).astype(np.float32)
    hb = rng.uniform(0.3, 1.0, (n, 3)).astype(np.float32)
    qa = np.stack([rand_quat(rng) for _ in range(n)])
    qb = np.stack([rand_quat(rng) for _ in range(n)])
    pa = np.zeros((n, 3), np.float32)
    pb = rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)
    batched = jax.tree.map(np.asarray, _bb_batch(ha, qa, pa, hb, qb, pb))
    for i in range(n):
        single = run_bb(ha[i], qa[i], pa[i], hb[i], qb[i], pb[i])
        np.testing.assert_array_equal(batched["valid"][i], single["valid"])
        v = single["valid"]
        np.testing.assert_allclose(batched["normal"][i], single["normal"],
                                   atol=1e-5, err_msg=f"pair {i} normal")
        for key in ["pos", "depth", "feat"]:
            np.testing.assert_allclose(
                batched[key][i][v], single[key][v], atol=1e-5,
                err_msg=f"pair {i} key {key}")
