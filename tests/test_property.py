"""Hypothesis property tests (SURVEY §4 item 6).

1. box-box SAT vs a brute-force numpy separating-axis oracle over random
   configurations (independent implementation: normalized axes, direct
   projection-interval test).
2. The warm-start cache join is a permutation-invariant join on
   (gid_a, gid_b, feature) keys.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import jax
import jax.numpy as jnp

from nudge_tpu.ops.cache import _join
from nudge_tpu.ops.narrowphase import box_box


# ---------------------------------------------------------------------------
# SAT oracle
# ---------------------------------------------------------------------------

def _quat_to_mat_np(q):
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def _sat_margin_oracle(ha, qa, pa, hb, qb, pb):
    """Max separation over the 15 normalized candidate axes; > 0 means
    separated. Brute force: project both boxes onto every axis."""
    Ra = _quat_to_mat_np(qa)
    Rb = _quat_to_mat_np(qb)
    d = pb - pa
    axes = [Ra[:, i] for i in range(3)] + [Rb[:, i] for i in range(3)]
    for i in range(3):
        for j in range(3):
            c = np.cross(Ra[:, i], Rb[:, j])
            n = np.linalg.norm(c)
            if n > 1e-6:
                axes.append(c / n)
    best = -np.inf
    for ax in axes:
        ra = np.sum(ha * np.abs(ax @ Ra))
        rb = np.sum(hb * np.abs(ax @ Rb))
        best = max(best, abs(ax @ d) - (ra + rb))
    return best


unit = st.floats(-1.0, 1.0, allow_nan=False)
halfext = st.floats(0.2, 1.5, allow_nan=False)
coord = st.floats(-2.5, 2.5, allow_nan=False)


def _norm_quat(q):
    q = np.asarray(q, np.float64)
    n = np.linalg.norm(q)
    if n < 1e-3:
        return np.array([0.0, 0.0, 0.0, 1.0])
    return q / n


@settings(max_examples=60, deadline=None)
@given(
    ha=st.tuples(halfext, halfext, halfext),
    hb=st.tuples(halfext, halfext, halfext),
    qa=st.tuples(unit, unit, unit, unit),
    qb=st.tuples(unit, unit, unit, unit),
    pb=st.tuples(coord, coord, coord),
)
@pytest.mark.slow
def test_box_box_matches_sat_oracle(ha, hb, qa, qb, pb):
    ha = np.asarray(ha, np.float32)
    hb = np.asarray(hb, np.float32)
    qa = _norm_quat(qa).astype(np.float32)
    qb = _norm_quat(qb).astype(np.float32)
    pa = np.zeros(3, np.float32)
    pb = np.asarray(pb, np.float32)

    margin = _sat_margin_oracle(ha, qa, pa, hb, qb, pb)
    if abs(margin) < 2e-3:
        return  # numerically ambiguous boundary; both answers acceptable

    out = jax.jit(box_box)(
        jnp.asarray(ha), jnp.asarray(qa), jnp.asarray(pa),
        jnp.asarray(hb), jnp.asarray(qb), jnp.asarray(pb))
    any_contact = bool(np.asarray(out["valid"]).any())

    if margin > 0:
        assert not any_contact, (
            f"oracle separated by {margin:.4f} but box_box found contacts")
    else:
        assert any_contact, (
            f"oracle penetrating by {-margin:.4f} but box_box found none")
        if -margin < 0.1:
            # shallow contact: clip-point depth along the chosen face normal
            # tracks the SAT penetration (within the 5% face-axis bias).
            # Deep overlap is excluded — point depth is measured to the
            # reference face, which can legitimately exceed the minimum
            # translation distance there.
            depth = np.asarray(out["depth"])
            valid = np.asarray(out["valid"])
            assert depth[valid].max() <= 1.15 * -margin + 2e-2


# ---------------------------------------------------------------------------
# cache join permutation invariance
# ---------------------------------------------------------------------------

@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_cache_join_permutation_invariant(data):
    rng = np.random.default_rng(data.draw(st.integers(0, 2 ** 31 - 1)))
    n_cache = data.draw(st.integers(1, 40))
    n_cur = data.draw(st.integers(1, 40))

    # unique cache keys (the writer emits each contact point once)
    keys = rng.choice(500, size=min(n_cache, 500), replace=False)
    ga = (keys // 25).astype(np.int32)
    gb = ((keys // 5) % 5).astype(np.int32)
    feat = (keys % 5).astype(np.int32)
    imp = rng.normal(size=(len(keys), 3)).astype(np.float32)
    c_valid = rng.random(len(keys)) < 0.8

    # unique current keys: the engine emits one manifold per collider pair
    # with distinct slot features, so valid current keys never repeat
    # (documented _join precondition)
    k_keys = rng.choice(500, size=min(n_cur, 500), replace=False)
    k_ga = (k_keys // 25).astype(np.int32)
    k_gb = ((k_keys // 5) % 5).astype(np.int32)
    k_feat = (k_keys % 5).astype(np.int32)
    k_valid = rng.random(len(k_keys)) < 0.9

    def run(order):
        return np.asarray(jax.jit(_join)(
            jnp.asarray(ga[order]), jnp.asarray(gb[order]),
            jnp.asarray(feat[order]), jnp.asarray(imp[order]),
            jnp.asarray(c_valid[order]),
            jnp.asarray(k_ga), jnp.asarray(k_gb), jnp.asarray(k_feat),
            jnp.asarray(k_valid),
        ))

    base = run(np.arange(len(keys)))
    perm = run(rng.permutation(len(keys)))
    np.testing.assert_array_equal(base, perm)

    # hits return the cached impulse; misses return zero
    lut = {(int(a), int(b), int(f)): v
           for a, b, f, v, ok in zip(ga, gb, feat, imp, c_valid) if ok}
    for i in range(len(k_keys)):
        expect = lut.get((int(k_ga[i]), int(k_gb[i]), int(k_feat[i])))
        if not k_valid[i] or expect is None:
            np.testing.assert_array_equal(base[i], np.zeros(3, np.float32))
        else:
            np.testing.assert_array_equal(base[i], expect)
