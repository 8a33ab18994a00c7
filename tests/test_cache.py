"""Warm-start cache join tests (SURVEY.md §4 item 6: permutation-invariant
tag matching)."""

import numpy as np
import jax.numpy as jnp

from nudge_tpu.config import CONTACT_POINTS
from nudge_tpu.ops.cache import read_cached_impulses, write_cached_impulses
from nudge_tpu.ops.contacts import Manifolds
from nudge_tpu.state import ContactCache

P = CONTACT_POINTS


def mk_manifolds(pairs, feats, point_valid):
    """pairs: [M] (encoded as (ga=pair, gb=pair+1)), feats/point_valid: [M,P]."""
    m = len(pairs)
    pv = jnp.asarray(point_valid, bool)
    return Manifolds(
        body_a=jnp.zeros(m, jnp.int32), body_b=jnp.zeros(m, jnp.int32),
        ga=jnp.asarray(pairs, jnp.int32),
        gb=jnp.asarray(pairs, jnp.int32) + 1,
        normal=jnp.zeros((m, 3), jnp.float32),
        friction=jnp.zeros(m, jnp.float32),
        pos=jnp.zeros((m, P, 3), jnp.float32),
        depth=jnp.zeros((m, P), jnp.float32),
        feat=jnp.asarray(feats, jnp.int32),
        point_valid=pv,
        valid=jnp.any(pv, -1),
        count=jnp.sum(jnp.any(pv, -1).astype(jnp.int32)),
        overflow=jnp.asarray(False),
    )


def mk_cache(pairs, feats, impulses, valid, pseudo=None):
    n = len(pairs)
    return ContactCache(
        ga=jnp.asarray(pairs, jnp.int32),
        gb=jnp.asarray(pairs, jnp.int32) + 1,
        feat=jnp.asarray(feats, jnp.int32),
        impulse=jnp.asarray(impulses, jnp.float32),
        pseudo=(jnp.zeros((n,), jnp.float32) if pseudo is None
                else jnp.asarray(pseudo, jnp.float32)),
        valid=jnp.asarray(valid, bool),
    )


def full_feats(*rows):
    return [list(r) + [0] * (P - len(r)) for r in rows]


def test_join_matches_and_misses():
    cache = mk_cache(
        pairs=[5, 5, 9, 0], feats=[1, 2, 7, 0],
        impulses=[[1, 0, 0], [0, 2, 0], [0, 0, 3], [9, 9, 9]],
        valid=[True, True, True, False],
    )
    # two manifolds: pair 5 with feats (2,1), pair 9 with feat 7 + one new key
    man = mk_manifolds(
        pairs=[5, 9],
        feats=full_feats([2, 1, 30], [7]),
        point_valid=[[True, True, True, False], [True, False, False, False]],
    )
    out = np.asarray(read_cached_impulses(cache, man)[0])
    np.testing.assert_allclose(out[0, 0], [0, 2, 0])   # (5,2) hit
    np.testing.assert_allclose(out[0, 1], [1, 0, 0])   # (5,1) hit
    np.testing.assert_allclose(out[0, 2], 0.0)         # (5,30) miss
    np.testing.assert_allclose(out[0, 3], 0.0)         # invalid point
    np.testing.assert_allclose(out[1, 0], [0, 0, 3])   # (9,7) hit
    # (0,0) exists only as an invalid cache row -> never matches
    man2 = mk_manifolds([0], full_feats([0]),
                        [[True, False, False, False]])
    out2 = np.asarray(read_cached_impulses(cache, man2)[0])
    np.testing.assert_allclose(out2[0, 0], 0.0)


def test_join_permutation_invariant():
    rng = np.random.default_rng(0)
    m = 32
    pairs = rng.permutation(1000)[:m].astype(np.int32)  # unique pair keys
    feats = np.stack([rng.permutation(64)[:P] for _ in range(m)]).astype(np.int32)
    imps = rng.normal(size=(m * P, 3)).astype(np.float32)
    cache = mk_cache(
        np.repeat(pairs, P), feats.reshape(-1), imps, [True] * (m * P)
    )
    perm = rng.permutation(m)
    man = mk_manifolds(pairs[perm], feats[perm], np.ones((m, P), bool))
    out = np.asarray(read_cached_impulses(cache, man)[0])
    np.testing.assert_allclose(
        out, imps.reshape(m, P, 3)[perm], atol=1e-6
    )


def test_roundtrip_write_then_read():
    man = mk_manifolds(
        pairs=[1, 2],
        feats=full_feats([0, 1], [0]),
        point_valid=[[True, True, False, False], [True, False, False, False]],
    )
    imp = np.zeros((2, P, 3), np.float32)
    imp[0, 0] = [1, 2, 3]
    imp[0, 1] = [4, 5, 6]
    imp[1, 0] = [7, 8, 9]
    pacc = np.zeros((2, P), np.float32)
    pacc[0, 0] = 0.7
    pacc[1, 0] = 1.3
    cache = write_cached_impulses(man, jnp.asarray(imp), jnp.asarray(pacc))
    out, pout = read_cached_impulses(cache, man)
    out, pout = np.asarray(out), np.asarray(pout)
    np.testing.assert_allclose(pout[0, 0], 0.7)
    np.testing.assert_allclose(pout[1, 0], 1.3)
    np.testing.assert_allclose(pout[0, 2], 0.0)
    np.testing.assert_allclose(out[0, 0], [1, 2, 3])
    np.testing.assert_allclose(out[0, 1], [4, 5, 6])
    np.testing.assert_allclose(out[1, 0], [7, 8, 9])
    np.testing.assert_allclose(out[0, 2], 0.0)
