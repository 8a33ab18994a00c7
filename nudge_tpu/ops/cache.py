"""Warm-start impulse cache: sort-merge join on persistent contact tags.

Reference (SURVEY.md C9, §3.C): read_cached_impulses sorts the current frame's
u64 contact tags and merge-joins them against the previous frame's sorted
cache; write_cached_impulses harvests accumulated impulses back.

TPU-native design: one fully-vectorized sort-merge join per frame. Cache rows
(src=0) and current contact points (src=1) are concatenated and
lexicographically sorted by (pair, feat, src) with `lax.sort`; a current point
matches iff its immediate predecessor in sorted order is a cache row with the
same key. No u64s (TPU-unfriendly): identity is two i32 keys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..state import ContactCache
from .contacts import Manifolds

_SENTINEL = jnp.iinfo(jnp.int32).max


def _join(c_ga, c_gb, c_feat, c_imp, c_valid, k_ga, k_gb, k_feat, k_valid):
    """Core join: returns f32[K,W] payloads for current keys (zeros on miss).
    Identity = (gid_a, gid_b, feature) — three i32 keys, lex-sorted. The
    payload width W is whatever `c_imp` carries (impulse xyz, pseudo, ...).

    Precondition: VALID current keys are unique (guaranteed by the engine —
    one manifold per collider pair, distinct candidate-slot features within
    a manifold). With duplicate current keys only the sort-first duplicate
    would match its cache row; the others see a current row as predecessor.
    Cache keys may repeat only among invalid rows (sentinel-keyed)."""
    c_ga = jnp.where(c_valid, c_ga, _SENTINEL)
    c_gb = jnp.where(c_valid, c_gb, _SENTINEL)
    c_feat = jnp.where(c_valid, c_feat, _SENTINEL)
    k_ga = jnp.where(k_valid, k_ga, _SENTINEL)
    k_gb = jnp.where(k_valid, k_gb, _SENTINEL)
    k_feat = jnp.where(k_valid, k_feat, _SENTINEL)

    n_cache = c_ga.shape[0]
    n_cur = k_ga.shape[0]
    w = c_imp.shape[1]

    ga = jnp.concatenate([c_ga, k_ga])
    gb = jnp.concatenate([c_gb, k_gb])
    feat = jnp.concatenate([c_feat, k_feat])
    src = jnp.concatenate([
        jnp.zeros((n_cache,), jnp.int32), jnp.ones((n_cur,), jnp.int32)
    ])
    payload = jnp.concatenate([c_imp, jnp.zeros((n_cur, w), jnp.float32)])
    orig = jnp.concatenate([
        jnp.full((n_cache,), -1, jnp.int32),
        jnp.arange(n_cur, dtype=jnp.int32),
    ])

    sorted_ = jax.lax.sort(
        (ga, gb, feat, src) + tuple(payload[:, c] for c in range(w))
        + (orig,),
        num_keys=4,
    )
    ga, gb, feat, src = sorted_[:4]
    orig = sorted_[-1]
    payload = jnp.stack(sorted_[4:4 + w], axis=-1)

    prev_match = (
        (src == 1)
        & (jnp.roll(src, 1) == 0)
        & (ga == jnp.roll(ga, 1))
        & (gb == jnp.roll(gb, 1))
        & (feat == jnp.roll(feat, 1))
    )
    prev_match = prev_match.at[0].set(False)
    matched = jnp.where(prev_match[:, None], jnp.roll(payload, 1, axis=0), 0.0)

    out = jnp.zeros((n_cur, w), jnp.float32)
    sel = src == 1
    tgt = jnp.where(sel, orig, n_cur)  # out-of-bounds rows drop
    out = out.at[tgt].add(jnp.where(sel[:, None], matched, 0.0), mode="drop")
    return jnp.where(k_valid[:, None], out, 0.0)


def join_i32(c_key, c_payload, c_valid, k_key, k_valid):
    """Single-i32-key join: for each valid current key, the i32 payload of
    the valid cache row with the same key (0 on miss). Same mechanics as
    `_join` but everything rides ONE packed sort key (key*2 + src) and one
    i32 payload — 3 sorted arrays instead of 8, for joins whose identity and
    payload both fit in 31/32 bits (the persistent-coloring join does: key =
    ga*n_gids+gb, payload = color|dynbits). Keys must be < 2^30 and unique
    among valid rows on each side; callers check the range statically."""
    big = jnp.int32(2 ** 30 - 1)   # sentinel: big*2+1 == INT32_MAX, no wrap
    ck = jnp.where(c_valid, c_key, big)
    kk = jnp.where(k_valid, k_key, big)
    n_cur = kk.shape[0]
    key2 = jnp.concatenate([ck * 2, kk * 2 + 1])
    payload = jnp.concatenate([c_payload, jnp.zeros_like(kk)])
    orig = jnp.concatenate([
        jnp.full(ck.shape, -1, jnp.int32),
        jnp.arange(n_cur, dtype=jnp.int32),
    ])
    key2, payload, orig = jax.lax.sort((key2, payload, orig), num_keys=1)
    # a current row (odd key) matches iff its predecessor is the cache row
    # (even key) of the same identity; sentinel-keyed invalid rows can
    # spuriously "match" each other but are masked out at the end
    match = ((key2 & 1) == 1) & (key2 == jnp.roll(key2, 1) + 1)
    match = match.at[0].set(False)
    matched = jnp.where(match, jnp.roll(payload, 1), 0)
    sel = (key2 & 1) == 1
    tgt = jnp.where(sel, orig, n_cur)  # out-of-bounds rows drop
    out = jnp.zeros((n_cur,), jnp.int32).at[tgt].add(
        jnp.where(sel, matched, 0), mode="drop")
    return jnp.where(k_valid, out, 0)


def read_cached_impulses(cache: ContactCache, man: Manifolds, cfg=None):
    """Warm-start payload for every manifold point: (impulse f32[M,P,3],
    pseudo f32[M,P]).

    Aligned fast path (SimConfig.aligned_fast_path): the cache is written in
    manifold-slot order (write_cached_impulses), so when every valid point's
    SAME-SLOT cache row carries its key, the join's answer IS that row —
    contact keys are unique, so no other row could match. One elementwise
    compare + lax.cond replaces the 4-key lax.sort join whenever the
    manifold stream is unchanged since last step (settled scenes: almost
    every step)."""
    m, p = man.feat.shape
    ga_flat = jnp.broadcast_to(man.ga[:, None], (m, p)).reshape(-1)
    gb_flat = jnp.broadcast_to(man.gb[:, None], (m, p)).reshape(-1)
    feat_flat = man.feat.reshape(-1)
    pv = man.point_valid.reshape(-1)
    payload = jnp.concatenate([cache.impulse, cache.pseudo[:, None]], axis=-1)

    def slow(_):
        out = _join(
            cache.ga, cache.gb, cache.feat, payload, cache.valid,
            ga_flat, gb_flat, feat_flat, pv,
        )
        return out[:, 0:3], out[:, 3]

    use_fast = (cfg is not None and cfg.aligned_fast_path
                and cache.ga.shape[0] == m * p)
    if use_fast:
        aligned = jnp.all(
            ~pv | (cache.valid & (cache.ga == ga_flat)
                   & (cache.gb == gb_flat) & (cache.feat == feat_flat)))

        def fast(_):
            return (jnp.where(pv[:, None], cache.impulse, 0.0),
                    jnp.where(pv, cache.pseudo, 0.0))

        imp, pse = jax.lax.cond(aligned, fast, slow, None)
    else:
        imp, pse = slow(None)
    return imp.reshape(m, p, 3), pse.reshape(m, p)


def write_cached_impulses(man: Manifolds, impulse_world: jnp.ndarray,
                          pseudo_acc=None) -> ContactCache:
    """New cache = this frame's contact points + their accumulated world
    impulses f32[M,P,3] and pseudo normal impulses f32[M,P] (reference:
    update_/write_cached_impulses, SURVEY C9)."""
    m, p = man.feat.shape
    valid = man.point_valid.reshape(-1)
    ga_flat = jnp.broadcast_to(man.ga[:, None], (m, p)).reshape(-1)
    gb_flat = jnp.broadcast_to(man.gb[:, None], (m, p)).reshape(-1)
    if pseudo_acc is None:
        pseudo_acc = jnp.zeros((m, p), jnp.float32)
    return ContactCache(
        ga=jnp.where(valid, ga_flat, 0),
        gb=jnp.where(valid, gb_flat, 0),
        feat=jnp.where(valid, man.feat.reshape(-1), 0),
        impulse=jnp.where(valid[:, None], impulse_world.reshape(-1, 3), 0.0),
        pseudo=jnp.where(valid, pseudo_acc.reshape(-1), 0.0),
        valid=valid,
    )
