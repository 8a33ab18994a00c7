"""Persistent (amortized) broadphase.

The reference rebuilds its sweep every frame (SURVEY C5); on TPU the rebuild
is the most op-heavy stage left, while in settled scenes the candidate set
barely changes. Standard engine fix, done functionally:

  - at rebuild time, candidate pairs are generated with a fat speculative
    margin (cfg.rebuild_margin) and cached in the state together with anchor
    positions/orientations;
  - each step, every body's conservative displacement since its anchor is
    d = |x - x_anchor| + 2 r |q - q_anchor| (r = body circumradius; the
    rotational term bounds AABB growth). While max d < rebuild_margin/2, any
    pair whose true AABBs overlap now was within the fattened overlap at
    rebuild time, so the cache is a superset of the live pair set — nothing
    can be missed; the narrowphase filters the extras;
  - `lax.cond` picks rebuild vs reuse, so the rebuild cost is paid only when
    something actually moved (sleeping piles: almost never).

Per-step filters that must track *current* state (sleeping pairs dropped,
SURVEY C13) are re-applied to the cached pairs each step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..config import SimConfig
from ..mathx import quat_to_mat
from ..state import SimState
from .broadphase import (
    CandidatePairs, WorldColliders, _pair_filter, allpairs_broadphase,
)


@struct.dataclass
class BPCache:
    """Cached candidate pairs + rebuild anchors (part of SimState)."""

    bb_a: jnp.ndarray       # i32[Pbb]
    bb_b: jnp.ndarray
    bb_valid: jnp.ndarray   # bool[Pbb]
    bs_a: jnp.ndarray
    bs_b: jnp.ndarray
    bs_valid: jnp.ndarray
    ss_a: jnp.ndarray
    ss_b: jnp.ndarray
    ss_valid: jnp.ndarray
    overflow: jnp.ndarray   # bool
    flags: jnp.ndarray      # i32 rebuild-time attribution (grid bb.flags:
                            # bit0 fat pair cap, bit1 cell density, bit2
                            # expand cap; 0 when the rebuild was clean)
    anchor_pos: jnp.ndarray   # f32[N,3]
    anchor_quat: jnp.ndarray  # f32[N,4]
    stale: jnp.ndarray        # bool: force rebuild (initial state)
    # Tight-refilter memo (round-4, VERDICT r3 item 3c): the per-step
    # refilter's two-tier compaction is a lax.sort over the FAT pair array
    # (~327k keys at 20,480 bodies) — but its output depends only on the
    # per-row keep/core code, which near rest is unchanged step over step.
    # Store the code and the compacted tight box-box list; when the code
    # matches, reuse the list under lax.cond and skip the sort.
    bb_code: jnp.ndarray      # i8[Pbb] 0=drop, 1=speculative, 2=core
    tight_bb_a: jnp.ndarray   # i32[tight cap]
    tight_bb_b: jnp.ndarray
    tight_bb_valid: jnp.ndarray  # bool[tight cap]
    tight_bb_count: jnp.ndarray  # i32 true tight demand
    memo_ok: jnp.ndarray      # bool: memo refers to the CURRENT fat arrays


def fat_cfg(cfg: SimConfig) -> SimConfig:
    """Config the rebuild runs under: fat speculative margin AND fat pair
    capacities. The fat set is structurally larger than the tight set (a
    settled pile or lattice spawn has ~13 half-stencil neighbors/body within
    the 0.1 margin vs ~2-7 touching); sharing the tight capacity made the
    20,480-pile rebuild overflow at spawn, wholesale-dropping 60% of pairs —
    the starved region free-falls through the pile."""
    k = max(cfg.fat_pair_factor, 1)
    return cfg.replace(
        aabb_margin=cfg.rebuild_margin,
        max_box_box_pairs=k * cfg.max_box_box_pairs,
        max_box_sphere_pairs=k * cfg.max_box_sphere_pairs,
        max_sphere_sphere_pairs=k * cfg.max_sphere_sphere_pairs,
    )


def empty_bp_cache(cfg: SimConfig, n_bodies: int) -> BPCache:
    z = lambda c: jnp.zeros((c,), jnp.int32)
    f = lambda c: jnp.zeros((c,), bool)
    fat = fat_cfg(cfg)
    ns = max(fat.max_box_sphere_pairs, 0)
    nss = max(fat.max_sphere_sphere_pairs, 0)
    return BPCache(
        bb_a=z(fat.max_box_box_pairs), bb_b=z(fat.max_box_box_pairs),
        bb_valid=f(fat.max_box_box_pairs),
        bs_a=z(ns), bs_b=z(ns), bs_valid=f(ns),
        ss_a=z(nss), ss_b=z(nss), ss_valid=f(nss),
        overflow=jnp.asarray(False),
        flags=jnp.zeros((), jnp.int32),
        anchor_pos=jnp.zeros((n_bodies, 3), jnp.float32),
        anchor_quat=jnp.zeros((n_bodies, 4), jnp.float32),
        stale=jnp.asarray(True),
        bb_code=jnp.zeros((fat.max_box_box_pairs,), jnp.int8),
        tight_bb_a=z(cfg.max_box_box_pairs),
        tight_bb_b=z(cfg.max_box_box_pairs),
        tight_bb_valid=f(cfg.max_box_box_pairs),
        tight_bb_count=jnp.zeros((), jnp.int32),
        memo_ok=jnp.asarray(False),
    )


def _body_radius(state: SimState, cfg: SimConfig) -> jnp.ndarray:
    """Per-body circumradius over its colliders (for the rotation bound)."""
    n = state.bodies.pos.shape[0]
    bx, sp = state.boxes, state.spheres
    r = jnp.zeros((n,), jnp.float32)
    r_box = jnp.linalg.norm(bx.half, axis=-1) + jnp.linalg.norm(bx.lpos, axis=-1)
    r = r.at[jnp.maximum(bx.body, 0)].max(jnp.where(bx.valid, r_box, 0.0))
    if cfg.max_spheres > 0:
        r_s = sp.radius + jnp.linalg.norm(sp.lpos, axis=-1)
        r = r.at[jnp.maximum(sp.body, 0)].max(jnp.where(sp.valid, r_s, 0.0))
    return r


def needs_rebuild(state: SimState, cfg: SimConfig) -> jnp.ndarray:
    bp = state.bp
    d = jnp.linalg.norm(state.bodies.pos - bp.anchor_pos, axis=-1)
    dq = jnp.linalg.norm(state.bodies.quat - bp.anchor_quat, axis=-1)
    disp = d + 2.0 * _body_radius(state, cfg) * dq
    return bp.stale | jnp.any(disp > 0.5 * cfg.rebuild_margin)


def persistent_broadphase(state: SimState, wc: WorldColliders,
                          cfg: SimConfig, base_broadphase):
    """Returns ((bb, bs, ss), new BPCache). `base_broadphase(state, wc, cfg)`
    is the full rebuild (grid or allpairs), run with the fat margin."""

    def rebuild(_):
        bb, bs, ss = base_broadphase(state, wc, fat_cfg(cfg))
        ovf = bb.overflow
        if bs.a.shape[0] > 0:
            ovf |= bs.overflow | ss.overflow
        if bb.flags is not None:   # grid density/expand drops are real drops
            ovf |= bb.flags != 0
        flg = jnp.where(ovf, 1, 0).astype(jnp.int32)
        if bb.flags is not None:
            flg = flg | bb.flags
        return BPCache(
            bb_a=bb.a, bb_b=bb.b, bb_valid=bb.valid,
            bs_a=bs.a if bs.a.shape[0] else state.bp.bs_a,
            bs_b=bs.b if bs.a.shape[0] else state.bp.bs_b,
            bs_valid=bs.valid if bs.a.shape[0] else state.bp.bs_valid,
            ss_a=ss.a if ss.a.shape[0] else state.bp.ss_a,
            ss_b=ss.b if ss.a.shape[0] else state.bp.ss_b,
            ss_valid=ss.valid if ss.a.shape[0] else state.bp.ss_valid,
            overflow=ovf,
            flags=flg,
            anchor_pos=state.bodies.pos,
            anchor_quat=state.bodies.quat,
            stale=jnp.asarray(False),
            bb_code=jnp.zeros_like(state.bp.bb_code),
            tight_bb_a=state.bp.tight_bb_a,
            tight_bb_b=state.bp.tight_bb_b,
            tight_bb_valid=state.bp.tight_bb_valid,
            tight_bb_count=state.bp.tight_bb_count,
            memo_ok=jnp.asarray(False),   # memo indexed the OLD fat arrays
        )

    def reuse(_):
        return state.bp

    bp = jax.lax.cond(needs_rebuild(state, cfg), rebuild, reuse, None)

    # Per-step tight re-filter of the fat cached set: current-AABB overlap +
    # live filters (sleep state changes between rebuilds), then compaction to
    # the live capacity so the narrowphase only pays for pairs that can
    # actually touch. Roughly halves the candidate volume the fat margin
    # added.
    from .broadphase import box_aabbs, sphere_aabbs

    bodies, sleep, conn = state.bodies, state.sleep, state.connections
    bx, sp = state.boxes, state.spheres
    blo, bhi = box_aabbs(bx.half, wc.box_pos, wc.box_quat, cfg.aabb_margin)
    if cfg.max_spheres > 0:
        slo, shi = sphere_aabbs(sp.radius, wc.sph_pos, cfg.aabb_margin)

    def keep_core(valid, body_a, body_b, lo_a, hi_a, lo_b, hi_b):
        """(keep, core) masks over the fat array. CORE pairs truly overlap
        with the fattening margin stripped (actually touching /
        load-bearing); the rest of keep is the SPECULATIVE margin shell."""
        keep = valid & _pair_filter(bodies, sleep, body_a, body_b, conn, cfg)
        keep &= jnp.all((lo_a <= hi_b) & (lo_b <= hi_a), axis=-1)
        m2 = 2.0 * cfg.aabb_margin
        core = keep & jnp.all((lo_a <= hi_b - m2) & (lo_b <= hi_a - m2),
                              axis=-1)
        return keep, core

    def two_tier_compact(keep, core, a, b, live_cap):
        """Compact to the TIGHT per-class capacity: the re-filtered live set
        is exactly the population the non-persistent path emits, so
        everything downstream keeps non-persistent shapes and cost.

        Two-tier degradation (round-4 fix for the step-1000 20,480-pile
        tunneling): CORE pairs sort ahead of SPECULATIVE margin-only pairs,
        so capacity overflow sheds the speculative shell first.
        Index-ordered compaction dropped the cache tail instead, which is
        grid-cell-major — one contiguous spatial region silently lost ALL
        its pairs (ground contacts included), free-fell through the floor,
        and fed the overlap->pairs->overflow loop.

        The core-first key is applied ONLY under overflow pressure
        (demand > capacity): tier-sorting unconditionally reorders the
        whole list whenever one pair flips core<->speculative at a margin
        boundary, which shifts every downstream manifold slot and defeats
        the aligned fast paths (measured round 4: 1.01x A/B). With no
        pressure the compaction keeps pure cache order — stable step over
        step; under pressure stability is sacrificed to save the
        load-bearing set."""
        n = a.shape[0]
        cap = max(live_cap, 1)
        idx = jnp.arange(n, dtype=jnp.int32)
        pressure = jnp.sum(keep.astype(jnp.int32)) > cap
        keys = jnp.where(keep,
                         jnp.where(core | ~pressure, idx, idx + n),
                         jnp.int32(2 ** 30))
        sel = jax.lax.sort((keys,), num_keys=1)[0][:cap]
        if cap > n:
            sel = jnp.pad(sel, (0, cap - n))
        cnt = jnp.sum(keep.astype(jnp.int32))
        vv = jnp.arange(cap) < jnp.minimum(cnt, cap)
        sel = jnp.where(vv, jnp.where(sel >= n, sel - n, sel), 0)
        return (jnp.where(vv, a[sel], 0), jnp.where(vv, b[sel], 0), vv, cnt)

    def mk(a, b, valid, body_a, body_b, lo_a, hi_a, lo_b, hi_b, live_cap):
        keep, core = keep_core(valid, body_a, body_b, lo_a, hi_a, lo_b, hi_b)
        a_s, b_s, vv, cnt = two_tier_compact(keep, core, a, b, live_cap)
        return CandidatePairs(a=a_s, b=b_s, valid=vv, count=cnt)

    # Box-box rides a tight-list memo: the compaction output is a pure
    # function of the keep/core code, which near rest is unchanged step over
    # step — reuse the stored list under lax.cond and skip the fat-array
    # sort (VERDICT r3 item 3c).
    keep_bb, core_bb = keep_core(
        bp.bb_valid, bx.body[bp.bb_a], bx.body[bp.bb_b],
        blo[bp.bb_a], bhi[bp.bb_a], blo[bp.bb_b], bhi[bp.bb_b])
    code = (keep_bb.astype(jnp.int8) + core_bb.astype(jnp.int8))
    if cfg.aligned_fast_path:
        same = bp.memo_ok & jnp.all(code == bp.bb_code)
        a_s, b_s, vv, cnt = jax.lax.cond(
            same,
            lambda _: (bp.tight_bb_a, bp.tight_bb_b, bp.tight_bb_valid,
                       bp.tight_bb_count),
            lambda _: two_tier_compact(keep_bb, core_bb, bp.bb_a, bp.bb_b,
                                       cfg.max_box_box_pairs),
            None)
    else:
        a_s, b_s, vv, cnt = two_tier_compact(
            keep_bb, core_bb, bp.bb_a, bp.bb_b, cfg.max_box_box_pairs)
    bb = CandidatePairs(a=a_s, b=b_s, valid=vv, count=cnt)
    bp = bp.replace(bb_code=code, tight_bb_a=a_s, tight_bb_b=b_s,
                    tight_bb_valid=vv, tight_bb_count=cnt,
                    memo_ok=jnp.asarray(True))
    if cfg.max_spheres > 0:
        bs = mk(bp.bs_a, bp.bs_b, bp.bs_valid,
                bx.body[bp.bs_a], sp.body[bp.bs_b],
                blo[bp.bs_a], bhi[bp.bs_a], slo[bp.bs_b], shi[bp.bs_b],
                cfg.max_box_sphere_pairs)
        ss = mk(bp.ss_a, bp.ss_b, bp.ss_valid,
                sp.body[bp.ss_a], sp.body[bp.ss_b],
                slo[bp.ss_a], shi[bp.ss_a], slo[bp.ss_b], shi[bp.ss_b],
                cfg.max_sphere_sphere_pairs)
    else:
        empty = CandidatePairs(
            a=jnp.zeros((0,), jnp.int32), b=jnp.zeros((0,), jnp.int32),
            valid=jnp.zeros((0,), bool), count=jnp.zeros((), jnp.int32),
        )
        bs = ss = empty
    # bb.count stays the TRUE tight demand (pair telemetry); collide() ORs
    # bp.overflow into the step's overflow flag directly.
    return (bb, bs, ss), bp
