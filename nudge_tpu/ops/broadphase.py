"""Broadphase: world AABBs + candidate pair generation.

Reference (SURVEY.md C5, call stack §3.B): SIMD AABB computation, radix-sorted
sweep along one axis, packed u32 candidate pairs partitioned into
{box-box, box-sphere, sphere-sphere}, BodyConnections filtering.

TPU-native rebuild: AABBs are a trivial batched transform; pair generation is
a masked all-pairs test compacted to fixed capacity via `jnp.nonzero(size=)`
(O(N²) mask but tiny FLOPs — fine to a few thousand colliders, SURVEY §7 M1),
with a sorted-grid path for large scenes added at M4. Overflow sets a flag
instead of corrupting (SURVEY §4 item 7).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ..config import SimConfig
from ..mathx import quat_mul, quat_rotate, quat_to_mat
from ..state import SimState


class WorldColliders(NamedTuple):
    """Per-step world-space collider transforms (the reference recomputes the
    same inside collide())."""

    box_pos: jnp.ndarray     # f32[B,3]
    box_quat: jnp.ndarray    # f32[B,4]
    box_body: jnp.ndarray    # i32[B]
    sph_pos: jnp.ndarray     # f32[S,3]
    sph_body: jnp.ndarray    # i32[S]


@struct.dataclass
class CandidatePairs:
    """Fixed-capacity candidate pairs for one narrowphase class."""

    a: jnp.ndarray          # i32[P] collider index (first class)
    b: jnp.ndarray          # i32[P] collider index (second class)
    valid: jnp.ndarray      # bool[P]
    count: jnp.ndarray      # i32 true number of candidates (may exceed P)
    # overflow attribution (grid attaches it to the bb class): bit0 pair
    # capacity, bit1 grid cell-density budget, bit2 grid expand capacity.
    # None on paths that do not produce it (per-step persistent refilter).
    flags: jnp.ndarray = None  # i32, optional

    @property
    def overflow(self) -> jnp.ndarray:
        return self.count > self.a.shape[-1]


def world_colliders(state: SimState) -> WorldColliders:
    bd, bx, sp = state.bodies, state.boxes, state.spheres
    bq = bd.quat[bx.body]
    box_quat = quat_mul(bq, bx.lquat)
    box_pos = bd.pos[bx.body] + quat_rotate(bq, bx.lpos)
    sph_pos = bd.pos[sp.body] + quat_rotate(bd.quat[sp.body], sp.lpos)
    return WorldColliders(box_pos, box_quat, bx.body, sph_pos, sp.body)


def box_aabbs(half, wpos, wquat, margin: float):
    """World AABB of oriented boxes: extent_i = Σ_j |R_ij|·half_j (the
    classic |R|·h trick the reference uses SIMD-wide)."""
    R = quat_to_mat(wquat)
    ext = jnp.einsum("...ij,...j->...i", jnp.abs(R), half) + margin
    return wpos - ext, wpos + ext


def sphere_aabbs(radius, wpos, margin: float):
    ext = (radius + margin)[..., None]
    return wpos - ext, wpos + ext


def _aabb_overlap(lo_a, hi_a, lo_b, hi_b):
    """[Na,3] x [Nb,3] -> bool[Na,Nb]."""
    return jnp.all(
        (lo_a[:, None, :] <= hi_b[None, :, :])
        & (lo_b[None, :, :] <= hi_a[:, None, :]),
        axis=-1,
    )


def _connection_mask(body_a, body_b, connections):
    """bool[...]: True where the body pair is in the user-filtered list
    (BodyConnections, SURVEY C14)."""
    ca, cb = connections[:, 0], connections[:, 1]
    lo = jnp.minimum(body_a, body_b)[..., None]
    hi = jnp.maximum(body_a, body_b)[..., None]
    clo = jnp.minimum(ca, cb)[None, :]
    chi = jnp.maximum(ca, cb)[None, :]
    return jnp.any((lo == clo) & (hi == chi) & (ca >= 0)[None, :], axis=-1)


def compact_mask(mask_flat, cap: int):
    """Indices of the first `cap` True entries (ascending), via a single
    top-k-style sort — ~8x faster than jnp.nonzero(size=) on TPU for
    100k+ element masks. Returns (idx[cap], valid[cap], count)."""
    n = mask_flat.shape[0]
    keys = jnp.where(mask_flat, jnp.arange(n, dtype=jnp.int32),
                     jnp.int32(2 ** 30))
    idx = jax.lax.sort((keys,), num_keys=1)[0][:cap]
    if cap > n:  # capacity can exceed the mask (e.g. filtered cached pairs)
        idx = jnp.pad(idx, (0, cap - n))
    count = jnp.sum(mask_flat.astype(jnp.int32))
    valid = jnp.arange(cap) < jnp.minimum(count, cap)
    return jnp.where(valid, idx, 0), valid, count


def _compact_pairs(mask, cap: int, n_cols: int) -> CandidatePairs:
    idx, valid, count = compact_mask(mask.reshape(-1), cap)
    return CandidatePairs(
        a=(idx // n_cols).astype(jnp.int32),
        b=(idx % n_cols).astype(jnp.int32),
        valid=valid,
        count=count,
    )


def dead_mask(bodies, sleep, cfg: SimConfig):
    """bool[N]: bodies force-slept below the kill plane (SimConfig.
    kill_plane_y) — they have left the world for good and must leave the
    broadphase entirely. Round-3/4 TPU trace: ~1,350 tunneled boxes in
    eternal free fall dragged the grid's mean re-base anchor, blew the
    cell-density budget, and wrecked the LIVE pile's broadphase; merely
    force-sleeping them still left their colliders occupying grid cells.
    Returns None when the kill plane is off (no-op for the common case)."""
    if cfg.kill_plane_y <= -1e8 or not cfg.sleeping:
        return None
    return (bodies.dynamic & ~sleep.awake
            & (bodies.pos[:, 1] < cfg.kill_plane_y))


def _pair_filter(bodies, sleep, body_a, body_b, connections, cfg=None):
    """Common candidate filters: distinct bodies, not both non-moving
    (static or asleep — reference routes sleeping pairs aside, SURVEY C13),
    neither dead (below the kill plane), not user-connected."""
    moving = (bodies.inv_mass > 0.0) & sleep.awake
    keep = body_a != body_b
    keep &= moving[body_a] | moving[body_b]
    if cfg is not None:
        dead = dead_mask(bodies, sleep, cfg)
        if dead is not None:
            keep &= ~dead[body_a] & ~dead[body_b]
    if connections.shape[0] > 0:   # static skip for no-connections scenes
        keep &= ~_connection_mask(body_a, body_b, connections)
    return keep


def allpairs_broadphase(state: SimState, wc: WorldColliders, cfg: SimConfig):
    """Masked all-pairs broadphase. Returns (bb, bs, ss) CandidatePairs."""
    bodies, sleep = state.bodies, state.sleep
    bx, sp = state.boxes, state.spheres
    m = cfg.aabb_margin

    blo, bhi = box_aabbs(bx.half, wc.box_pos, wc.box_quat, m)
    slo, shi = sphere_aabbs(sp.radius, wc.sph_pos, m)

    nb = cfg.max_boxes
    ns = sp.radius.shape[0]

    # box-box: strict upper triangle
    bb_mask = _aabb_overlap(blo, bhi, blo, bhi)
    iu = jnp.arange(nb)
    bb_mask &= iu[:, None] < iu[None, :]
    bb_mask &= bx.valid[:, None] & bx.valid[None, :]
    bb_mask &= _pair_filter(
        bodies, sleep, bx.body[:, None], bx.body[None, :], state.connections,
        cfg,
    )
    bb = _compact_pairs(bb_mask, cfg.max_box_box_pairs, nb)

    if cfg.max_spheres > 0:
        bs_mask = _aabb_overlap(blo, bhi, slo, shi)
        bs_mask &= bx.valid[:, None] & sp.valid[None, :]
        bs_mask &= _pair_filter(
            bodies, sleep, bx.body[:, None], sp.body[None, :],
            state.connections, cfg,
        )
        bs = _compact_pairs(bs_mask, cfg.max_box_sphere_pairs, ns)

        ss_mask = _aabb_overlap(slo, shi, slo, shi)
        ju = jnp.arange(ns)
        ss_mask &= ju[:, None] < ju[None, :]
        ss_mask &= sp.valid[:, None] & sp.valid[None, :]
        ss_mask &= _pair_filter(
            bodies, sleep, sp.body[:, None], sp.body[None, :],
            state.connections, cfg,
        )
        ss = _compact_pairs(ss_mask, cfg.max_sphere_sphere_pairs, ns)
    else:
        empty = CandidatePairs(
            a=jnp.zeros((0,), jnp.int32), b=jnp.zeros((0,), jnp.int32),
            valid=jnp.zeros((0,), bool), count=jnp.zeros((), jnp.int32),
        )
        bs = ss = empty

    bb = bb.replace(flags=jnp.where(bb.overflow, 1, 0).astype(jnp.int32))
    return bb, bs, ss

