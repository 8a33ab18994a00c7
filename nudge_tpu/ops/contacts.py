"""Contact generation: narrowphase over candidate pairs + manifold compaction.

Rebuilds the contact-emitting half of the reference's collide() (SURVEY.md
§3.B): route candidate pairs to the three narrowphase kernels, tag every
contact point with its persistent identity (pair key + feature id, SURVEY C8),
and compact the results into a fixed-capacity *manifold* array.

Layout choice (differs from the reference's flat contact list, SURVEY C1):
contacts are kept grouped by collider pair — a manifold of up to
POINTS_PER_MANIFOLD points sharing (body_a, body_b, normal, friction). The
solver exploits this: one gather/scatter per manifold, sequential Gauss-Seidel
over the points inside (solver.py), coloring at manifold granularity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..config import SimConfig
from ..state import SimState
from . import narrowphase as nps
from .broadphase import (
    CandidatePairs, WorldColliders, allpairs_broadphase, compact_mask,
    world_colliders,
)

POINTS = nps.BOX_BOX_POINTS  # points per manifold (4)


@struct.dataclass
class Manifolds:
    """Fixed-capacity SoA contact manifolds (the ContactData analog,
    reference `nudge.h` — SURVEY §8, grouped by pair)."""

    body_a: jnp.ndarray       # i32[M]
    body_b: jnp.ndarray       # i32[M]
    ga: jnp.ndarray           # i32[M] first collider gid (pair identity)
    gb: jnp.ndarray           # i32[M] second collider gid
    normal: jnp.ndarray       # f32[M,3] world, from body_a to body_b
    friction: jnp.ndarray     # f32[M]
    pos: jnp.ndarray          # f32[M,P,3] world contact points
    depth: jnp.ndarray        # f32[M,P] penetration (> 0 where point_valid)
    feat: jnp.ndarray         # i32[M,P] feature ids
    point_valid: jnp.ndarray  # bool[M,P]
    valid: jnp.ndarray        # bool[M]
    count: jnp.ndarray        # i32 true manifold count (may exceed M)
    overflow: jnp.ndarray     # bool: any pair/manifold capacity exceeded
    # attribution bitmask for `overflow` (which capacity blew):
    # bit0 box-box pairs | bit1 box-sphere | bit2 sphere-sphere
    # bit3 manifold compaction | bit4 persistent-broadphase rebuild
    # bit5 grid cell-density budget | bit6 grid expand capacity
    overflow_bits: jnp.ndarray = None  # i32, optional (None in unit fixtures)
    # true candidate-pair demand this step (sum over classes; may exceed the
    # tight caps) — the telemetry that localizes pair-capacity pressure
    pair_demand: jnp.ndarray = None    # i32, optional

    @property
    def contact_count(self) -> jnp.ndarray:
        return jnp.sum(self.point_valid.astype(jnp.int32))


def _combine_friction(fa, fb):
    """Geometric-mean material combine."""
    return jnp.sqrt(jnp.maximum(fa * fb, 0.0))


def _pad_points(man_1pt):
    """Expand 1-point narrowphase output (box-sphere / sphere-sphere) to the
    P-slot manifold layout."""
    n = man_1pt["depth"].shape[0]
    pos = jnp.zeros((n, POINTS, 3), jnp.float32).at[:, 0].set(man_1pt["pos"])
    depth = jnp.zeros((n, POINTS), jnp.float32).at[:, 0].set(man_1pt["depth"])
    feat = jnp.zeros((n, POINTS), jnp.int32).at[:, 0].set(man_1pt["feat"])
    pv = jnp.zeros((n, POINTS), bool).at[:, 0].set(man_1pt["valid"])
    return pos, depth, feat, pv


def _use_np_kernel(cfg: SimConfig, n_boxes: int, n_pairs: int) -> bool:
    """Static (trace-time) choice of the Pallas box-box kernel."""
    from .narrowphase_kernel import np_kernel_fits

    if cfg.solver in ("pallas", "pallas_interpret"):
        return np_kernel_fits(n_boxes)
    return (cfg.solver == "auto" and jax.default_backend() == "tpu"
            and n_pairs >= 1024 and np_kernel_fits(n_boxes))


def narrowphase_all(state: SimState, wc: WorldColliders, bb: CandidatePairs,
                    bs: CandidatePairs, ss: CandidatePairs, cfg: SimConfig):
    """Narrowphase over all candidate pairs (Pallas kernel or vmapped jnp for
    box-box); returns per-pair manifold slot arrays of static length
    |bb| + |bs| + |ss|."""
    bx, sp = state.boxes, state.spheres
    parts = []

    if bb.a.shape[0] > 0 and _use_np_kernel(cfg, bx.half.shape[0],
                                            bb.a.shape[0]):
        from .narrowphase_kernel import box_box_pallas

        parts.append(box_box_pallas(
            bx, wc, bb, cfg, interpret=(cfg.solver == "pallas_interpret")))
    elif bb.a.shape[0] > 0:
        man = jax.vmap(nps.box_box)(
            bx.half[bb.a], wc.box_quat[bb.a], wc.box_pos[bb.a],
            bx.half[bb.b], wc.box_quat[bb.b], wc.box_pos[bb.b],
        )
        parts.append(dict(
            body_a=bx.body[bb.a],
            body_b=bx.body[bb.b],
            ga=bb.a.astype(jnp.int32),
            gb=bb.b.astype(jnp.int32),
            normal=man["normal"],
            friction=_combine_friction(bx.friction[bb.a], bx.friction[bb.b]),
            pos=man["pos"],
            depth=man["depth"],
            feat=man["feat"],
            point_valid=man["valid"] & bb.valid[:, None],
        ))

    n_sph_pairs = bs.a.shape[0] + ss.a.shape[0]
    n_colliders = bx.half.shape[0] + sp.radius.shape[0]  # unified table cols
    if n_sph_pairs > 0 and _use_np_kernel(cfg, n_colliders, n_sph_pairs):
        from .narrowphase_kernel import pairs_1pt_pallas

        parts.append(pairs_1pt_pallas(
            bx, sp, wc, bs, ss, cfg,
            interpret=(cfg.solver == "pallas_interpret")))
        bs = bs.replace(a=bs.a[:0], b=bs.b[:0], valid=bs.valid[:0])
        ss = ss.replace(a=ss.a[:0], b=ss.b[:0], valid=ss.valid[:0])

    if bs.a.shape[0] > 0:
        sph_gid = cfg.max_boxes + jnp.arange(sp.radius.shape[0], dtype=jnp.int32)
        man = jax.vmap(nps.box_sphere)(
            bx.half[bs.a], wc.box_quat[bs.a], wc.box_pos[bs.a],
            sp.radius[bs.b], wc.sph_pos[bs.b],
        )
        pos, depth, feat, pv = _pad_points(man)
        parts.append(dict(
            body_a=bx.body[bs.a],
            body_b=sp.body[bs.b],
            ga=bs.a.astype(jnp.int32),
            gb=sph_gid[bs.b],
            normal=man["normal"],
            friction=_combine_friction(bx.friction[bs.a], sp.friction[bs.b]),
            pos=pos, depth=depth, feat=feat,
            point_valid=pv & bs.valid[:, None],
        ))

    if ss.a.shape[0] > 0:
        sph_gid = cfg.max_boxes + jnp.arange(sp.radius.shape[0], dtype=jnp.int32)
        man = jax.vmap(nps.sphere_sphere)(
            sp.radius[ss.a], wc.sph_pos[ss.a],
            sp.radius[ss.b], wc.sph_pos[ss.b],
        )
        pos, depth, feat, pv = _pad_points(man)
        parts.append(dict(
            body_a=sp.body[ss.a],
            body_b=sp.body[ss.b],
            ga=sph_gid[ss.a],
            gb=sph_gid[ss.b],
            normal=man["normal"],
            friction=_combine_friction(sp.friction[ss.a], sp.friction[ss.b]),
            pos=pos, depth=depth, feat=feat,
            point_valid=pv & ss.valid[:, None],
        ))

    return {
        k: jnp.concatenate([p[k] for p in parts], axis=0) for k in parts[0]
    }


def compact_manifolds(slots: dict, cfg: SimConfig, pair_overflow,
                      pair_bits=None) -> Manifolds:
    """Pack pairs that produced any contact to the front of a fixed-capacity
    manifold array (capacity = cfg.max_manifolds).

    Overflow degrades by DEPTH priority: when demand exceeds capacity the
    shallowest manifolds are dropped, never the deep load-bearing ones.
    Index-ordered dropping (compact_mask) loses ground/support contacts
    under the transient pair spike of a pile impact, which free-falls the
    affected bodies into the floor and feeds the overlap->pairs->overflow
    loop (round-3 20,480 trace: depth 0.24 -> 2.96 in the first overflowing
    chunk). Kept manifolds stay in original (spatially coherent) order."""
    cap = cfg.max_manifolds
    if pair_bits is None:
        pair_bits = jnp.where(pair_overflow, 1, 0).astype(jnp.int32)
    has_contact = jnp.any(slots["point_valid"], axis=-1)
    n = has_contact.shape[0]
    if n <= cap:
        idx, valid, count = compact_mask(has_contact, cap)
    else:
        depth = jnp.max(
            jnp.where(slots["point_valid"], slots["depth"], -jnp.inf), -1)
        key = jnp.where(has_contact, -depth, jnp.inf)   # deepest first
        order = jnp.argsort(key)
        count = jnp.sum(has_contact.astype(jnp.int32))
        kept = jnp.arange(cap) < jnp.minimum(count, cap)
        # push dropped/invalid slots to the back, restore index order in front
        sel = jnp.where(kept, order[:cap], jnp.int32(2 ** 30))
        idx = jax.lax.sort((sel,), num_keys=1)[0]
        valid = kept                  # prefix again after the back-sort
        idx = jnp.where(valid, idx, 0)

    def take(x, fill=0):
        out = x[idx]
        mask = valid.reshape(valid.shape + (1,) * (out.ndim - 1))
        return jnp.where(mask, out, fill)

    return Manifolds(
        body_a=take(slots["body_a"]),
        body_b=take(slots["body_b"]),
        ga=take(slots["ga"], fill=jnp.iinfo(jnp.int32).max),
        gb=take(slots["gb"], fill=jnp.iinfo(jnp.int32).max),
        normal=take(slots["normal"]),
        friction=take(slots["friction"]),
        pos=take(slots["pos"]),
        depth=take(slots["depth"]),
        feat=take(slots["feat"]),
        point_valid=take(slots["point_valid"], fill=False),
        valid=valid,
        count=count,
        overflow=(count > cap) | pair_overflow,
        overflow_bits=(jnp.where(count > cap, 8, 0)
                       .astype(jnp.int32) | pair_bits),
    )


def _base_broadphase(cfg: SimConfig):
    mode = cfg.broadphase
    if mode == "auto":
        mode = "grid" if cfg.num_colliders > 1024 else "allpairs"
    if mode == "grid":
        from .grid import grid_broadphase

        return grid_broadphase
    return allpairs_broadphase


def collide(state: SimState, cfg: SimConfig):
    """Broadphase + narrowphase + compaction — the reference's
    nudge::collide() (SURVEY §3.B) as one pure function.
    Returns (Manifolds, BPCache) — the cache threads the amortized
    broadphase between steps (ops/persistent_bp)."""
    wc = world_colliders(state)
    base = _base_broadphase(cfg)
    if cfg.persistent_broadphase:
        from .persistent_bp import persistent_broadphase

        # sleep filtering happens per step on cached pairs; rebuild caches
        # pairs as if everything were awake so waking islands reconnect
        # instantly — except DEAD bodies (below the kill plane), which never
        # wake and must stay out of the rebuild grid and its mean anchor
        from .broadphase import dead_mask

        dead = dead_mask(state.bodies, state.sleep, cfg)
        rb_awake = jnp.ones_like(state.sleep.awake)
        if dead is not None:
            rb_awake = rb_awake & ~dead
        awake_state = state.replace(
            sleep=state.sleep.replace(awake=rb_awake))

        def base_awake(st, wcx, cfgx):
            return base(awake_state, wcx, cfgx)

        (bb, bs, ss), bp = persistent_broadphase(state, wc, cfg, base_awake)
    else:
        bb, bs, ss = base(state, wc, cfg)
        bp = state.bp
    slots = narrowphase_all(state, wc, bb, bs, ss, cfg)
    # bit0 is precise: true class demand > tight capacity (counts are no
    # longer forced past cap as an overflow sentinel — ADVICE r3). Grid
    # density/expand drops attribute to bits 5/6 and still raise the step
    # overflow flag via flags != 0.
    pair_overflow = bb.overflow
    bits = jnp.where(bb.overflow, 1, 0).astype(jnp.int32)
    pair_demand = bb.count
    if bs.a.shape[0] > 0:
        pair_overflow |= bs.overflow
        bits |= jnp.where(bs.overflow, 2, 0).astype(jnp.int32)
        pair_demand = pair_demand + bs.count
    if ss.a.shape[0] > 0:
        pair_overflow |= ss.overflow
        bits |= jnp.where(ss.overflow, 4, 0).astype(jnp.int32)
        pair_demand = pair_demand + ss.count
    if bb.flags is not None:        # grid pair/density/expand -> bits 0/5/6
        pair_overflow |= bb.flags != 0
        bits |= jnp.where(bb.flags & 1, 1, 0).astype(jnp.int32)
        bits |= ((bb.flags >> 1) & 3) << 5
    if cfg.persistent_broadphase:
        # rebuild-time drops poison every reuse step until the next rebuild
        pair_overflow |= bp.overflow
        bits |= jnp.where(bp.overflow, 16, 0).astype(jnp.int32)
        bits |= jnp.where(bp.overflow, ((bp.flags >> 1) & 3) << 5, 0)
    man = compact_manifolds(slots, cfg, pair_overflow, pair_bits=bits)
    return man.replace(pair_demand=pair_demand), bp
