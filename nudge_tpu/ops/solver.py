"""Warm-started sequential-impulse contact solver over colored manifolds.

Reference (SURVEY.md C10/C11, §3.C): setup_contact_constraints sorts contacts
by body pair, packs them into SIMD-width batches with no body repeated per
batch (conflict-free lanes), precomputes contact frames / effective masses /
Baumgarte bias, and applies warm-start impulses; apply_impulses then runs ~20
Gauss-Seidel sweeps over the batches.

TPU-native recast (SURVEY §7 M3 + north star): the batch structure becomes a
*manifold coloring* — collider-pair manifolds are greedily colored so no color
touches a dynamic body twice. The solve is sequential over colors
(Gauss-Seidel ordering), parallel across the manifolds of a color (lanes),
and sequential over the <=4 points *inside* each manifold with velocities held
in registers (exact Gauss-Seidel within the manifold, one gather + one scatter
per manifold per pass). Static bodies are exempt from coloring conflicts —
their momentum is never written — which keeps the color count at the dynamic
pair-degree even though e.g. the ground touches everything.

Manifolds past the color budget land in the last color with an
under-relaxation factor 1/degree (mass-splitting), which keeps the spilled
Jacobi update contractive instead of explosive.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..config import CONTACT_POINTS, SimConfig
from ..mathx import cross, dot, orthonormal_basis, quat_rotate, quat_rotate_inv
from ..state import Bodies
from .contacts import Manifolds

_INF_I32 = jnp.iinfo(jnp.int32).max


def _inv_inertia_apply(quat, inv_inertia_diag, v):
    """World-space I⁻¹·v for a diagonal body-frame inverse inertia:
    R · (I⁻¹_diag ⊙ (Rᵀ v))."""
    return quat_rotate(quat, inv_inertia_diag * quat_rotate_inv(quat, v))


@struct.dataclass
class ContactConstraints:
    """Precomputed per-manifold-point solve data (the reference's opaque
    ContactConstraintData, SURVEY C10). P = CONTACT_POINTS."""

    body_a: jnp.ndarray     # i32[M]
    body_b: jnp.ndarray     # i32[M]
    n: jnp.ndarray          # f32[M,3] contact normal (a->b), shared
    t1: jnp.ndarray         # f32[M,3] tangent, shared
    t2: jnp.ndarray         # f32[M,3] tangent, shared
    ra: jnp.ndarray         # f32[M,P,3] contact offsets from body a COM
    rb: jnp.ndarray         # f32[M,P,3]
    # angular response vectors I⁻¹(r × d) for d in (n, t1, t2), both bodies
    jna: jnp.ndarray        # f32[M,P,3]
    jnb: jnp.ndarray
    jt1a: jnp.ndarray
    jt1b: jnp.ndarray
    jt2a: jnp.ndarray
    jt2b: jnp.ndarray
    mn: jnp.ndarray         # f32[M,P] effective masses
    mt1: jnp.ndarray
    mt2: jnp.ndarray
    bias: jnp.ndarray       # f32[M,P] target separating velocity (>= 0)
    pos_bias: jnp.ndarray   # f32[M,P] pseudo-velocity target (split impulse)
    pwarm: jnp.ndarray      # f32[M,P] warm-start pseudo impulses (cache) —
                            # the pseudo solve is quasi-static at rest, so
                            # seeding it removes the under-convergence creep
                            # observed on deep piles (docs/PERF_NOTES.md)
    mu: jnp.ndarray         # f32[M]
    im_a: jnp.ndarray       # f32[M]
    im_b: jnp.ndarray
    relax: jnp.ndarray      # f32[M] under-relaxation (1 except spilled)
    color: jnp.ndarray      # i32[M]
    n_colors: jnp.ndarray   # i32 colors actually used
    point_valid: jnp.ndarray  # bool[M,P]
    valid: jnp.ndarray      # bool[M]
    spill_count: jnp.ndarray  # i32 manifolds past the color budget


def order_colors_by_height(color, man: Manifolds, cfg: SimConfig):
    """Relabel colors so the sequential color sweep runs BOTTOM-UP (shock
    propagation). Colored Gauss-Seidel propagates a contact shock roughly
    one graph layer per sweep when color order is arbitrary — a 26-layer
    pile needs >26 iterations just to feel the ground, and the bottom boxes
    creep downward on the unresolved residual until the pile implodes
    (round-3 20,480 trace). The reference gets bottom-up ordering for free:
    its sequential sweep follows memory order = spawn order = layer order.
    Here: rank colors by mean contact height ascending each step; the
    relabel is a bijection on 0..max_colors-1, so conflict-freedom, spill
    relaxation, and n_colors are untouched. The parked sentinel
    (== max_colors) stays fixed. Cost: one segment-mean + tiny argsort.
    "Height" is the projection onto -gravity (ADVICE r3: hardcoding +y
    silently degraded to arbitrary order under tilted gravity)."""
    K = cfg.max_colors
    g = jnp.asarray(cfg.gravity, jnp.float32)
    up = -g / jnp.maximum(jnp.linalg.norm(g), 1e-9)
    h = jnp.einsum("mpc,c->mp", man.pos, up)
    y = jnp.sum(jnp.where(man.point_valid, h, 0.0), -1) \
        / jnp.maximum(jnp.sum(man.point_valid.astype(jnp.float32), -1), 1.0)
    ok = man.valid & (color >= 0) & (color < K)
    idx = jnp.where(ok, color, K)
    csum = jnp.zeros((K + 1,), jnp.float32).at[idx].add(jnp.where(ok, y, 0.0))
    ccnt = jnp.zeros((K + 1,), jnp.float32).at[idx].add(ok.astype(jnp.float32))
    mean = jnp.where(ccnt[:K] > 0, csum[:K] / jnp.maximum(ccnt[:K], 1.0),
                     jnp.inf)                     # empty colors sort last
    order = jnp.argsort(mean)                     # lowest color first
    rank = jnp.zeros((K + 1,), jnp.int32).at[order].set(
        jnp.arange(K, dtype=jnp.int32))
    rank = rank.at[K].set(K)
    return rank[jnp.clip(color, 0, K)]


def color_manifolds(man: Manifolds, bodies: Bodies, cfg: SimConfig):
    """Greedy manifold graph coloring via iterated scatter-min claims.

    Per round, every uncolored manifold tries to claim both its dynamic
    bodies with its slot index; it wins iff both bodies report its index
    (deterministic tie-break by smallest index). Winners take the round's
    color — so within a color no dynamic body is written twice. This is the
    reference's conflict-free batch packing (SURVEY C10) computed on-device.

    Returns (color[M], n_colors, relax[M], spill_count).
    """
    n_bodies = bodies.pos.shape[0]
    dyn = bodies.inv_mass > 0.0
    dyn_a = dyn[man.body_a]
    dyn_b = dyn[man.body_b]
    m = man.ga.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)

    def round_fn(state):
        c, color = state
        # Luby-style random priority per round: XOR-ing the index with a
        # hashed round constant is a bijection (tokens stay unique, so the
        # conflict-free invariant holds exactly) but randomizes the order,
        # making per-round independent sets much larger than min-index greedy
        # (which stalls on chains). Deterministic across runs.
        h = (c + 1) * jnp.uint32(0x9E3779B9).astype(jnp.int32)
        h = (h ^ (h >> 13)) * jnp.uint32(0x85EBCA6B).astype(jnp.int32)
        token = idx ^ (h & jnp.int32(0x3FFFFF))  # <2^23: f32-exact
        uncolored = man.valid & (color < 0)
        token_a = jnp.where(uncolored & dyn_a, token, _INF_I32)
        token_b = jnp.where(uncolored & dyn_b, token, _INF_I32)
        claim = jnp.full((n_bodies,), _INF_I32, jnp.int32)
        claim = claim.at[man.body_a].min(token_a)
        claim = claim.at[man.body_b].min(token_b)
        ok_a = ~dyn_a | (claim[man.body_a] == token)
        ok_b = ~dyn_b | (claim[man.body_b] == token)
        win = uncolored & ok_a & ok_b
        return c + 1, jnp.where(win, c, color)

    def has_uncolored(state):
        c, color = state
        return (c < cfg.max_colors - 1) & jnp.any(man.valid & (color < 0))

    from .coloring_kernel import color_manifolds_pallas, coloring_fits

    if cfg.solver in ("pallas", "pallas_interpret") or (
            cfg.solver == "auto" and jax.default_backend() == "tpu"
            and coloring_fits(m, n_bodies)):

        color = color_manifolds_pallas(
            man.body_a, man.body_b, man.valid, dyn, n_bodies,
            cfg.max_colors, interpret=(cfg.solver == "pallas_interpret"))
        color = jnp.where(color == cfg.max_colors, -1, color)
        color = jnp.where(man.valid, color, -1)
    else:
        color = jnp.full_like(man.ga, -1)
        _, color = jax.lax.while_loop(
            has_uncolored, round_fn, (jnp.int32(0), color)
        )
    color, relax, spilled = _spill_relax(
        man, color, dyn_a, dyn_b, n_bodies, cfg)
    color = order_colors_by_height(color, man, cfg)

    n_used = jnp.max(jnp.where(man.valid, color, -1)) + 1
    return color, n_used, relax, jnp.sum(spilled.astype(jnp.int32))


def _spill_relax(man, color, dyn_a, dyn_b, n_bodies, cfg):
    """Shared spill handling: park invalid, send still-uncolored manifolds
    to the last color with 1/degree under-relaxation (mass splitting)."""
    spilled = man.valid & (color < 0)
    color = jnp.where(spilled, cfg.max_colors - 1, color)
    color = jnp.where(man.valid, color, cfg.max_colors)
    deg = jnp.zeros((n_bodies,), jnp.int32)
    deg = deg.at[man.body_a].add(jnp.where(spilled & dyn_a, 1, 0))
    deg = deg.at[man.body_b].add(jnp.where(spilled & dyn_b, 1, 0))
    mdeg = jnp.maximum(
        jnp.where(dyn_a, deg[man.body_a], 0),
        jnp.where(dyn_b, deg[man.body_b], 0),
    )
    relax = jnp.where(
        spilled, 1.0 / jnp.maximum(mdeg.astype(jnp.float32), 1.0), 1.0
    )
    return color, relax, spilled


def color_manifolds_cached(man: Manifolds, bodies: Bodies, cfg: SimConfig,
                           ccache):
    """Incremental coloring (SimConfig.persistent_coloring): join last
    frame's colors by manifold identity (ga, gb) — mutually conflict-free by
    construction, since both manifolds coexisted conflict-free last frame —
    then run greedy claim rounds ONLY for new manifolds, with a per-body
    forbidden-color table so new colors never collide with cached ones.
    Settled scenes: every manifold hits, zero rounds run.

    Returns ((color, n_colors, relax, spill_count), new ColorCache)."""
    from ..state import ColorCache
    from .cache import _join, join_i32

    n_bodies = bodies.pos.shape[0]
    dyn = bodies.inv_mass > 0.0
    dyn_a = dyn[man.body_a]
    dyn_b = dyn[man.body_b]
    m = man.ga.shape[0]
    bits = dyn_a.astype(jnp.int32) + 2 * dyn_b.astype(jnp.int32)
    # packed single-i32-key join (key = ga*n_gids+gb, payload =
    # (color+1) | dynbits<<8) sorts 3 arrays instead of 8 — the join runs
    # every step, so its sort is the persistent path's main cost; only
    # scenes with >32k collider gids fall back to the generic 4-key join
    n_gids = cfg.max_boxes + cfg.max_spheres
    packed = n_gids * n_gids < 2 ** 30 - 1 and cfg.max_colors < 255

    def slow(_):
        if packed:
            hitp = join_i32(
                ccache.ga * n_gids + ccache.gb,
                (ccache.color + 1) | (ccache.dynbits << 8),
                ccache.valid,
                jnp.where(man.valid, man.ga * n_gids + man.gb, 0),
                man.valid)
            hit = (hitp & 255).astype(jnp.float32)
            cached_bits = hitp >> 8
        else:
            zc = jnp.zeros((ccache.ga.shape[0],), jnp.int32)
            zm = jnp.zeros((m,), jnp.int32)
            # colors < 2^24 are f32-exact; +1 -> a join miss (0.0) is clear
            payload = jnp.stack([
                ccache.color.astype(jnp.float32) + 1.0,
                ccache.dynbits.astype(jnp.float32),
                jnp.zeros_like(zc, dtype=jnp.float32),
            ], axis=-1)
            joined = _join(ccache.ga, ccache.gb, zc, payload, ccache.valid,
                           man.ga, man.gb, zm, man.valid)
            hit = joined[:, 0]
            cached_bits = joined[:, 1].astype(jnp.int32)
        # a hit is only trusted if no side became MORE dynamic than when it
        # was colored (a waking body adds conflict edges the cached coloring
        # never saw — see ColorCache.dynbits). Falling asleep only REMOVES
        # conflicts, so the monotone check keeps those colors: requiring
        # exact equality invalidated every manifold touching each newly-
        # sleeping body, re-running greedy claim rounds every settle step.
        fresh = (bits & ~cached_bits) == 0
        color = jnp.where(man.valid & (hit > 0.5) & fresh,
                          hit.astype(jnp.int32) - 1, -1)

        # forbidden-color table from the cached assignment
        forbid = jnp.zeros((n_bodies, cfg.max_colors), bool)
        okc = color >= 0
        cc = jnp.clip(color, 0, cfg.max_colors - 1)
        forbid = forbid.at[man.body_a, cc].max(okc & dyn_a)
        forbid = forbid.at[man.body_b, cc].max(okc & dyn_b)

        idx = jnp.arange(m, dtype=jnp.int32)

        def round_fn(state):
            c, color, forbid = state
            h = (c + 1) * jnp.uint32(0x9E3779B9).astype(jnp.int32)
            h = (h ^ (h >> 13)) * jnp.uint32(0x85EBCA6B).astype(jnp.int32)
            token = idx ^ (h & jnp.int32(0x3FFFFF))
            uncolored = man.valid & (color < 0)
            elig = (uncolored
                    & (~forbid[man.body_a, c] | ~dyn_a)
                    & (~forbid[man.body_b, c] | ~dyn_b))
            token_a = jnp.where(elig & dyn_a, token, _INF_I32)
            token_b = jnp.where(elig & dyn_b, token, _INF_I32)
            claim = jnp.full((n_bodies,), _INF_I32, jnp.int32)
            claim = claim.at[man.body_a].min(token_a)
            claim = claim.at[man.body_b].min(token_b)
            ok_a = ~dyn_a | (claim[man.body_a] == token)
            ok_b = ~dyn_b | (claim[man.body_b] == token)
            win = elig & ok_a & ok_b
            color = jnp.where(win, c, color)
            forbid = forbid.at[man.body_a, c].max(win & dyn_a)
            forbid = forbid.at[man.body_b, c].max(win & dyn_b)
            return c + 1, color, forbid

        def has_uncolored(state):
            c, color, _ = state
            return (c < cfg.max_colors - 1) & jnp.any(man.valid & (color < 0))

        _, color, _ = jax.lax.while_loop(
            has_uncolored, round_fn, (jnp.int32(0), color, forbid))

        return _spill_relax(man, color, dyn_a, dyn_b, n_bodies, cfg)

    # Aligned fast path (SimConfig.aligned_fast_path): the color cache is
    # stored in manifold-slot order; when every valid manifold's SAME-SLOT
    # cache row carries its (ga, gb) and its dynbits still hold, the join
    # result IS the cache row (pair keys are unique) and no greedy rounds
    # are needed — drop ~62 ms of sort-join per settled 20,480-pile step.
    if (cfg.aligned_fast_path and not cfg.differentiable
            and ccache.ga.shape[0] == m):
        aligned = jnp.all(
            (ccache.valid == man.valid)
            & (~man.valid | ((ccache.ga == man.ga) & (ccache.gb == man.gb)
                             & ((bits & ~ccache.dynbits) == 0))))

        def fast(_):
            color = jnp.where(man.valid, ccache.color, cfg.max_colors)
            return (color, jnp.ones((m,), jnp.float32),
                    jnp.zeros((m,), bool))

        color, relax, spilled = jax.lax.cond(aligned, fast, slow, None)
    else:
        color, relax, spilled = slow(None)

    new_cache = ColorCache(
        ga=man.ga, gb=man.gb,
        # the cache keeps the STABLE labels (pre height-rank) so joins don't
        # churn as the pile's height profile evolves
        color=jnp.where(man.valid, color, 0),
        # spilled manifolds carry under-relaxation, not a real slot — they
        # retry a proper color next frame rather than pinning the spill color
        valid=man.valid & ~spilled,
        dynbits=bits,
    )
    color = order_colors_by_height(color, man, cfg)
    n_used = jnp.max(jnp.where(man.valid, color, -1)) + 1
    return ((color, n_used, relax,
             jnp.sum(spilled.astype(jnp.int32))), new_cache)


def setup_constraints(bodies: Bodies, man: Manifolds,
                      warm_impulse: jnp.ndarray, cfg: SimConfig,
                      coloring=None, pwarm=None):
    """Precompute contact frames, effective masses, bias; apply warm-start
    impulses to body momentum (reference: setup_contact_constraints,
    SURVEY §3.C). `warm_impulse` is f32[M,P,3] world impulses from the cache;
    `pwarm` is the cached f32[M,P] pseudo normal impulses (split impulse).
    Returns (constraints, bodies, acc) with acc = (λn, λt1, λt2) each [M,P].
    """
    ba, bb_ = man.body_a, man.body_b
    n = man.normal
    t1, t2 = orthonormal_basis(n)
    ra = man.pos - bodies.pos[ba][:, None, :]
    rb = man.pos - bodies.pos[bb_][:, None, :]
    im_a = bodies.inv_mass[ba]
    im_b = bodies.inv_mass[bb_]
    qa, qb = bodies.quat[ba], bodies.quat[bb_]
    ii_a, ii_b = bodies.inv_inertia[ba], bodies.inv_inertia[bb_]

    def eff(d):
        dP = d[:, None, :]                      # broadcast over points
        rna = cross(ra, dP)
        rnb = cross(rb, dP)
        ja = _inv_inertia_apply(qa[:, None, :], ii_a[:, None, :], rna)
        jb = _inv_inertia_apply(qb[:, None, :], ii_b[:, None, :], rnb)
        k = im_a[:, None] + im_b[:, None] + dot(rna, ja) + dot(rnb, jb)
        m = jnp.where(k > 0.0, 1.0 / jnp.maximum(k, 1e-12), 0.0)
        return ja, jb, m

    jna, jnb, mn = eff(n)
    jt1a, jt1b, mt1 = eff(t1)
    jt2a, jt2b, mt2 = eff(t2)

    # position bias (Baumgarte, capped — see SimConfig.max_bias_vel): into
    # the velocity solve classically, or into the pseudo-velocity channel
    # under split impulse (never injects momentum/energy there)
    baum = jnp.minimum(
        cfg.baumgarte / cfg.dt * jnp.maximum(man.depth - cfg.slop, 0.0),
        cfg.max_bias_vel)
    need_vn0 = cfg.restitution > 0.0 or (
        cfg.split_impulse and cfg.deep_bias_gate >= 0.0)
    if need_vn0:
        vrel0 = (
            (bodies.vel[bb_][:, None] + cross(bodies.angvel[bb_][:, None], rb))
            - (bodies.vel[ba][:, None] + cross(bodies.angvel[ba][:, None], ra))
        )
        vn0 = dot(vrel0, n[:, None])
    if cfg.split_impulse:
        # emergency decompression above deep_bias_depth (see SimConfig)
        bias = jnp.minimum(
            cfg.baumgarte / cfg.dt
            * jnp.maximum(man.depth - cfg.deep_bias_depth, 0.0),
            cfg.max_bias_vel)
        if cfg.deep_bias_gate >= 0.0:
            # only counteract ACTIVE compression (see SimConfig.deep_bias_gate)
            bias = jnp.minimum(
                bias, jnp.maximum(-vn0 - cfg.deep_bias_gate, 0.0))
            # ungated anti-creep floor: quasi-static compaction slips under
            # the gate (see SimConfig.deep_bias_ungated_depth)
            bias = jnp.maximum(bias, jnp.minimum(
                cfg.baumgarte / cfg.dt
                * jnp.maximum(man.depth - cfg.deep_bias_ungated_depth, 0.0),
                cfg.deep_bias_ungated_vel))
        # pseudo channel gets its own (much higher) cap: position-only
        # corrections carry no momentum, and they must outrun the
        # under-converged column creep (see SimConfig.max_pseudo_vel)
        pos_bias = jnp.minimum(
            cfg.baumgarte / cfg.dt * jnp.maximum(man.depth - cfg.slop, 0.0),
            cfg.max_pseudo_vel)
    else:
        bias = baum
        pos_bias = jnp.zeros_like(baum)
    if cfg.restitution > 0.0:
        bias = jnp.maximum(bias, cfg.restitution * jnp.maximum(-vn0 - 1.0, 0.0))

    if coloring is None:
        coloring = color_manifolds(man, bodies, cfg)
    color, n_colors, relax, spill = coloring

    if pwarm is None or not (cfg.split_impulse and cfg.warm_start):
        pwarm = jnp.zeros_like(mn)
    con = ContactConstraints(
        body_a=ba, body_b=bb_, n=n, t1=t1, t2=t2, ra=ra, rb=rb,
        jna=jna, jnb=jnb, jt1a=jt1a, jt1b=jt1b, jt2a=jt2a, jt2b=jt2b,
        mn=mn, mt1=mt1, mt2=mt2, bias=bias, pos_bias=pos_bias,
        pwarm=jnp.where(man.point_valid, pwarm, 0.0),
        mu=man.friction,
        im_a=im_a, im_b=im_b, relax=relax, color=color, n_colors=n_colors,
        point_valid=man.point_valid, valid=man.valid, spill_count=spill,
    )

    # --- warm start: project cached world impulses onto the new frames and
    # apply to body momentum now (the reference does this in setup) ---
    if cfg.warm_start:
        acc_n = jnp.maximum(dot(warm_impulse, n[:, None]), 0.0)
        bound = man.friction[:, None] * acc_n
        acc_t1 = jnp.clip(dot(warm_impulse, t1[:, None]), -bound, bound)
        acc_t2 = jnp.clip(dot(warm_impulse, t2[:, None]), -bound, bound)
    else:
        acc_n = jnp.zeros_like(mn)
        acc_t1 = jnp.zeros_like(mn)
        acc_t2 = jnp.zeros_like(mn)
    pv = man.point_valid
    acc_n = jnp.where(pv, acc_n, 0.0)
    acc_t1 = jnp.where(pv, acc_t1, 0.0)
    acc_t2 = jnp.where(pv, acc_t2, 0.0)

    bodies = _apply_manifold_impulses(bodies, con, acc_n, acc_t1, acc_t2)
    return con, bodies, (acc_n, acc_t1, acc_t2)


def _apply_manifold_impulses(bodies, con, ln, lt1, lt2):
    """Scatter the summed impulse of each manifold's points to its bodies
    (used for warm starting; scatter-add tolerates body duplicates)."""
    pv = con.point_valid
    ln = jnp.where(pv, ln, 0.0)
    lt1 = jnp.where(pv, lt1, 0.0)
    lt2 = jnp.where(pv, lt2, 0.0)
    P = (jnp.sum(ln, 1)[:, None] * con.n + jnp.sum(lt1, 1)[:, None] * con.t1
         + jnp.sum(lt2, 1)[:, None] * con.t2)
    dw_a = jnp.sum(ln[..., None] * con.jna + lt1[..., None] * con.jt1a
                   + lt2[..., None] * con.jt2a, axis=1)
    dw_b = jnp.sum(ln[..., None] * con.jnb + lt1[..., None] * con.jt1b
                   + lt2[..., None] * con.jt2b, axis=1)
    vel = bodies.vel.at[con.body_a].add(-P * con.im_a[:, None])
    vel = vel.at[con.body_b].add(P * con.im_b[:, None])
    angvel = bodies.angvel.at[con.body_a].add(-dw_a)
    angvel = angvel.at[con.body_b].add(dw_b)
    return bodies.replace(vel=vel, angvel=angvel)


def solve(bodies: Bodies, con: ContactConstraints, acc, cfg: SimConfig):
    """Iterated impulse solve (the reference's apply_impulses hot loop,
    SURVEY C11): `solver_iters` sweeps, sequential over colors, parallel
    across manifolds of a color, sequential over the points of a manifold
    with velocities kept in registers.

    Under cfg.split_impulse a pseudo-velocity normal solve runs in the same
    sweeps against `pos_bias`, with its own ACCUMULATED pseudo impulses
    (clamped >= 0 like the real normal impulses — without the accumulator,
    conflicting pushes cannot be pulled back within a step and the
    per-step overshoot becomes a gravity-powered energy pump on deep
    piles: overshoot -> lift -> fall, observed as KE growth at 2048+).
    The pseudo result moves positions only (engine.step applies it) and
    never feeds momentum; its accumulators warm-start from `con.pwarm` (the
    quasi-static correction field changes slowly, so seeding removes the
    re-converge-from-zero under-convergence that left deep piles restless)
    and are returned for the cache.

    Returns (bodies, acc, (pseudo_vel, pseudo_angvel), pseudo_acc[M,P])."""
    acc_n, acc_t1, acc_t2 = acc
    # Differentiable mode trades the dynamic trip count (reverse-mode AD
    # rejects dynamic fori_loop bounds) for a static max_colors sweep;
    # passes whose color is unused match no manifolds and are exact no-ops.
    if cfg.differentiable:
        n_colors = cfg.max_colors
    else:
        n_colors = jnp.maximum(con.n_colors, 1)
    split = cfg.split_impulse
    pfric = split and cfg.pseudo_friction

    def pass_fn(i, carry):
        vel, angvel, pvel, pang, acc_n, acc_t1, acc_t2, pacc = carry
        c = jnp.mod(i, n_colors)
        mask = con.valid & (con.color == c)
        relax = jnp.where(mask, con.relax, 0.0)

        va = vel[con.body_a]
        vb = vel[con.body_b]
        wa = angvel[con.body_a]
        wb = angvel[con.body_b]
        pva = pvel[con.body_a]
        pvb = pvel[con.body_b]
        pwa = pang[con.body_a]
        pwb = pang[con.body_b]

        dlns, dlt1s, dlt2s = [], [], []
        # sequential Gauss-Seidel over the manifold's points, velocities live
        # in registers between points (unrolled: CONTACT_POINTS is small)
        for p in range(CONTACT_POINTS):
            pm = relax * con.point_valid[:, p]
            vrel = vb + cross(wb, con.rb[:, p]) - va - cross(wa, con.ra[:, p])

            vn = dot(vrel, con.n)
            dln = (con.bias[:, p] - vn) * con.mn[:, p]
            new_n = jnp.maximum(acc_n[:, p] + dln, 0.0)
            dln = pm * (new_n - acc_n[:, p])

            bound = con.mu * (acc_n[:, p] + dln
                              + (pacc[:, p] if pfric else 0.0))
            vt1 = dot(vrel, con.t1)
            new_t1 = jnp.clip(acc_t1[:, p] - vt1 * con.mt1[:, p], -bound, bound)
            dlt1 = pm * (new_t1 - acc_t1[:, p])
            vt2 = dot(vrel, con.t2)
            new_t2 = jnp.clip(acc_t2[:, p] - vt2 * con.mt2[:, p], -bound, bound)
            dlt2 = pm * (new_t2 - acc_t2[:, p])

            Pimp = (dln[:, None] * con.n + dlt1[:, None] * con.t1
                    + dlt2[:, None] * con.t2)
            va = va - Pimp * con.im_a[:, None]
            vb = vb + Pimp * con.im_b[:, None]
            wa = wa - (dln[:, None] * con.jna[:, p]
                       + dlt1[:, None] * con.jt1a[:, p]
                       + dlt2[:, None] * con.jt2a[:, p])
            wb = wb + (dln[:, None] * con.jnb[:, p]
                       + dlt1[:, None] * con.jt1b[:, p]
                       + dlt2[:, None] * con.jt2b[:, p])
            dlns.append(dln)
            dlt1s.append(dlt1)
            dlt2s.append(dlt2)

            if split:
                pvrel = (pvb + cross(pwb, con.rb[:, p])
                         - pva - cross(pwa, con.ra[:, p]))
                pvn = dot(pvrel, con.n)
                dlp = (con.pos_bias[:, p] - pvn) * con.mn[:, p]
                new_p = jnp.maximum(pacc[:, p] + dlp, 0.0)
                dlp = pm * (new_p - pacc[:, p])
                pacc = pacc.at[:, p].add(dlp)
                Pp = dlp[:, None] * con.n
                pva = pva - Pp * con.im_a[:, None]
                pvb = pvb + Pp * con.im_b[:, None]
                pwa = pwa - dlp[:, None] * con.jna[:, p]
                pwb = pwb + dlp[:, None] * con.jnb[:, p]

        acc_n = acc_n + jnp.stack(dlns, axis=1)
        acc_t1 = acc_t1 + jnp.stack(dlt1s, axis=1)
        acc_t2 = acc_t2 + jnp.stack(dlt2s, axis=1)

        # one scatter per manifold: write the net velocity change
        mcol = mask[:, None]
        vel = vel.at[con.body_a].add(jnp.where(mcol, va - vel[con.body_a], 0.0))
        vel = vel.at[con.body_b].add(jnp.where(mcol, vb - vel[con.body_b], 0.0))
        angvel = angvel.at[con.body_a].add(
            jnp.where(mcol, wa - angvel[con.body_a], 0.0))
        angvel = angvel.at[con.body_b].add(
            jnp.where(mcol, wb - angvel[con.body_b], 0.0))
        if split:
            pvel = pvel.at[con.body_a].add(
                jnp.where(mcol, pva - pvel[con.body_a], 0.0))
            pvel = pvel.at[con.body_b].add(
                jnp.where(mcol, pvb - pvel[con.body_b], 0.0))
            pang = pang.at[con.body_a].add(
                jnp.where(mcol, pwa - pang[con.body_a], 0.0))
            pang = pang.at[con.body_b].add(
                jnp.where(mcol, pwb - pang[con.body_b], 0.0))
        return (vel, angvel, pvel, pang, acc_n, acc_t1, acc_t2, pacc)

    zero_v = jnp.zeros_like(bodies.vel)
    pacc0 = jnp.where(con.point_valid, con.pwarm, 0.0)
    if split:
        # warm-start pseudo velocities consistent with the seeded pacc
        # (mirrors the real warm start applied to momentum in setup)
        Pp = jnp.sum(pacc0, 1)[:, None] * con.n
        pdw_a = jnp.sum(pacc0[..., None] * con.jna, axis=1)
        pdw_b = jnp.sum(pacc0[..., None] * con.jnb, axis=1)
        pvel0 = (zero_v.at[con.body_a].add(-Pp * con.im_a[:, None])
                 .at[con.body_b].add(Pp * con.im_b[:, None]))
        pang0 = zero_v.at[con.body_a].add(-pdw_a).at[con.body_b].add(pdw_b)
    else:
        pvel0 = pang0 = zero_v
    init = (bodies.vel, bodies.angvel, pvel0, pang0, acc_n, acc_t1, acc_t2,
            pacc0)
    vel, angvel, pvel, pang, acc_n, acc_t1, acc_t2, pacc = jax.lax.fori_loop(
        0, cfg.solver_iters * n_colors, pass_fn, init
    )
    return (bodies.replace(vel=vel, angvel=angvel),
            (acc_n, acc_t1, acc_t2), (pvel, pang), pacc)


def accumulated_world_impulse(con: ContactConstraints, acc) -> jnp.ndarray:
    """Fold accumulated (λn, λt1, λt2) back into world-space impulse vectors
    f32[M,P,3] for the cache (reference: update_cached_impulses, SURVEY C9)."""
    acc_n, acc_t1, acc_t2 = acc
    return (acc_n[..., None] * con.n[:, None]
            + acc_t1[..., None] * con.t1[:, None]
            + acc_t2[..., None] * con.t2[:, None])
