"""Simulation state pytrees.

The reference keeps ALL persistent state in caller-owned SoA arrays
(`nudge.h`: BodyData, ColliderData, ContactCache, ActiveBodies — SURVEY.md C1)
and per-step temporaries in a linear Arena (SURVEY.md C3). The TPU-native
equivalent is one `SimState` pytree of fixed-capacity padded device arrays:
capacities are static shapes from `SimConfig`, validity is carried by masks,
and per-step temporaries are ordinary traced values inside the jitted step
(XLA's buffer allocator plays the Arena's role).

Padding conventions:
  - padded bodies have inv_mass == 0 and no colliders referencing them;
  - padded colliders have body == -1;
  - padded cache rows / connections have valid == False / body == -1.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from .config import SimConfig
from .mathx import quat_identity


@struct.dataclass
class Bodies:
    """SoA rigid-body state (reference: Transform + BodyProperties +
    BodyMomentum arrays in `nudge.h`, SURVEY.md §8)."""

    pos: jnp.ndarray          # f32[N,3] world position
    quat: jnp.ndarray         # f32[N,4] world orientation (x,y,z,w)
    vel: jnp.ndarray          # f32[N,3] linear velocity
    angvel: jnp.ndarray       # f32[N,3] angular velocity (world frame)
    inv_mass: jnp.ndarray     # f32[N]   0 => static/kinematic
    inv_inertia: jnp.ndarray  # f32[N,3] diagonal inverse inertia, body frame

    @property
    def n(self) -> int:
        return self.pos.shape[-2]

    @property
    def dynamic(self) -> jnp.ndarray:
        return self.inv_mass > 0.0


@struct.dataclass
class Boxes:
    """SoA box colliders (reference: ColliderData.boxes, SURVEY.md C1).
    `body` links collider -> body like Transform.body in `nudge.h`;
    (lpos, lquat) is the collider's transform in the body frame."""

    body: jnp.ndarray       # i32[B]; -1 => unused slot
    half: jnp.ndarray       # f32[B,3] half extents (BoxCollider.size)
    lpos: jnp.ndarray       # f32[B,3]
    lquat: jnp.ndarray      # f32[B,4]
    friction: jnp.ndarray   # f32[B]
    tag: jnp.ndarray        # i32[B] user tag (uint16 semantics, API parity)

    @property
    def valid(self) -> jnp.ndarray:
        return self.body >= 0


@struct.dataclass
class Spheres:
    """SoA sphere colliders (reference: ColliderData.spheres, SURVEY.md C1)."""

    body: jnp.ndarray       # i32[S]; -1 => unused slot
    radius: jnp.ndarray     # f32[S]
    lpos: jnp.ndarray       # f32[S,3]
    friction: jnp.ndarray   # f32[S]
    tag: jnp.ndarray        # i32[S]

    @property
    def valid(self) -> jnp.ndarray:
        return self.body >= 0


@struct.dataclass
class ContactCache:
    """Warm-start impulse cache keyed by persistent contact identity
    (reference: ContactCache + 64-bit tags, SURVEY.md C8/C9).

    Identity = (pair key, feature id). The pair key packs the two collider
    indices (stable here because fixed-capacity arrays never reorder —
    playing the role the reference's user-assigned uint16 collider tags play
    under array compaction). Stored unsorted; the per-frame sort-merge join
    happens in ops/cache.py.
    """

    ga: jnp.ndarray        # i32[C] first collider gid
    gb: jnp.ndarray        # i32[C] second collider gid
    feat: jnp.ndarray      # i32[C] feature id within the pair
    impulse: jnp.ndarray   # f32[C,3] accumulated world-space impulse
    pseudo: jnp.ndarray    # f32[C] accumulated pseudo (position-solve) normal
                           # impulse — warm-starts the split-impulse pass;
                           # without it the pseudo solve re-converges from
                           # zero every step and under-converges deep piles
    valid: jnp.ndarray     # bool[C]


@struct.dataclass
class SleepState:
    """Idle counters + awake mask (reference: ActiveBodies + idle counters,
    SURVEY.md C13). Sleeping bodies keep their array slots and are masked
    out of the solve/integration — no compaction on TPU."""

    idle: jnp.ndarray    # i32[N] consecutive below-threshold frames
    awake: jnp.ndarray   # bool[N]
    pairs: jnp.ndarray   # i32[K,2] parked sleeping contact pairs (-1 pad);
                         # reference: ContactData::sleeping_pairs (SURVEY C13)


@struct.dataclass
class ColorCache:
    """Persistent manifold coloring keyed by (gid_a, gid_b): the reference
    rebuilds its conflict-free batches every frame (SURVEY C10); settled
    scenes have a static contact graph, so last frame's coloring is reused
    via a sort-merge join and only NEW manifolds run greedy rounds
    (ops/solver.color_manifolds_cached)."""

    ga: jnp.ndarray        # i32[M]
    gb: jnp.ndarray        # i32[M]
    color: jnp.ndarray     # i32[M]
    valid: jnp.ndarray     # bool[M]
    # dyn-mask assumption the color was assigned under (bit0 = side a
    # dynamic+awake, bit1 = side b). Sleeping bodies are static for the
    # solve, so two manifolds on one sleeping body may legally share a
    # color — when the body wakes, those cached colors would conflict.
    # A join hit is accepted only if the bits still match.
    dynbits: jnp.ndarray   # i32[M]


@struct.dataclass
class SimState:
    bodies: Bodies
    boxes: Boxes
    spheres: Spheres
    cache: ContactCache
    sleep: SleepState
    bp: "BPCache"             # persistent broadphase cache (ops/persistent_bp)
    colors: ColorCache        # persistent manifold coloring
    connections: jnp.ndarray  # i32[K,2] suppressed body pairs (SURVEY C14); -1 pad
    step_count: jnp.ndarray   # i32 scalar


def empty_state(cfg: SimConfig) -> SimState:
    """All-padding state at capacity; fill via scenes.SceneBuilder."""
    from .ops.persistent_bp import empty_bp_cache

    n, b, s = cfg.max_bodies, cfg.max_boxes, cfg.max_spheres
    c, k = cfg.cache_capacity, cfg.max_connections
    f32, i32 = jnp.float32, jnp.int32
    return SimState(
        bodies=Bodies(
            pos=jnp.zeros((n, 3), f32),
            quat=quat_identity((n,)),
            vel=jnp.zeros((n, 3), f32),
            angvel=jnp.zeros((n, 3), f32),
            inv_mass=jnp.zeros((n,), f32),
            inv_inertia=jnp.zeros((n, 3), f32),
        ),
        boxes=Boxes(
            body=jnp.full((b,), -1, i32),
            half=jnp.ones((b, 3), f32),
            lpos=jnp.zeros((b, 3), f32),
            lquat=quat_identity((b,)),
            friction=jnp.full((b,), cfg.friction, f32),
            tag=jnp.zeros((b,), i32),
        ),
        spheres=Spheres(
            body=jnp.full((max(s, 1),), -1, i32),
            radius=jnp.ones((max(s, 1),), f32),
            lpos=jnp.zeros((max(s, 1), 3), f32),
            friction=jnp.full((max(s, 1),), cfg.friction, f32),
            tag=jnp.zeros((max(s, 1),), i32),
        ),
        cache=ContactCache(
            ga=jnp.zeros((c,), i32),
            gb=jnp.zeros((c,), i32),
            feat=jnp.zeros((c,), i32),
            impulse=jnp.zeros((c, 3), f32),
            pseudo=jnp.zeros((c,), f32),
            valid=jnp.zeros((c,), bool),
        ),
        sleep=SleepState(
            idle=jnp.zeros((n,), i32),
            awake=jnp.ones((n,), bool),
            pairs=jnp.full((cfg.max_manifolds, 2), -1, i32),
        ),
        bp=empty_bp_cache(cfg, n),
        colors=empty_color_cache(cfg),
        connections=jnp.full((k, 2), -1, i32),
        step_count=jnp.zeros((), i32),
    )


def empty_color_cache(cfg: SimConfig) -> ColorCache:
    m = cfg.max_manifolds
    return ColorCache(
        ga=jnp.zeros((m,), jnp.int32),
        gb=jnp.zeros((m,), jnp.int32),
        color=jnp.zeros((m,), jnp.int32),
        valid=jnp.zeros((m,), bool),
        dynbits=jnp.zeros((m,), jnp.int32),
    )
