"""nudge-parity functional API.

The reference exposes exactly seven free functions over caller-owned state
(`nudge.h`, SURVEY.md §8). This module provides the same seven entry points
with the same pipeline semantics so a user of the reference can port their
step loop one call at a time; each maps onto the TPU-native ops:

    reference (nudge.h)                      here
    ------------------------------------    ------------------------------
    collide(active, contacts, ...)           collide(state, cfg)
    read_cached_impulses(cache, contacts)    read_cached_impulses(...)
    setup_contact_constraints(...)           setup_contact_constraints(...)
    apply_impulses(constraints, bodies)      apply_impulses(...)
    update_cached_impulses(...)              update_cached_impulses(...)
    write_cached_impulses(cache, ...)        write_cached_impulses(...)
    advance(active, bodies, dt)              advance(state-parts, cfg)

Differences by design: state is a pytree of fixed-capacity device arrays, not
raw pointers; the Arena disappears (static shapes); ActiveBodies is the
`sleep.awake` mask; all functions are pure and jittable. For the fused
one-call-per-step path use `nudge_tpu.engine.step` instead — it is the same
pipeline with no host round-trips.
"""

from __future__ import annotations

import jax.numpy as jnp

from .config import SimConfig
from .ops import cache as _cache
from .ops import solver as _solver
from .ops.contacts import Manifolds, collide as _collide
from .ops.integrate import advance as _advance, apply_gravity
from .state import Bodies, ContactCache, SimState, SleepState

__all__ = [
    "collide", "read_cached_impulses", "setup_contact_constraints",
    "apply_impulses", "update_cached_impulses", "write_cached_impulses",
    "advance", "apply_gravity",
]


def collide(state: SimState, cfg: SimConfig):
    """Broadphase + narrowphase + compaction (reference: nudge::collide,
    SURVEY §3.B). Sleeping pairs are skipped via state.sleep; BodyConnections
    filtering via state.connections. Returns (Manifolds, BPCache) — store the
    cache back via state.replace(bp=...) to amortize pair generation."""
    return _collide(state, cfg)


def read_cached_impulses(cache: ContactCache, contacts: Manifolds):
    """Warm-start payload per contact point: (impulses f32[M,P,3],
    pseudo f32[M,P]) — zeros on miss. The pseudo component warm-starts the
    split-impulse position solve (not in the reference, which has no
    position solve; pass it to setup_contact_constraints as pwarm)."""
    return _cache.read_cached_impulses(cache, contacts)


def setup_contact_constraints(bodies: Bodies, contacts: Manifolds,
                              impulses, cfg: SimConfig, pwarm=None):
    """Precompute constraint data, apply warm-start impulses. Returns
    (ContactConstraints, Bodies, accumulators) — the accumulators play the
    role of the impulse state inside the reference's opaque
    ContactConstraintData.

    With sleeping enabled, zero the inverse mass/inertia of sleeping bodies
    before calling (the reference's ActiveBodies exclusion): the solver must
    treat sleepers as static or their un-integrated velocity grows without
    bound. `engine.step` does this automatically."""
    return _solver.setup_constraints(bodies, contacts, impulses, cfg,
                                     pwarm=pwarm)


def apply_impulses(constraints, bodies: Bodies, accumulators,
                   cfg: SimConfig):
    """Run the iterated impulse solve (the reference calls this in a loop;
    here `cfg.solver_iters` sweeps run inside). Returns (Bodies, acc,
    (pseudo_vel, pseudo_angvel), pseudo_acc) — the pseudo pair is the
    split-impulse position correction, applied by
    integrate.apply_position_correction; pseudo_acc feeds
    write_cached_impulses."""
    return _solver.solve(bodies, constraints, accumulators, cfg)


def update_cached_impulses(constraints, accumulators):
    """Fold accumulated impulses back to world-space vectors f32[M,P,3]."""
    return _solver.accumulated_world_impulse(constraints, accumulators)


def write_cached_impulses(contacts: Manifolds, impulse_world,
                          pseudo_acc=None) -> ContactCache:
    """New warm-start cache from this frame's contacts."""
    return _cache.write_cached_impulses(contacts, impulse_world, pseudo_acc)


def advance(bodies: Bodies, sleep: SleepState, cfg: SimConfig) -> Bodies:
    """Symplectic Euler position/orientation update (reference: advance)."""
    return _advance(bodies, sleep, cfg)
