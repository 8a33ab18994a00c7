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
from .mathx import cross, quat_rotate, quat_rotate_inv
from .ops import cache as _cache
from .ops import solver as _solver
from .ops.contacts import Manifolds, collide as _collide
from .ops.integrate import advance as _advance, apply_gravity
from .state import Bodies, ContactCache, SimState, SleepState

__all__ = [
    "collide", "read_cached_impulses", "setup_contact_constraints",
    "apply_impulses", "update_cached_impulses", "write_cached_impulses",
    "advance", "apply_gravity",
    "apply_impulse", "apply_force", "wake",
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


# --- actuation helpers (functional analog of caller-owned momentum) --------
#
# The reference's BodyMomentum arrays are caller-owned (nudge.h, SURVEY C1):
# users actuate by writing velocities directly between calls. Here state is
# immutable, so these return updated pytrees; they are pure, jittable, and
# vmappable (pass `body` as a traced index for per-lane actuation), and they
# differentiate — e.g. grad of a rollout loss w.r.t. the applied impulse
# (cfg.differentiable=True; see tests/test_autodiff.py).


def apply_impulse(bodies: Bodies, body, impulse, point=None) -> Bodies:
    """Apply a world-space impulse to `body`, at world `point` if given
    (adds the r x J angular impulse through the world-space inverse
    inertia), else at the center of mass. Static bodies (inv_mass 0) are
    unaffected. When sleeping is enabled, pair with `wake` — a poked
    sleeper must rejoin the solve or the impulse stays un-integrated."""
    impulse = jnp.asarray(impulse, jnp.float32)
    vel = bodies.vel.at[body].add(impulse * bodies.inv_mass[body])
    angvel = bodies.angvel
    if point is not None:
        L = cross(jnp.asarray(point, jnp.float32) - bodies.pos[body],
                  impulse)
        q = bodies.quat[body]
        ang = quat_rotate(
            q, bodies.inv_inertia[body] * quat_rotate_inv(q, L))
        # zero inertia rows (statics) contribute nothing
        angvel = angvel.at[body].add(ang)
    return bodies.replace(vel=vel, angvel=angvel)


def apply_force(bodies: Bodies, body, force, cfg: SimConfig,
                point=None) -> Bodies:
    """One step's worth of a constant world-space force: the impulse
    `force * cfg.dt` (symplectic Euler accumulates forces as per-step
    impulses — exactly how gravity enters in apply_gravity)."""
    return apply_impulse(bodies, body,
                         jnp.asarray(force, jnp.float32) * cfg.dt,
                         point=point)


def wake(state: SimState, body) -> SimState:
    """Wake `body`: reset its idle counter and set it awake. The island
    propagation inside the next collide() wakes touching sleepers (the
    reference's contact-with-active-body rule, SURVEY C13)."""
    sleep = state.sleep
    return state.replace(sleep=sleep.replace(
        idle=sleep.idle.at[body].set(0),
        awake=sleep.awake.at[body].set(True),
    ))
