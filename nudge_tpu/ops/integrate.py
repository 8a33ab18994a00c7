"""Symplectic Euler integration (reference: nudge::advance(), SURVEY.md C12/§3.D).

The reference advances only the ActiveBodies index list; here every body slot
is advanced under a mask (dynamic AND awake) — identical semantics, no
compaction, fully vectorized.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SimConfig
from ..mathx import quat_integrate
from ..state import Bodies, SleepState


def apply_gravity(bodies: Bodies, sleep: SleepState, cfg: SimConfig) -> Bodies:
    """v += g·dt on dynamic awake bodies. The reference demo folds gravity into
    the per-frame velocity update before the solve [MED]; doing it pre-solve is
    required so resting contacts cancel gravity each frame."""
    g = jnp.asarray(cfg.gravity, jnp.float32)
    move = (bodies.dynamic & sleep.awake)[:, None]
    return bodies.replace(vel=jnp.where(move, bodies.vel + g * cfg.dt, bodies.vel))


def apply_position_correction(bodies: Bodies, pseudo, sleep: SleepState,
                              cfg: SimConfig) -> Bodies:
    """Split-impulse position fixup: integrate the solver's PSEUDO
    velocities into pose only (momentum untouched — that is the whole point;
    see SimConfig.split_impulse)."""
    pv, pw = pseudo
    move = (bodies.dynamic & sleep.awake)[:, None]
    pos = jnp.where(move, bodies.pos + pv * cfg.dt, bodies.pos)
    quat = jnp.where(move, quat_integrate(bodies.quat, pw, cfg.dt),
                     bodies.quat)
    return bodies.replace(pos=pos, quat=quat)


def advance(bodies: Bodies, sleep: SleepState, cfg: SimConfig) -> Bodies:
    """x += v·dt; q = normalize(q + ½·dt·ω⊗q) on dynamic awake bodies.

    With cfg.max_lin_vel > 0 the velocity itself is clamped to that speed
    first (momentum-affecting, like Box2D's maxTranslation clamp): bodies
    faster than the scene's free-fall ceiling are solver ejecta whose next
    step would cross a full box extent and tunnel (see SimConfig.max_lin_vel)."""
    move = (bodies.dynamic & sleep.awake)[:, None]
    vel = bodies.vel
    if cfg.max_lin_vel > 0.0:
        speed = jnp.sqrt(jnp.maximum(jnp.sum(vel * vel, -1), 1e-12))
        scale = jnp.minimum(1.0, cfg.max_lin_vel / speed)[:, None]
        vel = jnp.where(move, vel * scale, vel)
        bodies = bodies.replace(vel=vel)
    pos = jnp.where(move, bodies.pos + vel * cfg.dt, bodies.pos)
    quat = jnp.where(
        move, quat_integrate(bodies.quat, bodies.angvel, cfg.dt), bodies.quat
    )
    return bodies.replace(pos=pos, quat=quat)
