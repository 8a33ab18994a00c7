"""Sleeping / island bookkeeping (reference: SURVEY.md C13).

Reference semantics: bodies whose velocity stays below threshold for a run of
frames become sleep *candidates*; a group ("island") of touching candidates
falls asleep together; contact with an awake body wakes the island instantly.
The reference compacts sleeping bodies out of ActiveBodies and parks their
pairs; on TPU we keep shapes fixed and flip an `awake` mask instead — sleeping
bodies are skipped by gravity/integration (integrate.py) and their pairs are
dropped in the broadphase filter (broadphase._pair_filter).

Island grouping = a few rounds of min-label propagation over the contact
graph, entirely on-device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..state import Bodies, SleepState
from .contacts import Manifolds


def update_sleep(bodies: Bodies, contacts: Manifolds, sleep: SleepState,
                 cfg: SimConfig) -> SleepState:
    if not cfg.sleeping:
        return sleep

    dyn = bodies.dynamic
    n = bodies.pos.shape[0]

    slow = (
        (jnp.sum(bodies.vel ** 2, -1) < cfg.sleep_lin_vel ** 2)
        & (jnp.sum(bodies.angvel ** 2, -1) < cfg.sleep_ang_vel ** 2)
    )
    idle = jnp.where(slow, sleep.idle + 1, 0)
    candidate = dyn & (idle >= cfg.sleep_frames)

    # A body may actually sleep only if every dynamic body in its island is a
    # candidate. Label propagation: start labels = candidate ? body index : -1
    # (awake bodies carry label "-1" = infectious wakefulness) and take min
    # over contact neighbors; if any -1 reaches a body, its island stays up.
    ba, bb = contacts.body_a, contacts.body_b
    live = contacts.valid
    # static bodies don't transmit wakefulness (the ground never sleeps but
    # shouldn't keep everything awake either)
    lbl = jnp.where(dyn & ~candidate, -1, jnp.arange(n))
    lbl = jnp.where(dyn, lbl, jnp.iinfo(jnp.int32).max)  # statics: inert

    def sweep(_, lbl):
        big = jnp.iinfo(jnp.int32).max
        # propagate both directions, but never through a static body
        thru_a = jnp.where(dyn[ba] & live, lbl[ba], big)
        thru_b = jnp.where(dyn[bb] & live, lbl[bb], big)
        new = lbl.at[bb].min(jnp.where(dyn[bb], thru_a, big))
        new = new.at[ba].min(jnp.where(dyn[ba], thru_b, big))
        return new

    lbl = jax.lax.fori_loop(0, cfg.island_sweeps, sweep, lbl)
    island_awake = lbl < 0   # a -1 reached this body's island neighborhood

    asleep_now = candidate & ~island_awake
    awake = jnp.where(dyn, ~asleep_now, True)

    # instant wake: an awake dynamic body in contact wakes its island — covered
    # by the same propagation next step because its label is -1. Additionally,
    # a sleeping body touched by a *newly* moving body must wake immediately:
    touched_by_awake = jnp.zeros((n,), bool)
    mv = dyn & awake & sleep.awake  # bodies that are actually moving
    touched_by_awake = touched_by_awake.at[bb].max(live & mv[ba])
    touched_by_awake = touched_by_awake.at[ba].max(live & mv[bb])
    wake_up = ~sleep.awake & touched_by_awake & dyn
    awake = awake | wake_up
    idle = jnp.where(wake_up, 0, idle)

    return SleepState(idle=idle, awake=awake)
