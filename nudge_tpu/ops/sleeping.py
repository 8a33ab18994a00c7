"""Sleeping / island bookkeeping (reference: SURVEY.md C13).

Reference semantics: bodies whose velocity stays below threshold for a run of
frames become sleep *candidates*; an island of touching candidates falls
asleep together; pairs between two sleeping bodies are skipped by the
broadphase but *parked* (ContactData::sleeping_pairs) so a touch from an
awake body can wake the whole island instantly.

TPU rebuild: no compaction — an `awake` mask (SleepState) gates gravity,
integration (integrate.py) and broadphase pair generation
(broadphase._pair_filter). Island grouping and instant wake propagation are a
few rounds of on-device label/flag propagation: over the live contact graph
for falling asleep, over the parked pair list for waking up.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..state import Bodies, SleepState
from .contacts import Manifolds

_BIG = jnp.iinfo(jnp.int32).max


def update_sleep(bodies: Bodies, man: Manifolds, sleep: SleepState,
                 cfg: SimConfig, fast=None):
    """Post-solve sleep bookkeeping. Returns (SleepState, Bodies) — bodies'
    velocities are zeroed when they fall asleep.

    `fast` is the PRE-solve "moving above sleep thresholds" mask used to
    gate waking. It must be pre-solve: an impactor striking a sleeping
    (solver-static) body has its momentum absorbed by the solve, so its
    post-solve velocity is ~0 exactly when it most needs to wake the island."""
    if not cfg.sleeping:
        return sleep, bodies

    n = bodies.pos.shape[0]
    dyn = bodies.dynamic
    awake = sleep.awake
    ba, bb = man.body_a, man.body_b
    live = man.valid

    # --- idle counting (reference: per-body idle counters, SURVEY C12/C13) ---
    slow = (
        (jnp.sum(bodies.vel ** 2, -1) < cfg.sleep_lin_vel ** 2)
        & (jnp.sum(bodies.angvel ** 2, -1) < cfg.sleep_ang_vel ** 2)
    )
    idle = jnp.where(awake, jnp.where(slow, sleep.idle + 1, 0), sleep.idle)
    candidate = dyn & awake & (idle >= cfg.sleep_frames)

    # --- falling asleep: only whole islands of candidates may sleep.
    # Propagate "wakefulness" (-1) from awake dynamic non-candidates through
    # the live contact graph (static bodies do not transmit). ---
    lbl = jnp.where(dyn & awake & ~candidate, -1, 0)
    lbl = jnp.where(dyn, lbl, _BIG)

    def sweep_asleep(_, lbl):
        thru_a = jnp.where(dyn[ba] & live, lbl[ba], _BIG)
        thru_b = jnp.where(dyn[bb] & live, lbl[bb], _BIG)
        new = lbl.at[bb].min(jnp.where(dyn[bb], thru_a, _BIG))
        return new.at[ba].min(jnp.where(dyn[ba], thru_b, _BIG))

    # With no candidate the flood's result is unused (falls_asleep is all
    # False either way) — skip the island_sweeps scatter rounds entirely.
    # On the settled 20,480 pile the two floods + parked-pair rebuild were
    # ~45 ms/step of scatter traffic that almost never changed anything.
    lbl = jax.lax.cond(
        jnp.any(candidate),
        lambda l: jax.lax.fori_loop(0, cfg.island_sweeps, sweep_asleep, l),
        lambda l: l, lbl)
    falls_asleep = candidate & ~(lbl < 0)
    awake = awake & ~falls_asleep

    # --- waking: a live contact from a FAST body touches a sleeper, and
    # the wake flag floods its island through the parked pair list. "Fast"
    # means above the sleep velocity thresholds PRE-solve: sleeping bodies
    # are static for the solve, so an idle-slow awake body resting on a
    # sleeping island is fully supported and must NOT wake it — waking on
    # any awake contact made sleep boundaries thrash (wake -> idle reset ->
    # 60-frame requalify) and piles never actually slept. A gently-placed
    # slow body also does not wake the island (it is statically supported),
    # matching the reference's parked-pair semantics. ---
    if fast is None:
        fast = ~slow
    moving = dyn & awake & fast
    woken = jnp.zeros((n,), bool)
    woken = woken.at[bb].max(live & moving[ba] & ~awake[bb] & dyn[bb])
    woken = woken.at[ba].max(live & moving[bb] & ~awake[ba] & dyn[ba])

    pa, pb = sleep.pairs[:, 0], sleep.pairs[:, 1]
    parked_live = pa >= 0
    wake_flag = woken

    def sweep_wake(_, w):
        wa = jnp.where(parked_live, w[jnp.maximum(pa, 0)], False)
        wb = jnp.where(parked_live, w[jnp.maximum(pb, 0)], False)
        w = w.at[jnp.maximum(pb, 0)].max(wa & parked_live)
        return w.at[jnp.maximum(pa, 0)].max(wb & parked_live)

    # No wake seed -> the flood is the identity; skip it (see asleep gate).
    wake_flag = jax.lax.cond(
        jnp.any(woken),
        lambda w: jax.lax.fori_loop(0, cfg.island_sweeps, sweep_wake, w),
        lambda w: w, wake_flag)
    wake_flag = wake_flag & dyn & ~awake
    awake = awake | wake_flag
    idle = jnp.where(wake_flag | falls_asleep, 0, idle)

    # --- kill plane (SimConfig.kill_plane_y): bodies below it have left the
    # world — force-sleep, never wake. ---
    if cfg.kill_plane_y > -1e8:
        below = dyn & (bodies.pos[:, 1] < cfg.kill_plane_y)
        falls_asleep = falls_asleep | (below & awake)
        awake = awake & ~below

    # --- parked pairs: keep those still fully asleep, add this frame's
    # contacts whose endpoints both just went (or stayed) asleep. The list
    # can only change when a body fell asleep (new parked pairs; live
    # manifolds never span two already-asleep bodies — those pairs are
    # filtered pre-narrowphase) or woke (parked pairs released), so the
    # nonzero-compaction over 2x capacity is skipped on quiet steps. ---
    asleep = dyn & ~awake

    def rebuild_pairs(_):
        keep_old = (parked_live & asleep[jnp.maximum(pa, 0)]
                    & asleep[jnp.maximum(pb, 0)])
        new_pair = live & asleep[ba] & asleep[bb]
        cand_a = jnp.concatenate([jnp.where(keep_old, pa, -1),
                                  jnp.where(new_pair, ba, -1)])
        cand_b = jnp.concatenate([jnp.where(keep_old, pb, -1),
                                  jnp.where(new_pair, bb, -1)])
        cap = sleep.pairs.shape[0]
        sel_mask = cand_a >= 0
        count = jnp.sum(sel_mask.astype(jnp.int32))
        (sel,) = jnp.nonzero(sel_mask, size=cap, fill_value=0)
        valid = jnp.arange(cap) < jnp.minimum(count, cap)
        return jnp.stack([
            jnp.where(valid, cand_a[sel], -1),
            jnp.where(valid, cand_b[sel], -1),
        ], axis=-1).astype(jnp.int32)

    pairs = jax.lax.cond(
        jnp.any(falls_asleep) | jnp.any(wake_flag),
        rebuild_pairs, lambda _: sleep.pairs, None)

    # zero momentum of bodies that just fell asleep (standard engine behavior;
    # prevents stale drift on wake)
    fz = falls_asleep[:, None]
    bodies = bodies.replace(
        vel=jnp.where(fz, 0.0, bodies.vel),
        angvel=jnp.where(fz, 0.0, bodies.angvel),
    )
    return SleepState(idle=idle, awake=awake, pairs=pairs), bodies
