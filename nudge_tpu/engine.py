"""The simulation step: collide -> warm start -> setup -> solve -> advance.

This is the reference demo's canonical step loop (SURVEY.md §3.A) fused into
one pure, jittable function. Host<->TPU crossings happen only at scene
construction and optional metric readback (SURVEY §3.E): `simulate` runs whole
rollouts on-device under `lax.scan` with donated state buffers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from .config import SimConfig
from .ops.cache import read_cached_impulses, write_cached_impulses
from .ops.contacts import collide
from .ops.integrate import advance, apply_gravity, apply_position_correction
from .ops.sleeping import update_sleep
from .ops.setup_kernel import setup_solve_fused
from .ops.solver import (
    accumulated_world_impulse, color_manifolds_cached, setup_constraints,
    solve,
)
from .ops.solver_kernel import kernel_fits
from .state import SimState


def _use_kernels(cfg: SimConfig, n_bodies: int) -> bool:
    """Static (trace-time) choice of the Pallas setup+solve path (M5)."""
    if cfg.solver in ("pallas", "pallas_interpret"):
        return True
    # Pallas kernels carry no VJP rule: differentiable rollouts must ride
    # the XLA path even on TPU (forcing solver="pallas" remains an explicit
    # override that fails loudly under jax.grad).
    use = (cfg.solver == "auto" and not cfg.differentiable
           and jax.default_backend() == "tpu"
           and kernel_fits(cfg, n_bodies))
    if (not use and jax.default_backend() == "tpu"
            and n_bodies > cfg.xla_solver_max_bodies):
        # Round-5 bisect: the TPU worker kills any single program execution
        # past ~3-5 min (reported as "worker crashed / kernel fault" + a
        # 10-20 min relay blackout), and the XLA solve branch at this scale
        # is slow enough that ordinary scan windows cross that deadline.
        # Fail loudly at trace time instead (SimConfig.xla_solver_max_bodies).
        raise RuntimeError(
            f"XLA-solver step at n={n_bodies} bodies exceeds "
            f"xla_solver_max_bodies={cfg.xla_solver_max_bodies} on TPU: "
            "the XLA branch at this scale is slow enough that normal "
            "multi-step windows exceed the TPU worker's ~5-min execution "
            "deadline and get the worker killed (round-5 bisect, "
            "scripts/results.jsonl r5_fault_bisect). Use solver='auto' "
            "with kernel-compatible capacities, shrink the scene/chunk, "
            "or raise cfg.xla_solver_max_bodies and keep per-call step "
            "counts small."
        )
    return use


@struct.dataclass
class StepMetrics:
    """Small per-step observability pytree (SURVEY §5: metrics/logging)."""

    contact_count: jnp.ndarray   # i32
    max_depth: jnp.ndarray       # f32 max penetration this step
    spill_count: jnp.ndarray     # i32 contacts past the coloring budget
    overflow: jnp.ndarray        # bool any capacity exceeded
    awake_count: jnp.ndarray     # i32 dynamic awake bodies
    kinetic_energy: jnp.ndarray  # f32 Σ ½|v|²/inv_mass over dynamic bodies
    overflow_bits: jnp.ndarray   # i32 attribution (Manifolds.overflow_bits)
    manifold_demand: jnp.ndarray  # i32 manifolds wanted (may exceed capacity)
    pair_demand: jnp.ndarray     # i32 candidate pairs wanted (may exceed caps)


def step(state: SimState, cfg: SimConfig):
    """One simulation step. Returns (new_state, StepMetrics).

    With sleeping enabled, a scene whose every dynamic body is asleep skips
    the entire contact pipeline under `lax.cond` — the reference gets the
    same endgame for free by iterating only ActiveBodies (SURVEY C13).
    Nothing inside the engine can wake an all-asleep scene (waking needs a
    fast body or user surgery), so the skip is exact, and settled scenes
    step at no-op cost."""
    if cfg.sleeping:
        any_awake = jnp.any(state.sleep.awake & state.bodies.dynamic)
        return jax.lax.cond(
            any_awake,
            lambda st: _step_active(st, cfg),
            lambda st: _step_parked(st, cfg),
            state,
        )
    return _step_active(state, cfg)


def _step_parked(state: SimState, cfg: SimConfig):
    """All-asleep fast path: state unchanged except the step counter."""
    z_i = jnp.zeros((), jnp.int32)
    z_f = jnp.zeros((), jnp.float32)
    metrics = StepMetrics(
        contact_count=z_i, max_depth=z_f, spill_count=z_i,
        overflow=jnp.zeros((), bool), awake_count=z_i, kinetic_energy=z_f,
        overflow_bits=z_i, manifold_demand=z_i, pair_demand=z_i,
    )
    return state.replace(step_count=state.step_count + 1), metrics


def _step_active(state: SimState, cfg: SimConfig):
    bodies = apply_gravity(state.bodies, state.sleep, cfg)

    contacts, bp = collide(state, cfg)
    warm, pwarm = read_cached_impulses(state.cache, contacts, cfg)

    # Sleeping bodies leave the active set (reference: ActiveBodies excludes
    # them and their momentum is never touched, SURVEY C13): make them STATIC
    # for coloring + setup + solve by zeroing their inverse mass/inertia.
    # Without this the solver keeps writing velocity into sleepers — advance()
    # masks their pose update, so the geometry never changes, gravity keeps
    # loading their awake neighbors, and the un-integrated velocity grows
    # frame over frame until the body wakes and detonates (observed: settled
    # 2048-pile KE limit cycle whose growth onset coincides exactly with the
    # first bodies falling asleep; the 20,480 pile rode the same pump into
    # pair overflow and explosion).
    if cfg.sleeping:
        im0, ii0 = bodies.inv_mass, bodies.inv_inertia
        asleep = ~state.sleep.awake
        bodies = bodies.replace(
            inv_mass=jnp.where(asleep, 0.0, im0),
            inv_inertia=jnp.where(asleep[:, None], 0.0, ii0),
        )
    if cfg.persistent_coloring:
        coloring, colors = color_manifolds_cached(
            contacts, bodies, cfg, state.colors)
    else:
        coloring, colors = None, state.colors
    if _use_kernels(cfg, bodies.pos.shape[0]):
        bodies, acc_world, spill, pseudo, pseudo_acc = setup_solve_fused(
            bodies, contacts, warm, cfg,
            interpret=(cfg.solver == "pallas_interpret"),
            coloring=coloring, pwarm=pwarm)
    else:
        con, bodies, acc = setup_constraints(bodies, contacts, warm, cfg,
                                             coloring=coloring, pwarm=pwarm)
        bodies, acc, pseudo, pseudo_acc = solve(bodies, con, acc, cfg)
        acc_world = accumulated_world_impulse(con, acc)
        spill = con.spill_count
    cache = write_cached_impulses(contacts, acc_world, pseudo_acc)

    if cfg.sleeping:  # restore true mass properties after the solve
        bodies = bodies.replace(inv_mass=im0, inv_inertia=ii0)

    bodies = advance(bodies, state.sleep, cfg)
    if cfg.split_impulse:
        bodies = apply_position_correction(bodies, pseudo, state.sleep, cfg)
    # pre-solve fast mask for the wake gate (see update_sleep docstring);
    # wake_factor hysteresis keeps residual settled-pile jigglers from
    # re-waking their sleeping neighbors every step
    wf2 = cfg.wake_factor ** 2
    fast0 = (
        (jnp.sum(state.bodies.vel ** 2, -1) > wf2 * cfg.sleep_lin_vel ** 2)
        | (jnp.sum(state.bodies.angvel ** 2, -1) > wf2 * cfg.sleep_ang_vel ** 2)
    )
    sleep, bodies = update_sleep(bodies, contacts, state.sleep, cfg,
                                 fast=fast0)

    new_state = state.replace(
        bodies=bodies, cache=cache, sleep=sleep, bp=bp, colors=colors,
        step_count=state.step_count + 1,
    )

    dyn = bodies.dynamic
    ke = 0.5 * jnp.sum(
        jnp.where(dyn, jnp.sum(bodies.vel ** 2, -1)
                  / jnp.maximum(bodies.inv_mass, 1e-12), 0.0)
    )
    metrics = StepMetrics(
        contact_count=contacts.contact_count,
        max_depth=jnp.max(jnp.where(contacts.point_valid, contacts.depth, 0.0)),
        spill_count=spill,
        overflow=contacts.overflow,
        awake_count=jnp.sum((dyn & sleep.awake).astype(jnp.int32)),
        kinetic_energy=ke,
        overflow_bits=contacts.overflow_bits,
        manifold_demand=contacts.count,
        pair_demand=contacts.pair_demand,
    )
    return new_state, metrics


@partial(jax.jit, static_argnums=(1, 2), donate_argnums=(0,))
def _simulate(state: SimState, cfg: SimConfig, steps: int):
    def f(st, _):
        return step(st, cfg)

    return jax.lax.scan(f, state, None, length=steps)


def simulate(state: SimState, cfg: SimConfig, steps: int):
    """Run `steps` steps fully on-device. Returns (state, stacked metrics)."""
    return _simulate(state, cfg, steps)


@partial(jax.jit, static_argnums=(1,), donate_argnums=(0,))
def step_jit(state: SimState, cfg: SimConfig):
    return step(state, cfg)
