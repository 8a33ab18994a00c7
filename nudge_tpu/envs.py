"""Vectorized RL-style environment API over the engine.

BASELINE config 5 frames the scene batch as "RL-style rollouts"
(SURVEY §2 parallelism table); this module is the user-facing shape of
that claim: a pure-functional environment in the gymnax/brax style —
`reset(key)` and `step(state, action)` are jittable, `vmap` batches them
across thousands of environments on one chip, and with
`cfg.differentiable=True` the whole rollout differentiates (analytic
policy gradients through contact).

The reference has no analog (it is a forward-only C++ library whose demo
is a GLUT viewer, SURVEY C15); everything here rides the public engine
API: `engine.step`, `api.apply_impulse`, `api.wake`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from .api import apply_impulse, wake
from .config import SimConfig
from .engine import step as _phys_step
from .scenes import SceneBuilder
from .state import SimState


@struct.dataclass
class EnvState:
    sim: SimState
    goal: jnp.ndarray   # f32[3] world goal for the agent box
    t: jnp.ndarray      # i32 env-steps taken


class BoxPushEnv:
    """Push a unit box to a goal on a ground slab.

    obs  f32[9]: agent position, velocity, goal - position
    act  f32[2]: horizontal impulse (x, z), clipped to `max_push`
    rew  f32   : negative horizontal distance to goal
    done bool  : after `horizon` env steps

    Each env step applies the action as one impulse (plus wake, so a
    settled agent rejoins the solve) and advances `frame_skip` physics
    steps under `lax.scan`.
    """

    def __init__(self, cfg: SimConfig = None, horizon: int = 100,
                 frame_skip: int = 5, max_push: float = 2.0,
                 goal_radius: float = 6.0, **cfg_overrides):
        """`cfg_overrides` are forwarded to auto_config when no explicit
        cfg is given — e.g. BoxPushEnv(differentiable=True, sleeping=False)
        for analytic policy gradients (examples/policy_grad.py)."""
        b = SceneBuilder()
        b.add_static_box((12.0, 0.5, 12.0), (0.0, -0.5, 0.0))
        self._agent = b.add_box((0.5, 0.5, 0.5), (0.0, 0.5, 0.0))
        if cfg is None:
            cfg = b.auto_config(**{"sleeping": True, **cfg_overrides})
        self.cfg = cfg
        self._proto = b.finalize(self.cfg)
        self.horizon = horizon
        self.frame_skip = frame_skip
        self.max_push = max_push
        self.goal_radius = goal_radius

    # -- spaces -------------------------------------------------------------
    obs_size = 9
    act_size = 2

    # -- core ---------------------------------------------------------------
    def _obs(self, s: EnvState) -> jnp.ndarray:
        pos = s.sim.bodies.pos[self._agent]
        vel = s.sim.bodies.vel[self._agent]
        return jnp.concatenate([pos, vel, s.goal - pos])

    @partial(jax.jit, static_argnums=0)
    def reset(self, key: jax.Array):
        kg, kx = jax.random.split(key)
        ang = jax.random.uniform(kg, (), minval=0.0, maxval=2 * jnp.pi)
        r = jax.random.uniform(kx, (), minval=2.0, maxval=self.goal_radius)
        goal = jnp.array([r, 0.5, 0.0])
        goal = goal.at[0].set(r * jnp.cos(ang)).at[2].set(r * jnp.sin(ang))
        s = EnvState(sim=self._proto, goal=goal, t=jnp.int32(0))
        return s, self._obs(s)

    @partial(jax.jit, static_argnums=0)
    def step(self, s: EnvState, action: jnp.ndarray):
        a = jnp.clip(jnp.asarray(action, jnp.float32),
                     -self.max_push, self.max_push)
        sim = s.sim.replace(bodies=apply_impulse(
            s.sim.bodies, self._agent, jnp.array([a[0], 0.0, a[1]])))
        sim = wake(sim, self._agent)

        def body(st, _):
            st, _m = _phys_step(st, self.cfg)
            return st, None

        sim, _ = jax.lax.scan(body, sim, None, length=self.frame_skip)
        s = EnvState(sim=sim, goal=s.goal, t=s.t + 1)
        d = s.goal - sim.bodies.pos[self._agent]
        reward = -jnp.sqrt(d[0] ** 2 + d[2] ** 2 + 1e-8)
        done = s.t >= self.horizon
        return s, self._obs(s), reward, done, {}


def vec_reset(env: BoxPushEnv, keys: jax.Array):
    """Batched reset: keys f32[B,2] -> (EnvState batch, obs f32[B,9])."""
    return jax.vmap(env.reset)(keys)


def vec_step(env: BoxPushEnv, states: EnvState, actions: jnp.ndarray):
    """Batched step over B environments (one jitted program per batch)."""
    return jax.vmap(env.step)(states, actions)
