"""Vectorized env API (nudge_tpu.envs.BoxPushEnv)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nudge_tpu.envs import BoxPushEnv, vec_reset, vec_step


@pytest.fixture(scope="module")
def env():
    return BoxPushEnv(horizon=20, frame_skip=3)


def test_reset_and_obs(env):
    s, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (env.obs_size,)
    # goal is on the slab, 2..goal_radius out
    r = float(jnp.linalg.norm(s.goal[jnp.array([0, 2])]))
    assert 2.0 <= r <= env.goal_radius + 1e-5


def test_pushing_toward_goal_improves_reward(env):
    s, obs = env.reset(jax.random.PRNGKey(1))
    r_first = None
    for _ in range(12):
        d = obs[6:9]                       # goal - pos
        a = 1.5 * jnp.array([d[0], d[2]])  # push along the bearing
        s, obs, rew, done, _ = env.step(s, a)
        r_first = rew if r_first is None else r_first
    assert float(rew) > float(r_first) + 0.5, (float(r_first), float(rew))
    assert not bool(done)


def test_vmapped_batch(env):
    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    states, obs = vec_reset(env, keys)
    assert obs.shape == (4, env.obs_size)
    acts = jnp.ones((4, env.act_size)) * 0.5
    states, obs, rew, done, _ = vec_step(env, states, acts)
    assert obs.shape == (4, env.obs_size) and rew.shape == (4,)
    assert bool(jnp.all(jnp.isfinite(obs))) and bool(jnp.all(jnp.isfinite(rew)))
    # the four goals differ (per-key randomization survived the vmap)
    assert len({tuple(np.asarray(g).round(3)) for g in states.goal}) == 4
