"""Analytic policy gradients THROUGH the simulator.

Trains a linear policy for BoxPushEnv by differentiating the total rollout
reward with respect to the policy parameters — the gradient flows through
every contact, friction cone, and impulse clamp of the physics engine
(`cfg.differentiable=True`). No likelihood-ratio tricks, no value function:
the simulator itself is the differentiable world model.

The C++ reference cannot express this at all; here it is ~40 lines on top
of the public env API. Run: python examples/policy_grad.py (~3 min on CPU,
dominated by the one-time compile of rollout+grad).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax

from nudge_tpu.envs import BoxPushEnv

HORIZON = 12      # env steps per rollout (x frame_skip physics steps)
BATCH = 4         # rollouts per update, vmapped


def main():
    env = BoxPushEnv(horizon=HORIZON, frame_skip=3,
                     differentiable=True, sleeping=False)

    def policy(params, obs):
        return params["w"] @ obs + params["b"]

    def rollout_return(params, key):
        s, obs = env.reset(key)

        def step(carry, _):
            s, obs, ret = carry
            s, obs, rew, _done, _ = env.step(s, policy(params, obs))
            return (s, obs, ret + rew), None

        (_, _, ret), _ = jax.lax.scan(
            step, (s, obs, jnp.float32(0)), None, length=HORIZON)
        return ret

    def loss(params, keys):
        return -jnp.mean(jax.vmap(lambda k: rollout_return(params, k))(keys))

    params = {"w": jnp.zeros((env.act_size, env.obs_size)),
              "b": jnp.zeros(env.act_size)}
    opt = optax.adam(3e-2)
    opt_state = opt.init(params)
    vg = jax.jit(jax.value_and_grad(loss))

    key = jax.random.PRNGKey(0)
    for i in range(20):
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, BATCH)
        l, g = vg(params, keys)
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        if i % 4 == 0:
            print(f"update {i:>3}  mean return {-float(l):8.3f}")

    print(f"final mean return {-float(l):.3f} "
          f"(untrained zero policy: ~{-HORIZON * 4.0:.0f})")
    print("w[:, 6:9] (action from goal-bearing features):")
    print(np.asarray(params["w"][:, 6:9]).round(3))


if __name__ == "__main__":
    main()
