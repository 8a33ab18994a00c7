"""Differentiable simulation demo: optimize a throw through contact.

A box is thrown from the origin toward a target pad 4 m away. The rollout
includes ballistic flight, impact, friction sliding, and settling — and the
whole thing is differentiated end-to-end with `jax.grad`: the loss is the
distance between the box's final resting position and the target, and the
optimized parameter is the initial velocity.

This is a capability the C++ reference has no analog of (SURVEY §2: the
upstream is a forward-only engine); it falls out of the TPU-native design —
the step is a pure jitted function of the state pytree, so
`jax.grad(loss_of_rollout)` works with `cfg.differentiable=True` (static
solver trip counts; see nudge_tpu/config.py).

Run: python examples/diff_throw.py  (CPU or TPU; ~1 min on CPU)
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from nudge_tpu import SceneBuilder
from nudge_tpu.engine import step

TARGET = jnp.array([4.0, 0.5, 0.0])   # rest on the pad, 4 m downrange
STEPS = 90                             # 1.5 s at dt=1/60


def build():
    b = SceneBuilder()
    b.add_static_box((20.0, 0.5, 20.0), (0.0, -0.5, 0.0))   # ground
    b.add_box((0.5, 0.5, 0.5), (0.0, 1.0, 0.0))             # projectile
    cfg = b.auto_config(solver="xla", differentiable=True)
    return b.finalize(cfg), cfg


def main():
    st0, cfg = build()

    def loss(v0):
        st = st0.replace(bodies=st0.bodies.replace(
            vel=st0.bodies.vel.at[1].set(v0)))

        def body(s, _):
            s, _ = step(s, cfg)
            return s, None

        st, _ = jax.lax.scan(body, st, None, length=STEPS)
        return jnp.sum((st.bodies.pos[1] - TARGET) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss))

    v = jnp.array([3.0, 2.0, 0.0])     # initial guess: undershoots
    lr = 0.05
    print(f"{'iter':>4} {'loss':>10} {'throw velocity':>28}")
    for i in range(30):
        l, g = grad_fn(v)
        if i % 5 == 0 or l < 1e-3:
            print(f"{i:>4} {float(l):>10.4f} {np.asarray(v)}")
        if l < 1e-3:
            break
        v = v - lr * g

    l, _ = grad_fn(v)
    print(f"final loss {float(l):.5f} with throw velocity {np.asarray(v)}")


if __name__ == "__main__":
    main()
