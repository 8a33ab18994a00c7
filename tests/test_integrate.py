import numpy as np
import jax
import jax.numpy as jnp

from nudge_tpu.config import SimConfig
from nudge_tpu.ops.integrate import advance, apply_gravity
from nudge_tpu.scenes import SceneBuilder


def make_state():
    b = SceneBuilder()
    b.add_static_box((10, 0.5, 10), (0, -0.5, 0))
    b.add_box((0.5, 0.5, 0.5), (0, 3.0, 0), vel=(1.0, 0.0, 0.0))
    cfg = b.auto_config()
    return cfg, b.finalize(cfg)


def test_gravity_only_on_dynamic():
    cfg, st = make_state()
    bodies = apply_gravity(st.bodies, st.sleep, cfg)
    np.testing.assert_allclose(bodies.vel[0], 0.0)  # static untouched
    np.testing.assert_allclose(
        bodies.vel[1], [1.0, cfg.gravity[1] * cfg.dt, 0.0], atol=1e-6
    )


def test_advance_ballistic():
    cfg, st = make_state()
    bodies, sleep = st.bodies, st.sleep

    def step(bodies, _):
        bodies = apply_gravity(bodies, sleep, cfg)
        bodies = advance(bodies, sleep, cfg)
        return bodies, None

    n = 60
    bodies, _ = jax.lax.scan(step, bodies, None, length=n)
    t = n * cfg.dt
    # symplectic Euler: x(t) = x0 + v0 t + g dt (t(t+dt))/2... use discrete sum
    g = cfg.gravity[1]
    y_expected = 3.0 + g * cfg.dt * cfg.dt * (n * (n + 1) / 2)
    np.testing.assert_allclose(bodies.pos[1, 1], y_expected, rtol=1e-4)
    np.testing.assert_allclose(bodies.pos[1, 0], 1.0 * t, rtol=1e-5)
    np.testing.assert_allclose(bodies.pos[0], [0, -0.5, 0])  # ground fixed
    # quaternion stays unit
    np.testing.assert_allclose(np.linalg.norm(bodies.quat[1]), 1.0, atol=1e-5)


def test_asleep_bodies_frozen():
    cfg, st = make_state()
    sleep = st.sleep.replace(awake=jnp.zeros_like(st.sleep.awake))
    bodies = apply_gravity(st.bodies, sleep, cfg)
    bodies = advance(bodies, sleep, cfg)
    np.testing.assert_allclose(bodies.pos, st.bodies.pos)
    np.testing.assert_allclose(bodies.vel, st.bodies.vel)
