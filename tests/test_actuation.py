"""Actuation helpers (api.apply_impulse / apply_force / wake).

The reference actuates by writing caller-owned BodyMomentum arrays between
calls (nudge.h, SURVEY C1); the functional analogs must reproduce the same
mechanics: linear kick J*inv_mass, angular kick I⁻¹(r x J) in world space,
statics immune, and a poked sleeper rejoining the solve after wake().
"""

import numpy as np

import jax.numpy as jnp

from nudge_tpu import SceneBuilder
from nudge_tpu.api import apply_force, apply_impulse, wake
from nudge_tpu.engine import simulate


def _box_on_ground(**cfg_over):
    b = SceneBuilder()
    b.add_static_box((10, 0.5, 10), (0, -0.5, 0))
    b.add_box((0.5, 0.5, 0.5), (0, 0.495, 0))
    cfg = b.auto_config(**cfg_over)
    return b.finalize(cfg), cfg


def test_com_impulse_is_linear_kick():
    st, cfg = _box_on_ground()
    bodies = apply_impulse(st.bodies, 1, (2.0, 0.0, 0.0))
    assert np.allclose(np.asarray(bodies.vel[1]), [2.0, 0.0, 0.0])
    # angular untouched without a point of application
    assert np.allclose(np.asarray(bodies.angvel[1]), 0.0)
    # statics immune (inv_mass 0)
    bodies = apply_impulse(bodies, 0, (5.0, 0.0, 0.0))
    assert np.allclose(np.asarray(bodies.vel[0]), 0.0)


def test_offset_impulse_spins():
    st, cfg = _box_on_ground()
    # push +x at a point above the COM: spins about -z? r x J with
    # r=(0,0.5,0), J=(1,0,0) -> (0.5*0 - 0*0, 0*1 - 0*0, 0*0 - 0.5*1)
    # = (0,0,-0.5); identity quat, so ang = inv_inertia_z * -0.5 z
    p = np.asarray(st.bodies.pos[1])
    bodies = apply_impulse(st.bodies, 1, (1.0, 0.0, 0.0),
                           point=p + np.array([0.0, 0.5, 0.0]))
    ang = np.asarray(bodies.angvel[1])
    expect_z = float(st.bodies.inv_inertia[1][2]) * -0.5
    assert np.allclose(ang, [0.0, 0.0, expect_z], atol=1e-6), ang
    assert np.allclose(np.asarray(bodies.vel[1]), [1.0, 0.0, 0.0])


def test_apply_force_is_dt_scaled_impulse():
    st, cfg = _box_on_ground()
    a = apply_force(st.bodies, 1, (3.0, 0.0, 0.0), cfg)
    b = apply_impulse(st.bodies, 1, (3.0 * cfg.dt, 0.0, 0.0))
    assert np.allclose(np.asarray(a.vel[1]), np.asarray(b.vel[1]))


def test_kicked_sleeper_wakes_and_moves():
    st, cfg = _box_on_ground(sleeping=True)
    st, _ = simulate(st, cfg, 200)           # settle + fall asleep
    assert not bool(st.sleep.awake[1])
    x0 = float(st.bodies.pos[1, 0])

    st = st.replace(bodies=apply_impulse(st.bodies, 1, (4.0, 0.0, 0.0)))
    st = wake(st, 1)
    assert bool(st.sleep.awake[1]) and int(st.sleep.idle[1]) == 0
    st, _ = simulate(st, cfg, 30)
    assert float(st.bodies.pos[1, 0]) > x0 + 0.2   # it actually slid
    assert not bool(jnp.any(jnp.isnan(st.bodies.pos)))
