"""Golden-scene integration tests (SURVEY.md §4 item 3) + solver behavior
micro-tests (item 2) + determinism (item 4), on small scenes so they run in CI
on the CPU backend."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nudge_tpu.engine import simulate, step
from nudge_tpu.scenes import (
    SceneBuilder, scene_pyramid, scene_single_box, scene_stack,
)


def rollout(builder, steps, **cfg_over):
    cfg = builder.auto_config(**cfg_over)
    st = builder.finalize(cfg)
    st, m = simulate(st, cfg, steps)
    return cfg, st, jax.tree.map(np.asarray, m)


def test_single_box_settles():
    """BASELINE config 1: drop, settle, rest penetration <= slop, no jitter."""
    cfg, st, m = rollout(scene_single_box(2.0), 500)
    pos = np.asarray(st.bodies.pos[1])
    vel = np.asarray(st.bodies.vel[1])
    assert abs(pos[1] - 0.5) <= cfg.slop + 1e-3, pos
    assert np.linalg.norm(vel) < 1e-3
    assert np.linalg.norm(np.asarray(st.bodies.angvel[1])) < 1e-2
    # no NaN anywhere, no overflow
    assert np.isfinite(np.asarray(st.bodies.pos)).all()
    assert not m.overflow.any()
    # kinetic energy near zero at the end
    assert m.kinetic_energy[-1] < 1e-5


@pytest.mark.slow
def test_single_box_no_tunnel_fast_drop():
    b = SceneBuilder()
    b.add_static_box((50, 0.5, 50), (0, -0.5, 0))
    b.add_box((0.5, 0.5, 0.5), (0, 4.0, 0), vel=(0, -20.0, 0))
    cfg, st, m = rollout_from(b, 300)
    pos = np.asarray(st.bodies.pos[1])
    assert abs(pos[1] - 0.5) < 0.05, pos


def rollout_from(builder, steps, **cfg_over):
    return rollout(builder, steps, **cfg_over)


def test_stack_3_boxes_survives():
    """Mini config 2: 1x3x1 column stays standing 500 steps."""
    b = scene_stack(nx=1, ny=3, nz=1)
    cfg, st, m = rollout(b, 500)
    pos = np.asarray(st.bodies.pos[1:4])
    # x/z drift bounded, heights preserved
    np.testing.assert_allclose(pos[:, 1], [0.5, 1.5, 2.5], atol=0.05)
    assert np.abs(pos[:, [0, 2]]).max() < 0.08, pos
    assert not m.overflow.any()


def test_pyramid_survives():
    b = scene_pyramid(base=4)
    cfg, st, m = rollout(b, 400)
    pos = np.asarray(st.bodies.pos[1:11])
    assert np.isfinite(pos).all()
    # top box of a 4-pyramid should stay near its start (layer 3)
    top = pos[-1]
    assert abs(top[1] - (0.5 + 3 * 1.001)) < 0.1, top
    assert abs(top[0]) < 0.15 and abs(top[2]) < 0.15


def test_box_slides_down_then_friction_stops_it():
    """Box on ground with initial horizontal velocity: friction must stop it."""
    b = SceneBuilder()
    b.add_static_box((50, 0.5, 50), (0, -0.5, 0), friction=0.6)
    b.add_box((0.5, 0.5, 0.5), (0, 0.5, 0), vel=(3.0, 0, 0), friction=0.6)
    cfg, st, m = rollout_from(b, 300)
    vel = np.asarray(st.bodies.vel[1])
    assert np.linalg.norm(vel) < 5e-2, vel
    # μ=0.6: v=3 stops after v/(μg) ≈ 0.51s ≈ 31 steps; travel ≈ 0.76m
    x = float(st.bodies.pos[1, 0])
    assert 0.4 < x < 1.2, x


def test_frictionless_box_keeps_sliding():
    b = SceneBuilder()
    b.add_static_box((50, 0.5, 50), (0, -0.5, 0), friction=0.0)
    b.add_box((0.5, 0.5, 0.5), (0, 0.5, 0), vel=(2.0, 0, 0), friction=0.0)
    cfg, st, m = rollout_from(b, 120)
    vel = np.asarray(st.bodies.vel[1])
    np.testing.assert_allclose(vel[0], 2.0, atol=0.05)


def test_sphere_rests_on_ground():
    b = SceneBuilder()
    b.add_static_box((50, 0.5, 50), (0, -0.5, 0))
    b.add_sphere(0.5, (0, 2.0, 0))
    cfg, st, m = rollout_from(b, 400)
    pos = np.asarray(st.bodies.pos[1])
    assert abs(pos[1] - 0.5) <= cfg.slop + 2e-3, pos


def test_sphere_on_box_mixed():
    b = SceneBuilder()
    b.add_static_box((50, 0.5, 50), (0, -0.5, 0))
    b.add_box((0.5, 0.5, 0.5), (0, 0.5, 0))
    b.add_sphere(0.3, (0, 1.6, 0))
    cfg, st, m = rollout_from(b, 400)
    pos = np.asarray(st.bodies.pos)
    assert abs(pos[1, 1] - 0.5) < 0.02
    assert abs(pos[2, 1] - 1.3) < 0.02
    assert np.isfinite(pos).all()


def test_two_spheres_stack():
    b = SceneBuilder()
    b.add_static_box((50, 0.5, 50), (0, -0.5, 0))
    b.add_sphere(0.5, (0, 0.5, 0))
    b.add_sphere(0.5, (0.01, 1.5, 0))
    cfg, st, m = rollout_from(b, 200)
    assert np.isfinite(np.asarray(st.bodies.pos)).all()


def test_connections_suppress_contact():
    """BodyConnections parity (SURVEY C14): connected bodies interpenetrate."""
    b = SceneBuilder()
    ground = b.add_static_box((50, 0.5, 50), (0, -0.5, 0))
    box = b.add_box((0.5, 0.5, 0.5), (0, 0.3, 0))  # overlapping the ground
    b.connect(ground, box)
    cfg, st, m = rollout_from(b, 30)
    # no contacts ever formed -> box is in free fall through the ground
    assert m.contact_count.max() == 0
    assert float(st.bodies.pos[1, 1]) < 0.0


def test_determinism_bitwise():
    b = scene_stack(nx=2, ny=2, nz=1)
    cfg = b.auto_config()
    st0 = b.finalize(cfg)
    st1, m1 = simulate(st0, cfg, 100)
    st0b = b.finalize(cfg)
    st2, m2 = simulate(st0b, cfg, 100)
    np.testing.assert_array_equal(np.asarray(st1.bodies.pos),
                                  np.asarray(st2.bodies.pos))
    np.testing.assert_array_equal(np.asarray(st1.bodies.quat),
                                  np.asarray(st2.bodies.quat))


@pytest.mark.slow
def test_warm_start_reduces_residual_jitter():
    """With warm starting the settled stack should be at least as calm."""
    b = scene_stack(nx=1, ny=3, nz=1)
    cfg_w = b.auto_config()
    cfg_c = b.auto_config(warm_start=False)
    st_w, m_w = simulate(b.finalize(cfg_w), cfg_w, 400)
    st_c, m_c = simulate(b.finalize(cfg_c), cfg_c, 400)
    ke_w = np.asarray(m_w.kinetic_energy[-50:]).mean()
    ke_c = np.asarray(m_c.kinetic_energy[-50:]).mean()
    assert ke_w <= ke_c * 2 + 1e-6  # warm start shouldn't be wildly worse
    assert np.isfinite(np.asarray(st_w.bodies.pos)).all()


def test_overflow_flag_not_corruption():
    """Tiny contact capacity: the overflow flag raises, sim stays finite
    (SURVEY §4 item 7)."""
    b = scene_stack(nx=2, ny=2, nz=2)
    cfg = b.auto_config(max_manifolds=4)
    st = b.finalize(cfg)
    st, m = simulate(st, cfg, 50)
    assert m.overflow.any()
    assert np.isfinite(np.asarray(st.bodies.pos)).all()
