"""Pallas setup kernel vs XLA setup_constraints (fused M5+ path).

The setup kernel computes the packed constraint tensor on-chip; the XLA path
computes it with jnp ops and packs it with scatters. Live lanes must match to
float-reassociation tolerance; dead/padding lanes legitimately differ (XLA
zero-fills, the kernel computes benign values) and are excluded — the solve
masks them by the `live` row.
"""

import numpy as np
import jax
import pytest

from nudge_tpu.engine import simulate
from nudge_tpu.ops.cache import read_cached_impulses
from nudge_tpu.ops.contacts import collide
from nudge_tpu.ops.integrate import apply_gravity
from nudge_tpu.ops.setup_kernel import (
    color_slots, setup_pallas, setup_solve_fused,
)
from nudge_tpu.ops.solver import (
    accumulated_world_impulse, color_manifolds, setup_constraints, solve,
)
from nudge_tpu.ops.solver_kernel import pack_solver_inputs
from nudge_tpu.scenes import SceneBuilder, scene_pile

pytestmark = pytest.mark.slow  # interpret-mode kernels / long rollouts


@pytest.fixture(scope="module")
def pile_inputs():
    b = scene_pile(24, sphere_frac=0.3, seed=2)
    cfg = b.auto_config()
    st = b.finalize(cfg)
    st, _ = simulate(st, cfg, 80)
    bodies = apply_gravity(st.bodies, st.sleep, cfg)
    man, _ = collide(st, cfg)
    warm, pwarm = read_cached_impulses(st.cache, man)
    return cfg, bodies, man, warm


def test_setup_kernel_matches_xla_pack(pile_inputs):
    cfg, bodies, man, warm = pile_inputs
    con, bodies_x, acc = setup_constraints(bodies, man, warm, cfg)
    velw_x, cf_x, af_x, _afp_x, (tmin_x, tmax_x, bits_x), slot_x = \
        pack_solver_inputs(bodies_x, con, acc, cfg)

    color, _, relax, _ = color_manifolds(man, bodies, cfg)
    slot_p, mpad = color_slots(color, man, bodies, cfg)
    velw_p, cf_p, af_p, _pacc_p, (tmin_p, tmax_p, bits_p) = setup_pallas(
        bodies, man, warm, relax, slot_p, mpad, cfg, interpret=True)

    np.testing.assert_array_equal(np.asarray(slot_x), np.asarray(slot_p))
    np.testing.assert_array_equal(np.asarray(tmin_x), np.asarray(tmin_p))
    np.testing.assert_array_equal(np.asarray(tmax_x), np.asarray(tmax_p))
    np.testing.assert_array_equal(np.asarray(bits_x), np.asarray(bits_p))
    live = np.asarray(cf_x)[125] > 0.5
    assert live.any()
    np.testing.assert_allclose(
        np.asarray(cf_x)[:, live], np.asarray(cf_p)[:, live], atol=2e-5)
    np.testing.assert_allclose(np.asarray(af_x), np.asarray(af_p), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(velw_x), np.asarray(velw_p), atol=1e-5)


def test_fused_solve_matches_xla_solve(pile_inputs):
    cfg, bodies, man, warm = pile_inputs
    con, bodies_x, acc = setup_constraints(bodies, man, warm, cfg)
    bodies_sx, acc_sx, pseudo_x, pacc_x = solve(bodies_x, con, acc, cfg)
    world_x = accumulated_world_impulse(con, acc_sx)

    bodies_f, world_f, spill_f, pseudo_f, pacc_f = setup_solve_fused(
        bodies, man, warm, cfg, interpret=True)

    np.testing.assert_allclose(
        np.asarray(bodies_sx.vel), np.asarray(bodies_f.vel), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(bodies_sx.angvel), np.asarray(bodies_f.angvel), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(world_x), np.asarray(world_f), atol=1e-5)
    for x, f in zip(pseudo_x, pseudo_f):
        np.testing.assert_allclose(np.asarray(x), np.asarray(f), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pacc_x), np.asarray(pacc_f),
                               atol=1e-5)
    assert int(spill_f) == int(con.spill_count)


def test_fused_rollout_settles():
    """Short end-to-end rollout through engine.step's fused dispatch."""
    b = SceneBuilder()
    b.add_static_box((50, 0.5, 50), (0, -0.5, 0))
    b.add_box((0.5, 0.5, 0.5), (0, 0.6, 0))
    cfg = b.auto_config(solver="pallas_interpret")
    st, m = simulate(b.finalize(cfg), cfg, 120)
    pos = np.asarray(st.bodies.pos[1])
    assert abs(pos[1] - 0.5) < 0.02
    assert float(np.asarray(m.kinetic_energy[-1])) < 1e-4


def test_fused_rollout_sleeps():
    """Kernel-path rollout with sleeping: sleeper-as-static masking, the
    dynbits color-cache guard, and the all-asleep lax.cond fast path all
    execute through the fused Pallas dispatch (interpret mode)."""
    b = SceneBuilder()
    b.add_static_box((50, 0.5, 50), (0, -0.5, 0))
    b.add_box((0.5, 0.5, 0.5), (0, 0.6, 0))
    b.add_box((0.5, 0.5, 0.5), (0, 1.7, 0))
    cfg = b.auto_config(solver="pallas_interpret", sleeping=True,
                        sleep_frames=20)
    st, m = simulate(b.finalize(cfg), cfg, 200)
    m = jax.tree.map(np.asarray, m)
    assert m.awake_count[-1] == 0, "stack should be fully asleep"
    np.testing.assert_array_equal(np.asarray(st.bodies.vel[1:3]), 0.0)
    assert abs(float(st.bodies.pos[2, 1]) - 1.5) < 0.05
    assert not m.overflow.any()
