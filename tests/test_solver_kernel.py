"""Pallas solver mega-kernel (M5) vs XLA solve.

Given identical inputs, the kernel is arithmetically identical to the XLA
color-pass solve (one-hot f32 matmul gathers/scatters are exact) — verified
bitwise on a single solve. Full rollouts are compared behaviorally: embedding
a pallas_call changes XLA fusion boundaries in the surrounding stages, so
trajectories drift apart in the last float bits and chaos amplifies that.
"""

from functools import partial

import numpy as np
import jax
import pytest

from nudge_tpu.engine import simulate
from nudge_tpu.ops.cache import read_cached_impulses
from nudge_tpu.ops.contacts import collide
from nudge_tpu.ops.integrate import apply_gravity
from nudge_tpu.ops.solver import setup_constraints, solve
from nudge_tpu.ops.solver_kernel import kernel_fits, solve_pallas
from nudge_tpu.scenes import SceneBuilder, scene_pile, scene_stack


def solve_inputs(builder, settle_steps, **over):
    cfg = builder.auto_config(**over)
    st = builder.finalize(cfg)
    st, _ = simulate(st, cfg, settle_steps)
    bodies = apply_gravity(st.bodies, st.sleep, cfg)
    man, _ = collide(st, cfg)
    warm, pwarm = read_cached_impulses(st.cache, man)
    con, bodies, acc = setup_constraints(bodies, man, warm, cfg, pwarm=pwarm)
    return cfg, bodies, con, acc


def assert_solves_equal(cfg, bodies, con, acc):
    bx, accx, psx, pax = jax.jit(partial(solve, cfg=cfg))(bodies, con, acc)
    bp, accp, psp, pap = jax.jit(partial(solve_pallas, cfg=cfg, interpret=True))(
        bodies, con, acc)
    np.testing.assert_array_equal(np.asarray(bx.vel), np.asarray(bp.vel))
    np.testing.assert_array_equal(np.asarray(bx.angvel), np.asarray(bp.angvel))
    for a, p in zip(accx, accp):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(p))
    for x, p in zip(psx, psp):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(p))
    np.testing.assert_array_equal(np.asarray(pax), np.asarray(pap))


@pytest.mark.slow
def test_kernel_bitwise_stack():
    cfg, bodies, con, acc = solve_inputs(scene_stack(nx=2, ny=3, nz=1), 50)
    assert_solves_equal(cfg, bodies, con, acc)


@pytest.mark.slow
def test_kernel_bitwise_mixed_pile():
    cfg, bodies, con, acc = solve_inputs(scene_pile(24, sphere_frac=0.3,
                                                    seed=2), 80)
    assert int(con.n_colors) >= 3  # make sure multiple colors are exercised
    assert_solves_equal(cfg, bodies, con, acc)


@pytest.mark.slow
def test_kernel_bitwise_falling_no_contacts():
    b = SceneBuilder()
    b.add_static_box((50, 0.5, 50), (0, -0.5, 0))
    b.add_box((0.5, 0.5, 0.5), (0, 5.0, 0))
    cfg, bodies, con, acc = solve_inputs(b, 1)
    assert_solves_equal(cfg, bodies, con, acc)


@pytest.mark.slow
def test_kernel_bitwise_friction_slide():
    b = SceneBuilder()
    b.add_static_box((50, 0.5, 50), (0, -0.5, 0), friction=0.7)
    b.add_box((0.5, 0.5, 0.5), (0, 0.5, 0), vel=(3.0, 0, 0), friction=0.7)
    b.add_box((0.5, 0.5, 0.5), (0.1, 1.55, 0))
    cfg, bodies, con, acc = solve_inputs(b, 20)
    assert_solves_equal(cfg, bodies, con, acc)


@pytest.mark.slow
def test_kernel_full_rollout_behavior():
    """End-to-end rollout with the kernel: settles like the XLA path."""
    b = scene_stack(nx=1, ny=3, nz=1)
    cfg = b.auto_config(solver="pallas_interpret")
    st, m = simulate(b.finalize(cfg), cfg, 300)
    pos = np.asarray(st.bodies.pos[1:4])
    np.testing.assert_allclose(pos[:, 1], [0.5, 1.5, 2.5], atol=0.05)
    assert np.abs(pos[:, [0, 2]]).max() < 0.08
    assert float(jax.tree.map(np.asarray, m).kinetic_energy[-1]) < 1e-4


def test_kernel_fits_estimate(monkeypatch):
    # pin the probe-blessed v5e budget: on unprobed chips (and this CPU
    # test backend) _vmem_budget_bytes falls back to a conservative 12MB
    # (ADVICE r3), which would flip the capacity assertions below
    monkeypatch.setenv("NUDGE_VMEM_BUDGET_MB", "96")
    b = scene_pile(64)
    cfg = b.auto_config()
    assert kernel_fits(cfg, cfg.max_bodies)
    # config 4 (20k bodies, capacity-tuned manifolds = 3x bodies) rides the
    # kernel path — with real headroom since the VMEM re-measure (v5e holds
    # ~120MB resident, kernel_fits budgets 96MB)
    assert kernel_fits(cfg.replace(max_manifolds=61440), 20480)
    # without the split-impulse pseudo channel there is room for ~60k bodies
    assert kernel_fits(cfg.replace(split_impulse=False), 60000)
    # accumulators stay resident: very large manifold caps do not fit
    assert not kernel_fits(cfg.replace(max_manifolds=1_500_000), 20480)
    # body table is resident: millions of bodies do not fit
    assert not kernel_fits(cfg, 2_000_000)
    # unprobed chip (this CPU backend): conservative 12MB floor — the
    # config-4 capacities must NOT claim to fit, so auto dispatch takes the
    # graceful XLA path instead of risking a Mosaic OOM (ADVICE r3)
    monkeypatch.delenv("NUDGE_VMEM_BUDGET_MB")
    assert not kernel_fits(cfg.replace(max_manifolds=61440), 20480)
