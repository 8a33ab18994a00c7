"""Persistent (amortized) broadphase equivalence with per-step rebuild."""

import numpy as np
import jax

from nudge_tpu.engine import simulate
from nudge_tpu.scenes import SceneBuilder, scene_pile
import pytest

pytestmark = pytest.mark.slow  # interpret-mode kernels / long rollouts


def test_persistent_matches_full_rebuild():
    b = scene_pile(48, seed=3)
    cfg_off = b.auto_config(persistent_broadphase=False)
    cfg_on = b.auto_config(persistent_broadphase=True)
    st_off = b.finalize(cfg_off)
    st_on = b.finalize(cfg_on)
    for _ in range(6):
        st_off, m0 = simulate(st_off, cfg_off, 20)
        st_on, m1 = simulate(st_on, cfg_on, 20)
    # same contacts and (near-)identical trajectories: the cached fat set is
    # a superset, the tight re-filter reduces it to the same live set
    m0 = jax.tree.map(np.asarray, m0)
    m1 = jax.tree.map(np.asarray, m1)
    assert m0.contact_count[-1] == m1.contact_count[-1]
    np.testing.assert_allclose(np.asarray(st_off.bodies.pos),
                               np.asarray(st_on.bodies.pos), atol=1e-4)
    assert not m1.overflow.any()


def test_persistent_sleeping_wake_pairs():
    """Sleeping pairs are filtered per step, not baked into the cache, so a
    woken island reconnects instantly."""
    b = SceneBuilder()
    b.add_static_box((50, 0.5, 50), (0, -0.5, 0))
    for i in range(3):
        b.add_box((0.5, 0.5, 0.5), (0, 0.5 + i * 1.001, 0))
    b.add_box((0.5, 0.5, 0.5), (-6.0, 0.5, 0), mass=4.0)
    cfg = b.auto_config(sleeping=True, sleep_frames=30,
                        persistent_broadphase=True)
    st = b.finalize(cfg)
    st, m1 = simulate(st, cfg, 250)
    assert not np.asarray(st.sleep.awake)[1:4].any()
    import jax.numpy as jnp
    st = st.replace(
        bodies=st.bodies.replace(vel=st.bodies.vel.at[4].set(
            jnp.array([8.0, 0.0, 0.0]))),
        sleep=st.sleep.replace(awake=st.sleep.awake.at[4].set(True)),
    )
    st, m2 = simulate(st, cfg, 200)
    m2 = jax.tree.map(np.asarray, m2)
    assert m2.awake_count.max() >= 4
    assert np.isfinite(np.asarray(st.bodies.pos)).all()


def test_fat_rebuild_capacity_lattice_spawn():
    """Regression (round 2, 20480-pile free fall): the fat speculative
    rebuild catches ~13 half-stencil neighbors/body on a lattice spawn —
    structurally more than the tight pair capacity. Before fat caps existed
    the rebuild overflowed at spawn and wholesale-dropped most pairs; the
    starved bodies fell through the pile forever (KE grows linearly, contact
    count pinned at the ground layer). 256 bodies with the bench's 5x-bodies
    pair tuning reproduces the same ratio."""
    n = 256
    b = scene_pile(n, seed=1)
    kw = dict(max_box_box_pairs=5 * n, max_manifolds=2 * n, grid_density=16)
    cfg_on = b.auto_config(persistent_broadphase=True, **kw)
    cfg_off = b.auto_config(persistent_broadphase=False, **kw)
    st_on = b.finalize(cfg_on)
    st_off = b.finalize(cfg_off)
    for _ in range(4):
        st_on, m1 = simulate(st_on, cfg_on, 25)
        st_off, m0 = simulate(st_off, cfg_off, 25)
    m0 = jax.tree.map(np.asarray, m0)
    m1 = jax.tree.map(np.asarray, m1)
    assert not m1.overflow.any(), "fat rebuild must not overflow on a lattice"
    # the pile must actually be forming contacts, and as many as the
    # per-step-rebuild ground truth
    assert m1.contact_count[-1] > n
    assert m1.contact_count[-1] == m0.contact_count[-1]
    # no free fall: kinetic energy bounded (ground truth within 2x)
    assert m1.kinetic_energy[-1] < 2.0 * m0.kinetic_energy[-1] + 1e3
