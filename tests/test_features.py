"""Feature-completeness tests: restitution, multi-collider bodies with local
transforms, coloring invariant, metrics sanity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nudge_tpu.engine import simulate
from nudge_tpu.ops.cache import read_cached_impulses
from nudge_tpu.ops.contacts import collide
from nudge_tpu.ops.integrate import apply_gravity
from nudge_tpu.ops.solver import setup_constraints
from nudge_tpu.scenes import SceneBuilder, box_inertia_inv
from nudge_tpu.utils.debug import coloring_conflicts, finite_state


@pytest.mark.slow
def test_restitution_bounce():
    """e=0.8 sphere bounces back up; e=0 box stops dead."""
    b = SceneBuilder()
    b.add_static_box((50, 0.5, 50), (0, -0.5, 0))
    b.add_sphere(0.5, (0, 3.0, 0))
    cfg = b.auto_config(restitution=0.8)
    st, m = simulate(b.finalize(cfg), cfg, 60)   # impact around step ~43
    peak = 0.0
    for _ in range(10):
        st, _ = simulate(st, cfg, 15)            # st is donated each call
        peak = max(peak, float(st.bodies.pos[1, 1]))
    assert peak > 1.0, f"restitution bounce too low: {peak}"

    cfg0 = b.auto_config(restitution=0.0)
    st0, _ = simulate(b.finalize(cfg0), cfg0, 240)
    assert abs(float(st0.bodies.pos[1, 1]) - 0.5) < 0.02  # settled, no bounce


def test_multi_collider_body_local_transforms():
    """A rigid dumbbell: one body, two boxes attached at local offsets. It
    must rest on its two feet and stay rigid (reference: collider Transform
    with body link + local placement, SURVEY C1)."""
    b = SceneBuilder()
    b.add_static_box((50, 0.5, 50), (0, -0.5, 0))
    half = np.array([0.4, 0.4, 0.4], np.float32)
    body = b.add_body((0, 1.2, 0), inv_mass=1.0 / 2.0,
                      inv_inertia=box_inertia_inv(2.0, np.array([1.4, 0.4, 0.4])))
    b.attach_box(body, half, lpos=(-1.0, 0, 0))
    b.attach_box(body, half, lpos=(+1.0, 0, 0))
    cfg = b.auto_config()
    st, m = simulate(b.finalize(cfg), cfg, 400)
    pos = np.asarray(st.bodies.pos[1])
    quat = np.asarray(st.bodies.quat[1])
    assert abs(pos[1] - 0.4) < 0.02, pos          # rests on the 0.4-half feet
    # stays level (no roll): rotation small
    assert abs(quat[0]) < 0.05 and abs(quat[2]) < 0.05
    assert finite_state(st)


@pytest.mark.slow
def test_coloring_conflict_free_invariant():
    from nudge_tpu.scenes import scene_pile

    b = scene_pile(64, sphere_frac=0.25, seed=5)
    cfg = b.auto_config()
    st = b.finalize(cfg)
    st, _ = simulate(st, cfg, 100)
    bodies = apply_gravity(st.bodies, st.sleep, cfg)
    man, _ = collide(st, cfg)
    warm, pwarm = read_cached_impulses(st.cache, man)
    con, _, _ = setup_constraints(bodies, man, warm, cfg, pwarm=pwarm)
    if int(con.spill_count) == 0:
        assert int(coloring_conflicts(con, st.bodies)) == 0


def test_persistent_coloring_hits_reuse_colors():
    """Second coloring of the same contact set must return the cached colors
    verbatim (all joins hit, zero greedy rounds) and stay conflict-free."""
    import jax
    from nudge_tpu.engine import simulate
    from nudge_tpu.ops.contacts import collide
    from nudge_tpu.ops.solver import color_manifolds_cached
    from nudge_tpu.scenes import scene_pile
    from nudge_tpu.state import empty_color_cache
    from nudge_tpu.utils.debug import coloring_conflicts

    b = scene_pile(32, seed=4)
    cfg = b.auto_config()
    st, _ = simulate(b.finalize(cfg), cfg, 60)
    man, _ = jax.jit(lambda s: collide(s, cfg))(st)

    cold, cache1 = color_manifolds_cached(
        man, st.bodies, cfg, empty_color_cache(cfg))
    warm, cache2 = color_manifolds_cached(man, st.bodies, cfg, cache1)

    np.testing.assert_array_equal(np.asarray(cold[0]), np.asarray(warm[0]))
    assert int(cold[3]) == 0  # no spill on a small settled pile
    from types import SimpleNamespace
    con = SimpleNamespace(color=warm[0], body_a=man.body_a,
                          body_b=man.body_b, valid=man.valid)
    assert int(coloring_conflicts(con, st.bodies)) == 0
