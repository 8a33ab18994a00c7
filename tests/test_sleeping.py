"""Sleeping / island semantics (SURVEY.md C13)."""

import numpy as np
import pytest
import jax

from nudge_tpu.engine import simulate
from nudge_tpu.scenes import SceneBuilder, scene_stack


def run(builder, steps, **over):
    cfg = builder.auto_config(sleeping=True, sleep_frames=30, **over)
    st = builder.finalize(cfg)
    st, m = simulate(st, cfg, steps)
    return cfg, st, jax.tree.map(np.asarray, m)


def test_single_box_falls_asleep():
    b = SceneBuilder()
    b.add_static_box((50, 0.5, 50), (0, -0.5, 0))
    b.add_box((0.5, 0.5, 0.5), (0, 0.6, 0))
    cfg, st, m = run(b, 300)
    awake = np.asarray(st.sleep.awake)
    assert not awake[1], "settled box should be asleep"
    assert m.awake_count[-1] == 0
    # velocity zeroed, position held
    np.testing.assert_allclose(np.asarray(st.bodies.vel[1]), 0.0)
    assert abs(float(st.bodies.pos[1, 1]) - 0.5) < 0.02
    # awake_count dropped at some point and stayed down
    assert m.awake_count[0] == 1


@pytest.mark.slow
def test_sleeping_stack_wakes_on_impact():
    b = SceneBuilder()
    b.add_static_box((50, 0.5, 50), (0, -0.5, 0))
    for i in range(3):
        b.add_box((0.5, 0.5, 0.5), (0, 0.5 + i * 1.001, 0))
    # impactor box parked off to the side
    b.add_box((0.5, 0.5, 0.5), (-6.0, 0.5, 0), mass=4.0)
    cfg = b.auto_config(sleeping=True, sleep_frames=30)
    st = b.finalize(cfg)

    st, m1 = simulate(st, cfg, 250)
    awake_mid = np.asarray(st.sleep.awake)
    assert not awake_mid[1:4].any(), "stack should be asleep before impact"
    # parked pairs exist for the sleeping stack
    assert (np.asarray(st.sleep.pairs)[:, 0] >= 0).sum() >= 2

    # fire the impactor at the stack (state surgery: set velocity + wake it)
    import jax.numpy as jnp
    st = st.replace(
        bodies=st.bodies.replace(vel=st.bodies.vel.at[4].set(
            jnp.array([8.0, 0.0, 0.0]))),
        sleep=st.sleep.replace(awake=st.sleep.awake.at[4].set(True)),
    )
    st, m2 = simulate(st, cfg, 200)
    m2 = jax.tree.map(np.asarray, m2)
    # at impact the whole island must wake (instantly via parked pairs)
    assert m2.awake_count.max() >= 4, "impact should wake the stack"
    assert np.isfinite(np.asarray(st.bodies.pos)).all()


def test_sleeping_bodies_dont_consume_contacts():
    b = SceneBuilder()
    b.add_static_box((50, 0.5, 50), (0, -0.5, 0))
    for i in range(4):
        b.add_box((0.5, 0.5, 0.5), (i * 1.2, 0.6, 0))
    cfg, st, m = run(b, 300)
    assert m.awake_count[-1] == 0
    # once everything sleeps, pairs are dropped -> no live contacts
    assert m.contact_count[-1] == 0


@pytest.mark.slow
def test_sleep_disabled_keeps_everything_awake():
    b = SceneBuilder()
    b.add_static_box((50, 0.5, 50), (0, -0.5, 0))
    b.add_box((0.5, 0.5, 0.5), (0, 0.6, 0))
    cfg = b.auto_config(sleeping=False)
    st = b.finalize(cfg)
    st, m = simulate(st, cfg, 200)
    assert np.asarray(st.sleep.awake)[1]
    assert np.asarray(jax.tree.map(np.asarray, m).awake_count)[-1] == 1


def test_half_settled_pile_partial_sleep():
    """Boxes that settled sleep; a remote still-moving box stays awake and
    does not keep the settled island up (statics do not transmit wake)."""
    b = SceneBuilder()
    b.add_static_box((80, 0.5, 80), (0, -0.5, 0))
    b.add_box((0.5, 0.5, 0.5), (0, 0.55, 0))
    b.add_box((0.5, 0.5, 0.5), (1.01, 0.55, 0))
    # far-away box dropped late/high so it keeps moving past others' sleep time
    b.add_box((0.5, 0.5, 0.5), (40.0, 12.0, 0))
    cfg, st, m = run(b, 200)
    awake = np.asarray(st.sleep.awake)
    assert not awake[1] and not awake[2], "settled pair should sleep"


def test_sleeper_is_static_for_the_solver():
    """Regression: the solver must never write velocity into a sleeping
    body. Pre-fix, a sleeper under load took impulses every frame while
    advance() masked its pose update — the un-integrated velocity grew
    without bound and detonated on wake (settled-pile KE limit cycle whose
    onset coincided with the first bodies falling asleep)."""
    b = SceneBuilder()
    b.add_static_box((50, 0.5, 50), (0, -0.5, 0))
    b.add_box((0.5, 0.5, 0.5), (0, 0.6, 0))   # will be put to sleep
    b.add_box((0.5, 0.5, 0.5), (0, 1.7, 0))   # awake load on top
    cfg = b.auto_config(sleeping=True, sleep_frames=10_000)  # nobody sleeps
    st = b.finalize(cfg)
    st, _ = simulate(st, cfg, 120)  # settle the two-box stack

    # state surgery: force ONLY the bottom box asleep, keep the top awake
    st = st.replace(
        bodies=st.bodies.replace(
            vel=st.bodies.vel.at[1].set(0.0),
            angvel=st.bodies.angvel.at[1].set(0.0)),
        sleep=st.sleep.replace(awake=st.sleep.awake.at[1].set(False)),
    )
    st, m = simulate(st, cfg, 100)
    # the sleeper's velocity stays EXACTLY zero under sustained load
    np.testing.assert_array_equal(np.asarray(st.bodies.vel[1]), 0.0)
    np.testing.assert_array_equal(np.asarray(st.bodies.angvel[1]), 0.0)
    # and the slow awake box on top neither wakes it nor destabilizes
    assert not bool(np.asarray(st.sleep.awake)[1])
    assert float(np.asarray(m.kinetic_energy)[-1]) < 1.0


@pytest.mark.slow
def test_impact_on_sleeping_pile_wakes_absorbs_resleeps():
    """Wake quality at scale: drop a heavy box onto a fully/mostly sleeping
    pile. The island must wake locally, absorb the impact without capacity
    overflow or energy blow-up (cold warm-start on wake is by design —
    parked pairs lose their cache rows, like the reference), and go back to
    sleep."""
    from nudge_tpu.scenes import scene_pile

    b = scene_pile(128, seed=5)
    # impactor added last: heavy, parked high above the pile. add_box returns
    # the body index (bodies are padded to cfg.max_bodies in finalize, so
    # st.bodies.n - 1 would be a padding slot, NOT the impactor).
    imp = b.add_box((0.6, 0.6, 0.6), (0.0, 14.0, 0.0), mass=8.0)
    cfg = b.auto_config(sleeping=True, persistent_broadphase=True,
                        max_box_box_pairs=5 * 129, max_manifolds=2 * 129,
                        grid_density=16)
    st = b.finalize(cfg)
    # park the impactor ASLEEP mid-air (sleepers do not integrate) so the
    # pile can fully settle and sleep under it first
    st = st.replace(sleep=st.sleep.replace(
        awake=st.sleep.awake.at[imp].set(False)))

    st, m1 = simulate(st, cfg, 400)  # pile settles and falls asleep
    m1 = jax.tree.map(np.asarray, m1)
    assert m1.awake_count[-1] <= 13, "pile should be (nearly) asleep"

    # release the impactor: it free-falls ~7 units onto the sleeping pile
    st = st.replace(sleep=st.sleep.replace(
        awake=st.sleep.awake.at[imp].set(True)))
    st, m2 = simulate(st, cfg, 500)  # impact + absorb + resettle + resleep
    m2 = jax.tree.map(np.asarray, m2)

    assert not m1.overflow.any() and not m2.overflow.any()
    assert np.isfinite(np.asarray(st.bodies.pos)).all()
    # the impact woke part of the pile...
    assert m2.awake_count.max() >= 5, "impact should wake the local island"
    # ...and it quiesced again: nearly everyone asleep, KE tiny
    assert m2.awake_count[-1] <= 13  # <10% of the pile
    assert m2.kinetic_energy[-1] < 1.0
