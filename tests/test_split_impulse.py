"""Split-impulse position correction (round-1 verdict item 4).

The defining behavioral difference from Baumgarte: penetration recovery must
not inject momentum. A box spawned deeply overlapping the ground must be
pushed OUT by position correction (pose changes) while its velocity stays
near zero — Baumgarte instead launches it ("popping").
"""

import numpy as np
import pytest

from nudge_tpu.engine import simulate
from nudge_tpu.scenes import SceneBuilder


def drop_overlapping(split, overlap=0.12, vel=(0, 0, 0)):
    b = SceneBuilder()
    b.add_static_box((10, 0.5, 10), (0, -0.5, 0))
    b.add_box((0.5, 0.5, 0.5), (0, 0.5 - overlap, 0), vel=vel)
    cfg = b.auto_config(split_impulse=split)
    st, m = simulate(b.finalize(cfg), cfg, 120)
    return (np.asarray(st.bodies.pos)[1],
            np.asarray(m.kinetic_energy),
            np.asarray(m.max_depth))


def test_depenetration_without_momentum():
    # overlap below deep_bias_depth: pure position-level recovery
    pos, ke, depth = drop_overlapping(split=True)
    # recovered to rest height (within slop) ...
    assert abs(pos[1] - 0.495) < 0.01
    assert depth[-1] < 0.01
    # ... without ever acquiring real kinetic energy: Baumgarte at this
    # overlap injects bias velocity ~2 m/s (ke ~2 J); pseudo velocities
    # must leave momentum untouched up to gravity/contact noise
    assert ke.max() < 0.05


def test_baumgarte_pops_for_contrast():
    """Documents the artifact split impulse removes (and guards the flag:
    if split_impulse=False stopped meaning Baumgarte, this fails)."""
    pos, ke, depth = drop_overlapping(split=False)
    assert ke.max() > 0.2       # bias velocity turned into real energy
    assert abs(pos[1] - 0.495) < 0.05   # it still ends up resting


def test_deep_overlap_at_rest_stays_gated():
    """Beyond deep_bias_depth but at REST the emergency term must stay
    gated off (SimConfig.deep_bias_gate: the pre-solve approach velocity is
    just the gravity kick, inside the deadband) — recovery is pure position
    correction, no pop, and it still reaches rest. Holds in the band
    deep_bias_depth < depth < deep_bias_ungated_depth; deeper overlaps get
    the capped ungated anti-creep push (next test)."""
    pos, ke, depth = drop_overlapping(split=True, overlap=0.2)
    assert ke.max() < 0.05      # no bias trampoline on a resting contact
    assert abs(pos[1] - 0.495) < 0.02
    assert depth[-1] < 0.01


def test_ungated_anti_creep_push_is_gentle():
    """Beyond deep_bias_ungated_depth even a RESTING contact gets a small
    velocity push (round-3 fix: quasi-static column creep slips under the
    approach gate and compacted the 20,480 pile through the ground slab).
    The push is capped at deep_bias_ungated_vel — it must recover the box
    without anything like the ~2 J Baumgarte pop, and must damp out."""
    pos, ke, depth = drop_overlapping(split=True, overlap=0.35)
    # bounded by ½·m·v_cap² = 0.125 J (+ contact/gravity noise)
    assert ke.max() < 0.2
    assert ke[-1] < 1e-3        # the gentle pop damps, no trampoline
    assert abs(pos[1] - 0.495) < 0.02
    assert depth[-1] < 0.01


def test_deep_bias_gate_opens_on_approach():
    """A deep overlap that is ACTIVELY compressing (arriving at speed) must
    get the emergency velocity bias: real separating momentum beyond what
    the impact itself would leave (deep-pile impacts out-compress the
    position-only recovery — see SimConfig.deep_bias_depth)."""
    pos, ke, depth = drop_overlapping(split=True, overlap=0.25,
                                      vel=(0, -4.0, 0))
    # after the arrival frame the solver must have turned approach into
    # separation (bias > 0): the box carries upward momentum for a while
    assert ke[1:10].max() > 0.05
    # and it recovers to rest cleanly
    assert abs(pos[1] - 0.495) < 0.02
    assert depth[-1] < 0.01


def test_pseudo_warm_start_carries_through_cache():
    """After a settled step the cache must carry pseudo impulses > 0 for
    loaded contacts (the warm start that fixes deep-pile under-convergence),
    and they must be read back on the next step."""
    import jax

    from nudge_tpu.ops.cache import read_cached_impulses
    from nudge_tpu.ops.contacts import collide
    from nudge_tpu.scenes import SceneBuilder

    b = SceneBuilder()
    b.add_static_box((10, 0.5, 10), (0, -0.5, 0))
    for k in range(6):
        b.add_box((0.5, 0.5, 0.5), (0, 0.5 + 1.0 * k + 0.001, 0))
    cfg = b.auto_config(split_impulse=True)
    st, _ = simulate(b.finalize(cfg), cfg, 200)
    # the tower compresses under gravity; the pseudo solve must be active
    # at rest (it balances the per-step sink) and cached for warm starting
    assert float(st.cache.pseudo.max()) > 0.0
    man, _ = jax.jit(lambda s: collide(s, cfg))(st)
    _, pwarm = jax.jit(
        lambda s, m: read_cached_impulses(s.cache, m))(st, man)
    assert float(np.asarray(pwarm).max()) > 0.0


def _tower_run(split, iters, steps=600):
    b = SceneBuilder()
    b.add_static_box((10, 0.5, 10), (0, -0.5, 0))
    for k in range(12):
        b.add_box((0.5, 0.5, 0.5), (0.01 * (k % 2), 0.5 + 1.0 * k, 0))
    cfg = b.auto_config(split_impulse=split, solver_iters=iters)
    st, m = simulate(b.finalize(cfg), cfg, steps)
    return (np.asarray(m.kinetic_energy),
            np.asarray(st.bodies.pos)[12, 1])


@pytest.mark.slow
def test_tall_stack_low_iters_quieter_than_baumgarte():
    """12-box tower at only 10 solver iterations: the warm-started split
    pseudo solve must leave markedly less residual jitter than Baumgarte at
    the same budget (measured: ~5x less), and the tower must stand."""
    ke_s, top_s = _tower_run(split=True, iters=10)
    ke_b, top_b = _tower_run(split=False, iters=10)
    assert ke_s[-200:].mean() < 0.6 * ke_b[-200:].mean()
    assert abs(top_s - 11.45) < 0.25


@pytest.mark.slow
def test_tall_stack_default_iters_stands_quiet():
    """Same tower at the default iteration budget: micro-jitter bounded and
    no sinking/creep of the top box over 10 simulated seconds."""
    ke, top = _tower_run(split=True, iters=20)
    assert ke[-200:].mean() < 0.15
    assert abs(top - 11.45) < 0.1


@pytest.mark.slow
def test_stack_settles_with_split_impulse():
    b = SceneBuilder()
    b.add_static_box((10, 0.5, 10), (0, -0.5, 0))
    for i in range(4):
        b.add_box((0.5, 0.5, 0.5), (0, 0.5 + i * 1.002, 0))
    cfg = b.auto_config(split_impulse=True)
    st, m = simulate(b.finalize(cfg), cfg, 400)
    pos = np.asarray(st.bodies.pos)[1:5]
    np.testing.assert_allclose(pos[:, 1], [0.5, 1.5, 2.5, 3.5], atol=0.05)
    assert float(np.asarray(m.kinetic_energy)[-1]) < 1e-4
