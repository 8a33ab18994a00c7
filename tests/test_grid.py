"""Grid broadphase (SURVEY §7 M4) vs all-pairs oracle equivalence."""

import numpy as np
import jax
import pytest

from nudge_tpu.ops.broadphase import allpairs_broadphase
from nudge_tpu.ops.contacts import world_colliders
from nudge_tpu.ops.grid import grid_broadphase
from nudge_tpu.engine import simulate
from nudge_tpu.scenes import SceneBuilder, scene_pile


def pair_set(cp, off_a=0, off_b=0):
    a = np.asarray(cp.a)[np.asarray(cp.valid)]
    b = np.asarray(cp.b)[np.asarray(cp.valid)]
    return set(zip((a + off_a).tolist(), (b + off_b).tolist()))


def build(n, sphere_frac=0.0, seed=0):
    b = scene_pile(n, sphere_frac=sphere_frac, seed=seed)
    cfg = b.auto_config(pairs_per_box=16.0)
    return cfg, b.finalize(cfg)


@pytest.mark.parametrize("n,sphere_frac", [
    (64, 0.0),
    pytest.param(64, 0.3, marks=pytest.mark.slow),
    pytest.param(128, 0.25, marks=pytest.mark.slow),
])
def test_grid_matches_allpairs(n, sphere_frac):
    cfg, st = build(n, sphere_frac)
    # settle a bit so there are real contacts and overlaps
    st, _ = simulate(st, cfg, 60)
    wc = world_colliders(st)
    bb_a, bs_a, ss_a = jax.jit(lambda s, w: allpairs_broadphase(s, w, cfg))(st, wc)
    bb_g, bs_g, ss_g = jax.jit(lambda s, w: grid_broadphase(s, w, cfg))(st, wc)
    assert pair_set(bb_g) == pair_set(bb_a)
    if cfg.max_spheres:
        assert pair_set(bs_g) == pair_set(bs_a)
        assert pair_set(ss_g) == pair_set(ss_a)
    assert not bool(bb_g.overflow)


@pytest.mark.slow
def test_grid_handles_big_ground():
    """The huge static ground slab must go through the 'big' side channel and
    still pair with every touching box."""
    cfg, st = build(64)
    st, _ = simulate(st, cfg, 120)  # let the pile land on the ground
    wc = world_colliders(st)
    bb_a, _, _ = jax.jit(lambda s, w: allpairs_broadphase(s, w, cfg))(st, wc)
    bb_g, _, _ = jax.jit(lambda s, w: grid_broadphase(s, w, cfg))(st, wc)
    ap, gp = pair_set(bb_a), pair_set(bb_g)
    ground_pairs_a = {p for p in ap if 0 in p}
    ground_pairs_g = {p for p in gp if 0 in p}
    assert ground_pairs_a == ground_pairs_g
    assert len(ground_pairs_g) > 0


@pytest.mark.slow
def test_grid_end_to_end_simulation_matches():
    """Rollouts with grid vs allpairs broadphase produce the same candidate
    sets; physics agrees closely over a short horizon (pair ORDER differs, so
    fp summation order prevents exact bitwise equality over long runs) and
    both settle to sane states."""
    b = scene_pile(48, sphere_frac=0.25, seed=3)
    cfg_a = b.auto_config(pairs_per_box=16.0, broadphase="allpairs")
    cfg_g = b.auto_config(pairs_per_box=16.0, broadphase="grid")
    st_a, _ = simulate(b.finalize(cfg_a), cfg_a, 10)
    st_g, _ = simulate(b.finalize(cfg_g), cfg_g, 10)
    np.testing.assert_allclose(np.asarray(st_a.bodies.pos),
                               np.asarray(st_g.bodies.pos), atol=1e-4)
    st_a, ma = simulate(st_a, cfg_a, 290)
    st_g, mg = simulate(st_g, cfg_g, 290)
    pa, pg = np.asarray(st_a.bodies.pos), np.asarray(st_g.bodies.pos)
    assert np.isfinite(pa).all() and np.isfinite(pg).all()
    # both piles settled on the ground with similar extent
    assert abs(pa[:, 1].max() - pg[:, 1].max()) < 0.6
    assert float(np.asarray(mg.kinetic_energy)[-1]) < 5.0


def test_grid_connection_filter():
    b = SceneBuilder()
    g = b.add_static_box((50, 0.5, 50), (0, -0.5, 0))
    x = b.add_box((0.5, 0.5, 0.5), (0, 0.3, 0))
    b.connect(g, x)
    cfg = b.auto_config(broadphase="grid")
    st = b.finalize(cfg)
    wc = world_colliders(st)
    bb, _, _ = jax.jit(lambda s, w: grid_broadphase(s, w, cfg))(st, wc)
    assert pair_set(bb) == set()
