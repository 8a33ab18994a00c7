"""Checkpoint exact-resume (SURVEY §5) + nudge-parity API pipeline test."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nudge_tpu import api
from nudge_tpu.engine import simulate, step
from nudge_tpu.scenes import SceneBuilder, scene_stack
from nudge_tpu.utils import checkpoint


def test_checkpoint_exact_resume(tmp_path):
    b = scene_stack(nx=2, ny=2, nz=1)
    cfg = b.auto_config(sleeping=True)
    st = b.finalize(cfg)
    st, _ = simulate(st, cfg, 100)

    path = str(tmp_path / "ck.npz")
    checkpoint.save(path, st)
    st_resumed = checkpoint.restore(path, b.finalize(cfg))

    a, _ = simulate(st, cfg, 50)
    r, _ = simulate(st_resumed, cfg, 50)
    for leaf_a, leaf_r in zip(jax.tree.leaves(a), jax.tree.leaves(r)):
        np.testing.assert_array_equal(np.asarray(leaf_a), np.asarray(leaf_r))


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    b = scene_stack(nx=2, ny=2, nz=1)
    cfg = b.auto_config()
    st = b.finalize(cfg)
    path = str(tmp_path / "ck.npz")
    checkpoint.save(path, st)
    cfg2 = b.auto_config(max_bodies=64)
    try:
        checkpoint.restore(path, b.finalize(cfg2))
        assert False, "expected shape mismatch error"
    except ValueError as e:
        assert "shape" in str(e)


@pytest.mark.slow
def test_api_pipeline_matches_engine_step():
    """Composing the seven nudge-parity API calls must equal engine.step."""
    b = SceneBuilder()
    b.add_static_box((50, 0.5, 50), (0, -0.5, 0))
    b.add_box((0.5, 0.5, 0.5), (0, 0.45, 0))
    b.add_box((0.5, 0.5, 0.5), (0.2, 1.4, 0))
    cfg = b.auto_config()
    st = b.finalize(cfg)
    # settle a little so the cache is non-trivial
    st, _ = simulate(st, cfg, 30)

    ref_state, _ = jax.jit(lambda s: step(s, cfg))(st)

    bodies = api.apply_gravity(st.bodies, st.sleep, cfg)
    contacts, _bp = api.collide(st, cfg)
    warm, pwarm = api.read_cached_impulses(st.cache, contacts)
    con, bodies, acc = api.setup_contact_constraints(
        bodies, contacts, warm, cfg, pwarm=pwarm)
    bodies, acc, pseudo, pseudo_acc = api.apply_impulses(con, bodies, acc, cfg)
    cache = api.write_cached_impulses(
        contacts, api.update_cached_impulses(con, acc), pseudo_acc)
    bodies = api.advance(bodies, st.sleep, cfg)
    from nudge_tpu.ops.integrate import apply_position_correction
    if cfg.split_impulse:
        bodies = apply_position_correction(bodies, pseudo, st.sleep, cfg)

    np.testing.assert_allclose(np.asarray(ref_state.bodies.pos),
                               np.asarray(bodies.pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ref_state.bodies.vel),
                               np.asarray(bodies.vel), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ref_state.cache.ga),
                                  np.asarray(cache.ga))
