"""Multi-device sharding tests for parallel/mesh.py (SURVEY §2 parallelism
table, round-1 verdict item 1): run the batched step on a real Mesh over all
8 virtual CPU devices (conftest) and check sharding + per-scene independence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nudge_tpu.config import SimConfig
from nudge_tpu.parallel.mesh import (
    SCENE_AXIS,
    batched_simulate,
    batched_step,
    make_scene_batch,
    shard_scene_batch,
)
from nudge_tpu.scenes import scene_pile


def small_cfg():
    return SimConfig(
        max_bodies=16, max_boxes=16, max_spheres=8,
        max_box_box_pairs=64, max_box_sphere_pairs=32,
        max_sphere_sphere_pairs=16, max_manifolds=112,
    )


def make_batch(cfg, n_scenes):
    states = [
        scene_pile(8, sphere_frac=0.25, seed=i).finalize(cfg)
        for i in range(n_scenes)
    ]
    return make_scene_batch(states)


@pytest.fixture(scope="module")
def mesh8():
    devices = jax.devices()
    assert len(devices) == 8, "conftest must supply 8 virtual CPU devices"
    return Mesh(np.array(devices), (SCENE_AXIS,))


def test_shard_scene_batch_places_on_all_devices(mesh8):
    cfg = small_cfg()
    batch = shard_scene_batch(make_batch(cfg, 8), mesh8)
    sharding = batch.bodies.pos.sharding
    assert len(sharding.device_set) == 8
    assert sharding.is_equivalent_to(
        NamedSharding(mesh8, P(SCENE_AXIS, None, None)),
        batch.bodies.pos.ndim,
    )


@pytest.mark.slow
def test_batched_step_preserves_sharding(mesh8):
    cfg = small_cfg()
    batch = shard_scene_batch(make_batch(cfg, 16), mesh8)
    new_batch, metrics = batched_step(cfg, donate=False)(batch)
    jax.block_until_ready(new_batch.bodies.pos)

    assert len(new_batch.bodies.pos.sharding.device_set) == 8
    assert metrics.contact_count.shape == (16,)
    assert not bool(jnp.any(jnp.isnan(new_batch.bodies.pos)))


@pytest.mark.slow
def test_sharded_matches_unsharded(mesh8):
    """SPMD over the mesh must be numerically identical to single-device
    vmap — scenes are independent, so partitioning cannot change results."""
    cfg = small_cfg()
    batch = make_batch(cfg, 8)

    ref, ref_metrics = batched_step(cfg, donate=False)(batch)
    sharded_in = shard_scene_batch(make_batch(cfg, 8), mesh8)
    out, out_metrics = batched_step(cfg, donate=False)(sharded_in)

    np.testing.assert_array_equal(np.asarray(ref.bodies.pos),
                                  np.asarray(out.bodies.pos))
    np.testing.assert_array_equal(np.asarray(ref.bodies.vel),
                                  np.asarray(out.bodies.vel))
    np.testing.assert_array_equal(np.asarray(ref_metrics.contact_count),
                                  np.asarray(out_metrics.contact_count))


@pytest.mark.slow
def test_scene_independence_under_sharding(mesh8):
    """Each scene's trajectory must not depend on which other scenes share
    the batch: rollout of scene i inside the sharded batch == rollout of
    scene i alone."""
    cfg = small_cfg()
    n_scenes, steps, probe = 8, 5, 3

    batch = shard_scene_batch(make_batch(cfg, n_scenes), mesh8)
    rolled, _ = batched_simulate(cfg, steps, donate=False)(batch)

    solo = make_scene_batch(
        [scene_pile(8, sphere_frac=0.25, seed=probe).finalize(cfg)]
    )
    solo_rolled, _ = batched_simulate(cfg, steps, donate=False)(solo)

    np.testing.assert_allclose(
        np.asarray(rolled.bodies.pos)[probe],
        np.asarray(solo_rolled.bodies.pos)[0],
        rtol=0, atol=1e-6,
    )


def test_chunked_step_matches_unchunked():
    """batched_step_chunked must be a pure reshape of vmap(step)."""
    from nudge_tpu.parallel.mesh import batched_step_chunked
    from nudge_tpu.scenes import scene_pile_stacked

    batch, cfg = scene_pile_stacked(4, 24, seed=5)
    ref, mref = batched_step(cfg, donate=False)(batch)
    out, mout = batched_step_chunked(cfg, n_chunks=2, donate=False)(batch)
    np.testing.assert_array_equal(np.asarray(ref.bodies.pos),
                                  np.asarray(out.bodies.pos))
    np.testing.assert_array_equal(np.asarray(mref.contact_count),
                                  np.asarray(mout.contact_count))


def test_megachunk_rollout_matches_per_chunk():
    """megabatch_simulate (lax.map over flattened mega-scene chunks — the
    kernel-path config-5 batching) must equal simulating each chunk alone."""
    from nudge_tpu.engine import simulate
    from nudge_tpu.parallel.mesh import megabatch_simulate
    from nudge_tpu.scenes import scene_pile_megachunks

    batch, cfg = scene_pile_megachunks(3, 2, 8, seed=2)
    steps = 10
    rolled, m = megabatch_simulate(cfg, steps, donate=False)(batch)

    for c in range(3):
        solo = jax.tree.map(lambda x: x[c], batch)
        ref, mref = simulate(solo, cfg, steps)
        np.testing.assert_array_equal(np.asarray(rolled.bodies.pos)[c],
                                      np.asarray(ref.bodies.pos))
        assert int(np.asarray(m.contact_count)[c]) == int(
            np.asarray(mref.contact_count)[-1])
    # chunks are decorrelated (jitter applied)
    assert not np.array_equal(np.asarray(rolled.bodies.pos)[0],
                              np.asarray(rolled.bodies.pos)[1])


def test_megachunk_sharded_over_mesh(mesh8):
    """megabatch_simulate(mesh=...) splits the chunk axis over the mesh via
    shard_map (each device loops its local chunks) and matches the
    single-device result."""
    from nudge_tpu.parallel.mesh import megabatch_simulate
    from nudge_tpu.scenes import scene_pile_megachunks

    batch, cfg = scene_pile_megachunks(8, 2, 8, seed=4)
    ref, mref = megabatch_simulate(cfg, 6, donate=False)(batch)

    sharded = shard_scene_batch(batch, mesh8)   # leading axis = chunks here
    out, m = megabatch_simulate(cfg, 6, donate=False, mesh=mesh8)(sharded)
    assert len(out.bodies.pos.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(ref.bodies.pos),
                                  np.asarray(out.bodies.pos))
    np.testing.assert_array_equal(np.asarray(mref.contact_count),
                                  np.asarray(m.contact_count))
