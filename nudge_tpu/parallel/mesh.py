"""Multi-scene batching and multi-chip sharding.

The reference is single-threaded and single-node (SURVEY.md §2: its only
parallelism is SIMD lanes + conflict-free solver batches). The TPU build adds
the two scale axes planned in SURVEY §2/§7:

  - **scene batching**: `vmap(step)` over thousands of independent scenes
    (BASELINE config 5, the RL-rollout pattern);
  - **multi-chip data parallelism**: shard the scene-batch axis over a
    `jax.sharding.Mesh`. Scenes are independent, so the program needs *zero*
    cross-chip communication in steady state — collectives appear only if the
    caller reduces metrics across the batch. Sharding one giant scene across
    chips (spatial decomposition with boundary-pair exchange) is the CP/SP
    analog and deliberately out of scope for v1 (SURVEY §2).

All state leaves carry the scene axis in dim 0, so one `NamedSharding`
placement rule covers the whole pytree.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SimConfig
from ..engine import step
from ..state import SimState

SCENE_AXIS = "scenes"


def _vmap_cfg(cfg: SimConfig) -> SimConfig:
    """Config for vmap(step) paths: the aligned fast paths use lax.cond,
    which vmap lowers to lax.select — BOTH branches execute per scene, so
    the cond becomes pure overhead there. (megabatch_simulate keeps the
    caller's cfg: its lax.map body is the unbatched step.)"""
    return cfg.replace(aligned_fast_path=False)


def make_scene_batch(states) -> SimState:
    """Stack a list of same-config SimStates into one batched state
    (leading scene axis on every leaf)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *states)


def shard_scene_batch(state_b: SimState, mesh: Mesh) -> SimState:
    """Place a batched state on `mesh`, scene axis split over SCENE_AXIS."""

    def put(x):
        spec = P(SCENE_AXIS, *([None] * (x.ndim - 1))) if x.ndim > 0 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, state_b)


def batched_step(cfg: SimConfig, donate: bool = True):
    """A jitted `step` vmapped over the scene axis. With a sharded input the
    same function runs SPMD across the mesh — XLA partitions the batch; no
    collectives are generated because scenes are independent."""
    fn = jax.vmap(partial(step, cfg=_vmap_cfg(cfg)))
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def batched_step_chunked(cfg: SimConfig, n_chunks: int, donate: bool = True):
    """`vmap(step)` over the scene axis, processed in `n_chunks` sequential
    chunks under `lax.map` — bounds the per-step transient memory (the grid
    broadphase's candidate tables scale with live scenes) while keeping each
    op large enough to amortize dispatch overhead. The scene count must be
    divisible by n_chunks.

    For big batches pass a cfg with solver='xla': the Pallas kernels pad
    color segments per scene, which is the right trade single-scene but
    multiplies under vmap; the batched XLA ops amortize dispatch overhead
    on their own."""

    def run(state_b):
        n_scenes = state_b.bodies.pos.shape[0]
        chunk = n_scenes // n_chunks
        assert chunk * n_chunks == n_scenes

        folded = jax.tree.map(
            lambda x: x.reshape((n_chunks, chunk) + x.shape[1:]), state_b)
        out, metrics = jax.lax.map(
            jax.vmap(partial(step, cfg=_vmap_cfg(cfg))), folded)
        unfold = lambda x: x.reshape((n_scenes,) + x.shape[2:])
        return jax.tree.map(unfold, out), jax.tree.map(unfold, metrics)

    return jax.jit(run, donate_argnums=(0,) if donate else ())


def batched_simulate(cfg: SimConfig, steps: int, donate: bool = True):
    """Multi-step on-device rollout of a (possibly sharded) scene batch."""

    def run(state_b):
        def f(st, _):
            return jax.vmap(partial(step, cfg=_vmap_cfg(cfg)))(st)

        return jax.lax.scan(f, state_b, None, length=steps)

    return jax.jit(run, donate_argnums=(0,) if donate else ())


def megabatch_simulate(cfg: SimConfig, steps: int, donate: bool = True,
                       mesh: Mesh = None):
    """Multi-step rollout of a stack of FLATTENED mega-scenes
    (scenes.scene_pile_megachunks): `lax.map(step)` over the leading chunk
    axis — the map body is the unbatched step, so the Pallas setup/solve
    kernels run as-is per chunk (vmap would exclude them; see
    batched_step_chunked). Returns (state, final-step metrics per chunk).

    With `mesh`, the chunk axis is split over SCENE_AXIS via shard_map:
    each device loops over its LOCAL chunks (a plain jit of lax.map over a
    sharded axis would serialize globally — the sequential loop cannot be
    partitioned by the compiler). Chunks are independent mega-scenes, so no
    collectives are generated. n_chunks must divide by the mesh size."""

    def run(state_b):
        body = partial(step, cfg=cfg)

        def f(st, _):
            new, _ = jax.lax.map(body, st)
            return new, None

        state_b, _ = jax.lax.scan(f, state_b, None, length=steps - 1)
        return jax.lax.map(body, state_b)

    if mesh is not None:
        spec = P(SCENE_AXIS)   # leading chunk dim; rest replicated per leaf
        run = jax.shard_map(run, mesh=mesh, in_specs=spec,
                            out_specs=(spec, spec), check_vma=False)
    return jax.jit(run, donate_argnums=(0,) if donate else ())


def batched_simulate_chunked(cfg: SimConfig, steps: int, n_chunks: int,
                             donate: bool = True):
    """Multi-step rollout with the chunked step (see batched_step_chunked).
    Returns (state, final-step metrics per scene)."""

    def run(state_b):
        n_scenes = state_b.bodies.pos.shape[0]
        chunk = n_scenes // n_chunks
        assert chunk * n_chunks == n_scenes
        fold = lambda x: x.reshape((n_chunks, chunk) + x.shape[1:])
        unfold = lambda x: x.reshape((n_scenes,) + x.shape[2:])
        folded = jax.tree.map(fold, state_b)

        def f(st, _):
            new, _ = jax.lax.map(jax.vmap(partial(step, cfg=_vmap_cfg(cfg))), st)
            return new, None

        folded, _ = jax.lax.scan(f, folded, None, length=steps - 1)
        new, metrics = jax.lax.map(
            jax.vmap(partial(step, cfg=_vmap_cfg(cfg))), folded)
        return jax.tree.map(unfold, new), jax.tree.map(unfold, metrics)

    return jax.jit(run, donate_argnums=(0,) if donate else ())
