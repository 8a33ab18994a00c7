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
    fn = jax.vmap(partial(step, cfg=cfg))
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def batched_simulate(cfg: SimConfig, steps: int, donate: bool = True):
    """Multi-step on-device rollout of a (possibly sharded) scene batch."""

    def run(state_b):
        def f(st, _):
            return jax.vmap(partial(step, cfg=cfg))(st)

        return jax.lax.scan(f, state_b, None, length=steps)

    return jax.jit(run, donate_argnums=(0,) if donate else ())
