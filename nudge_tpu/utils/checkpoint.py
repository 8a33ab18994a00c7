"""Checkpoint / resume (SURVEY.md §5).

The reference has no checkpointing, but all its state is caller-owned POD
arrays so it is trivially possible; here the SimState pytree serializes to a
single .npz (flat path->array dict). Exact resume: restoring and stepping
produces bitwise-identical trajectories (cache, sleep state and step counter
are part of the state).
"""

from __future__ import annotations

import numpy as np
import jax

_SEP = "/"


def _flatten(state):
    flat, treedef = jax.tree_util.tree_flatten_with_path(state)
    out = {}
    for path, leaf in flat:
        key = _SEP.join(
            getattr(p, "name", None) or str(getattr(p, "idx", p)) for p in path
        )
        out[key] = np.asarray(leaf)
    return out, treedef


def save(path: str, state) -> None:
    import os

    parent = os.path.dirname(str(path))
    if parent:
        os.makedirs(parent, exist_ok=True)   # np.savez won't create dirs
    arrays, _ = _flatten(state)
    np.savez(path, **arrays)


def restore(path: str, like, strict: bool = True):
    """Load a checkpoint saved with `save`. `like` is a template state (same
    config) providing the pytree structure. With strict=False, fields the
    checkpoint predates (e.g. BPCache memo fields added later) fall back to
    the template's value — resume is then exact-modulo-caches, not bitwise."""
    data = np.load(path if str(path).endswith(".npz") else str(path) + ".npz")
    arrays, treedef = _flatten(like)
    leaves = []
    for key, ref in arrays.items():
        if key not in data:
            if not strict:
                leaves.append(ref)
                continue
            raise KeyError(f"checkpoint missing field {key}")
        arr = data[key]
        if arr.shape != ref.shape:
            raise ValueError(
                f"checkpoint field {key} has shape {arr.shape}, state expects "
                f"{ref.shape} (different SimConfig capacities?)"
            )
        leaves.append(arr.astype(ref.dtype))
    import jax.numpy as jnp

    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like),
        [jnp.asarray(a) for a in leaves],
    )
