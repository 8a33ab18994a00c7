"""Debug-mode invariants (SURVEY.md §5, race-detection analog).

The reference is single-threaded, so data races are impossible; our analog
of a race is a *scatter conflict* — two manifolds of the same color writing
one dynamic body. These helpers are meant for tests and debug runs (they
return values; wrap in asserts host-side)."""

from __future__ import annotations

import jax.numpy as jnp


def coloring_conflicts(con, bodies) -> jnp.ndarray:
    """Number of (color, dynamic body) slots written more than once —
    must be 0 except for the spill color (max color in use when spill_count
    > 0). Verifies the conflict-free batching invariant (SURVEY C10)."""
    dyn = bodies.inv_mass > 0.0
    n = bodies.pos.shape[0]
    ncol = int(con.color.max()) + 1 if hasattr(con.color, "max") else 0
    # count (color, body) incidences over valid manifolds with dynamic bodies
    key_a = con.color * n + con.body_a
    key_b = con.color * n + con.body_b
    size = (int(jnp.max(con.color)) + 1) * n if ncol else n
    counts = jnp.zeros((size + 1,), jnp.int32)
    va = con.valid & dyn[con.body_a]
    vb = con.valid & dyn[con.body_b]
    counts = counts.at[jnp.where(va, key_a, size)].add(1)
    counts = counts.at[jnp.where(vb, key_b, size)].add(1)
    return jnp.sum(jnp.maximum(counts[:size] - 1, 0))


def finite_state(state) -> bool:
    """True iff all body state is finite (NaN guard)."""
    import jax

    ok = True
    for leaf in [state.bodies.pos, state.bodies.quat, state.bodies.vel,
                 state.bodies.angvel]:
        ok = ok & bool(jnp.all(jnp.isfinite(leaf)))
    return ok
