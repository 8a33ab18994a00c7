"""Parity tests for the 1-point Pallas narrowphase kernel (box-sphere +
sphere-sphere): the kernel (interpret mode on CPU) must reproduce the
vmapped-jnp narrowphase slot-for-slot on a mixed pile. Reference: SURVEY C7.
"""

import jax
import numpy as np
import pytest

from nudge_tpu.engine import simulate
from nudge_tpu.ops.broadphase import world_colliders
from nudge_tpu.ops.contacts import narrowphase_all
from nudge_tpu.scenes import scene_pile


def _mixed_state(n=64, steps=20):
    b = scene_pile(n, sphere_frac=0.4, seed=7)
    cfg = b.auto_config()
    st, _ = simulate(b.finalize(cfg), cfg, steps)
    return st, cfg


def _candidates(st, cfg):
    from nudge_tpu.ops.contacts import _base_broadphase

    wc = jax.jit(world_colliders)(st)
    bb, bs, ss = jax.jit(lambda s, w: _base_broadphase(cfg)(s, w, cfg))(
        st, wc)
    return wc, bb, bs, ss


def test_1pt_kernel_matches_jnp_path():
    st, cfg = _mixed_state()
    wc, bb, bs, ss = _candidates(st, cfg)
    assert int(bs.valid.sum()) > 0 and int(ss.valid.sum()) > 0

    jnp_slots = jax.jit(
        lambda: narrowphase_all(
            st, wc, bb, bs, ss, cfg.replace(solver="xla")))()
    ker_slots = jax.jit(
        lambda: narrowphase_all(
            st, wc, bb, bs, ss, cfg.replace(solver="pallas_interpret")))()

    # both paths emit |bb| + |bs| + |ss| slots; the sphere classes sit after
    # the box-box block in both (kernel part appends bs then ss)
    nbb = bb.a.shape[0]
    for k in ("body_a", "body_b", "ga", "gb", "friction", "normal", "pos",
              "depth", "point_valid"):
        a = np.asarray(jnp_slots[k])[nbb:]
        b = np.asarray(ker_slots[k])[nbb:]
        live = np.asarray(jnp_slots["point_valid"])[nbb:].any(axis=-1)
        if a.dtype.kind == "f":
            np.testing.assert_allclose(
                a[live], b[live], rtol=1e-5, atol=1e-5, err_msg=k)
        else:
            np.testing.assert_array_equal(a[live], b[live], err_msg=k)


@pytest.mark.slow
def test_mixed_pile_settles_kernel_path():
    """End-to-end mixed pile through the kernel narrowphase: settles without
    NaN and spheres rest at positive height."""
    b = scene_pile(64, sphere_frac=0.5, seed=11)
    cfg = b.auto_config(solver="pallas_interpret")
    st, m = simulate(b.finalize(cfg), cfg, 300)
    pos = np.asarray(st.bodies.pos)
    dyn = np.asarray(st.bodies.dynamic)       # excludes capacity padding
    assert np.isfinite(pos).all()
    assert pos[dyn, 1].min() > 0.2
    # settling gate: rolling spheres (no rolling resistance in this model,
    # upstream's too — BASELINE.md round-2) make the mixed pile's settle a
    # long transient: measured KE-at-end 79.7 -> 53.1 -> 5.9 at 100/200/300
    # steps (deterministic). 200 steps sat mid-transient and the old <50.0
    # gate grazed it; at 300 the pile is quiescent with margin.
    ke = np.asarray(m.kinetic_energy)
    assert float(ke[-1]) < 20.0
