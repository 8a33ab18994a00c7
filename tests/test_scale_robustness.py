"""The stabilization-knob family must not be 0.5m-box-specific.

VERDICT r3 weak §4: seven interacting constants (slop, margins, deep-bias
depths/velocities, pseudo cap) were tuned against 0.5 m boxes at dt=1/60.
scenes.auto_config now derives them from the scene's characteristic dynamic
collider size L, the per-step gravity kick g*dt, and the position rate L/dt
(reference knows nothing of this — its constants are compile-time, SURVEY
§2 C16). These tests sweep box half-extent {0.1, 0.5, 2.0} x dt {1/60,
1/120} and assert the SAME qualitative physics: a tower settles to rest
with penetration ~slop and near-zero kinetic energy, without overflow.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from nudge_tpu.config import SimConfig
from nudge_tpu.engine import simulate
from nudge_tpu.scenes import SceneBuilder


def tower(half: float, n: int = 5) -> SceneBuilder:
    b = SceneBuilder()
    b.add_static_box((20 * half, half, 20 * half), (0.0, -half, 0.0))
    for i in range(n):
        # tiny lateral offsets so the stack is not axis-perfect
        b.add_box((half, half, half),
                  ((0.02 * half) * ((-1) ** i), (2 * i + 1.1) * half,
                   (0.013 * half) * ((-1) ** (i + 1))))
    return b


@pytest.mark.parametrize("half", [0.1, 0.5, 2.0])
@pytest.mark.parametrize("dt", [1.0 / 60.0, 1.0 / 120.0])
def test_tower_settles_at_scale(half, dt):
    b = tower(half)
    cfg = b.auto_config(dt=dt, solver="xla")
    st = b.finalize(cfg)
    steps = int(round(5.0 / dt))          # 5 simulated seconds
    st, m = simulate(st, cfg, steps)
    depth = float(np.asarray(m.max_depth)[-1])
    assert not bool(np.asarray(m.overflow).any())
    # rest penetration lands at ~slop for every scale (the gate: absolute
    # thresholds would pass trivially at 0.1 and fail at 2.0 or vice versa)
    assert depth <= 2.5 * cfg.slop + 1e-6, (depth, cfg.slop)
    # kinetic energy per body, normalized by the scale's natural energy
    # unit m*g*L: must be jitter, not motion
    ke = float(np.asarray(m.kinetic_energy)[-1])
    g = float(np.linalg.norm(jnp.asarray(cfg.gravity)))
    assert ke / (5 * g * half) < 2e-3, ke
    # the tower still stands: every box's center is within half of its
    # spawn column (no collapse / no ejection)
    pos = np.asarray(st.bodies.pos)
    dyn = np.asarray(st.bodies.inv_mass) > 0
    assert np.all(np.abs(pos[dyn][:, [0, 2]]) < 1.5 * half)
    assert np.all(pos[dyn][:, 1] > 0.0)


def test_derived_knobs_match_tuned_defaults_at_reference_scale():
    """At (L=0.5, dt=1/60, g=9.81) the derivation must reproduce the tuned
    SimConfig defaults bit-for-bit — the sweep above then certifies those
    same formulas at other scales."""
    b = tower(0.5)
    cfg = b.auto_config()
    d = SimConfig()
    for k in ("slop", "aabb_margin", "rebuild_margin", "deep_bias_depth",
              "deep_bias_ungated_depth", "deep_bias_gate",
              "deep_bias_ungated_vel", "max_bias_vel", "max_pseudo_vel",
              "sleep_lin_vel", "sleep_ang_vel"):
        assert getattr(cfg, k) == getattr(d, k), k


def test_explicit_override_beats_derivation():
    b = tower(2.0)
    cfg = b.auto_config(slop=0.123, max_pseudo_vel=7.0)
    assert cfg.slop == 0.123
    assert cfg.max_pseudo_vel == 7.0
    # non-overridden members still derive from L=2.0
    assert cfg.deep_bias_depth == pytest.approx(0.15 * 4.0)
