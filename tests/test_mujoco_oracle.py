"""MuJoCo oracle cross-check (SURVEY §4 item 5).

Tolerance-band comparisons, not bitwise: both engines solve the same physics
with different formulations (MuJoCo: soft constraints; here: sequential
impulses + slop). What must agree:

  - a dropped box comes to rest ON the ground: rest height within a small
    band of the half extent in both engines;
  - a small stack settles to layer heights ~ 2*half per layer with bounded
    rest penetration in both.
"""

import mujoco
import numpy as np
import pytest

from nudge_tpu.engine import simulate
from nudge_tpu.scenes import SceneBuilder

HALF = 0.5
DT = 1.0 / 120.0  # MuJoCo's default integrator prefers small steps


def _mj_box_stack(n_layers):
    bodies = "\n".join(
        f'<body name="b{i}" pos="0 0 {HALF + 2 * HALF * i + 0.01 * (i + 1)}">'
        f'<freejoint/><geom type="box" size="{HALF} {HALF} {HALF}" '
        f'mass="1" friction="0.5 0.005 0.0001"/></body>'
        for i in range(n_layers)
    )
    xml = f"""
    <mujoco>
      <option timestep="{DT}" gravity="0 0 -9.81"/>
      <worldbody>
        <geom type="plane" size="20 20 1" friction="0.5 0.005 0.0001"/>
        {bodies}
      </worldbody>
    </mujoco>"""
    model = mujoco.MjModel.from_xml_string(xml)
    data = mujoco.MjData(model)
    for _ in range(600):
        mujoco.mj_step(model, data)
    # z of each body (MuJoCo: qpos[7i+2]), gravity along -z
    return np.array([data.qpos[7 * i + 2] for i in range(n_layers)])


def _nudge_box_stack(n_layers):
    b = SceneBuilder()
    b.add_static_box((20, 0.5, 20), (0, -0.5, 0))
    for i in range(n_layers):
        b.add_box((HALF, HALF, HALF),
                  (0, HALF + 2 * HALF * i + 0.01 * (i + 1), 0))
    cfg = b.auto_config(dt=DT)
    st, _ = simulate(b.finalize(cfg), cfg, 600)
    # bodies.pos is capacity-padded; rows 1..n_layers are the stack (y-up)
    return np.asarray(st.bodies.pos)[1:n_layers + 1, 1]


@pytest.mark.slow
def test_single_box_drop_matches_mujoco():
    mj = _mj_box_stack(1)
    nd = _nudge_box_stack(1)
    # both rest at ~HALF above the ground with small penetration
    assert abs(mj[0] - HALF) < 0.02
    assert abs(nd[0] - HALF) < 0.02
    assert abs(mj[0] - nd[0]) < 0.03


def _mj_sphere_drop(radius):
    xml = f"""
    <mujoco>
      <option timestep="{DT}" gravity="0 0 -9.81"/>
      <worldbody>
        <geom type="plane" size="20 20 1" friction="0.5 0.005 0.0001"/>
        <body name="s" pos="0 0 1.5"><freejoint/>
          <geom type="sphere" size="{radius}" mass="1"
                friction="0.5 0.005 0.0001"/></body>
      </worldbody>
    </mujoco>"""
    model = mujoco.MjModel.from_xml_string(xml)
    data = mujoco.MjData(model)
    for _ in range(600):
        mujoco.mj_step(model, data)
    return float(data.qpos[2])


def _nudge_sphere_drop(radius):
    b = SceneBuilder()
    b.add_static_box((20, 0.5, 20), (0, -0.5, 0))
    b.add_sphere(radius, (0, 1.5, 0))
    cfg = b.auto_config(dt=DT)
    st, _ = simulate(b.finalize(cfg), cfg, 600)
    return float(np.asarray(st.bodies.pos)[1, 1])


@pytest.mark.slow
def test_sphere_drop_matches_mujoco():
    """Config-3 geometry (box-sphere narrowphase) against the oracle: a
    dropped sphere rests at ~its radius above the ground in both engines."""
    r = 0.4
    mj = _mj_sphere_drop(r)
    nd = _nudge_sphere_drop(r)
    assert abs(mj - r) < 0.02
    assert abs(nd - r) < 0.02
    assert abs(mj - nd) < 0.03


@pytest.mark.slow
def test_stack_settle_matches_mujoco():
    n = 3
    mj = _mj_box_stack(n)
    nd = _nudge_box_stack(n)
    expect = HALF + 2 * HALF * np.arange(n)
    # per-layer rest heights within a band of the ideal stack in both
    assert np.abs(mj - expect).max() < 0.05
    assert np.abs(nd - expect).max() < 0.05
    # rest penetration (height deficit per interface) comparable
    assert np.abs(mj - nd).max() < 0.06
