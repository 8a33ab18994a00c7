"""Differentiable-simulation tests (cfg.differentiable=True).

New capability vs the C++ reference (SURVEY §2 has no autodiff row — the
upstream is a forward-only engine): with static solver trip counts the whole
jitted rollout reverse-differentiates, so `jax.grad` of a loss over the final
state w.r.t. initial conditions is exact up to solver nonsmoothness (contact
clamps have subgradients at the clamp corner).

Gradient correctness is checked against central finite differences through a
contact-rich rollout (boxes fall onto the ground and onto each other inside
the window), and usefulness is checked by a short gradient-descent loop that
must actually reduce a landing-position loss.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nudge_tpu.engine import step
from nudge_tpu.scenes import scene_pile


@pytest.fixture(scope="module")
def diff_setup():
    b = scene_pile(4, seed=0)
    # differentiable mode always sweeps solver_iters * max_colors (static
    # bound); a 4-body scene needs few colors, and the default 24 made this
    # module dominate the fast tier (92s -> ~6x less sweep work)
    cfg = b.auto_config(solver="xla", differentiable=True, max_colors=8,
                        solver_iters=12)
    st0 = b.finalize(cfg)

    def loss(vel0):
        st = st0.replace(bodies=st0.bodies.replace(vel=vel0))

        def body(s, _):
            s, _ = step(s, cfg)
            return s, None

        st, _ = jax.lax.scan(body, st, None, length=12)
        return jnp.sum((st.bodies.pos[1] - jnp.array([1.0, 0.0, 3.0])) ** 2)

    return st0, jax.jit(jax.value_and_grad(loss))


def test_grad_finite_and_nonzero(diff_setup):
    st0, vg = diff_setup
    l, g = vg(st0.bodies.vel)
    assert np.isfinite(float(l))
    assert bool(jnp.all(jnp.isfinite(g)))
    # the loss depends on body 1's trajectory, so its velocity rows must
    # carry signal (zero grads would mean the graph is disconnected)
    assert float(jnp.linalg.norm(g[1])) > 1e-4


@pytest.mark.slow
def test_grad_matches_finite_differences(diff_setup):
    st0, vg = diff_setup
    v0 = np.asarray(st0.bodies.vel, np.float64)
    _, g = vg(jnp.asarray(v0, jnp.float32))
    g = np.asarray(g, np.float64)

    rng = np.random.RandomState(1)
    eps = 1e-3
    for _ in range(2):
        d = rng.randn(*v0.shape)
        d /= np.linalg.norm(d)
        lp, _ = vg(jnp.asarray(v0 + eps * d, jnp.float32))
        lm, _ = vg(jnp.asarray(v0 - eps * d, jnp.float32))
        fd = (float(lp) - float(lm)) / (2 * eps)
        an = float(np.sum(g * d))
        # f32 forward + contact-clamp subgradients: a few percent is the
        # noise floor (measured 0.04%-2.4% over random directions)
        assert abs(fd - an) <= 0.08 * max(abs(fd), abs(an), 1e-6), (fd, an)


@pytest.mark.slow
def test_gradient_descent_reduces_loss(diff_setup):
    """The curvature of pos-vs-initial-velocity over a 12-step window is
    ~2*(12*dt)^2 = 0.08, so stable GD rates go up to ~25; lr=4 converges the
    reachable (x,z) error in a handful of iterations."""
    st0, vg = diff_setup
    v = st0.bodies.vel
    l0, _ = vg(v)
    best = float(l0)
    for _ in range(15):
        l, g = vg(v)
        best = min(best, float(l))
        v = v - 4.0 * g
    lN, _ = vg(v)
    best = min(best, float(lN))
    assert best < 0.3 * float(l0), (float(l0), best)


@pytest.mark.slow
def test_vmap_of_grad_composes(diff_setup):
    """Batched per-scene gradients (the RL-rollout shape): vmap over a
    batch of initial velocities, grad within each lane. Lanes must match
    the sequential gradients they batch."""
    st0, vg = diff_setup
    v0 = st0.bodies.vel

    def gradfn(v):
        return vg(v)[1]

    batch = jnp.stack([v0, v0 * 1.1, v0 - 0.2])
    gb = jax.vmap(gradfn)(batch)
    assert gb.shape == batch.shape
    assert bool(jnp.all(jnp.isfinite(gb)))
    g_seq = jnp.stack([gradfn(batch[i]) for i in range(3)])
    assert bool(jnp.allclose(gb, g_seq, atol=2e-4)), \
        float(jnp.abs(gb - g_seq).max())


def test_dynamic_bound_solver_rejects_grad():
    """Documents WHY the flag exists: without it the solve's trip count is
    traced (solver_iters * n_colors_used) and reverse-mode AD through a
    scanned rollout must fail with JAX's dynamic-bound fori_loop error."""
    b = scene_pile(4, seed=0)
    cfg = b.auto_config(solver="xla", differentiable=False)
    st0 = b.finalize(cfg)

    def loss(vel0):
        st = st0.replace(bodies=st0.bodies.replace(vel=vel0))

        def body(s, _):
            s, _ = step(s, cfg)
            return s, None

        st, _ = jax.lax.scan(body, st, None, length=10)
        return jnp.sum(st.bodies.pos[1] ** 2)

    with pytest.raises(ValueError, match="[Rr]everse-mode"):
        jax.grad(loss)(st0.bodies.vel)
