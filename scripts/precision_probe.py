"""Is a one-hot gather/scatter dot exact below Precision.HIGHEST on TPU?

The solve/setup kernels gather body columns with one-hot MXU contractions at
f32 HIGHEST = 6 bf16 passes (roofline r5: that precision choice IS the
solve kernel's throughput ceiling — the dots run at the shape-capped MXU
limit). The one-hot side splits into bf16 exactly (0.0 and 1.0 are bf16
values), so the contraction y = onehot @ x could in principle be exact with
fewer passes IF the pass selection covers all three bf16 limbs of the f32
side (x = x0 + x1 + x2): the needed terms are onehot0*x0, onehot0*x1,
onehot0*x2 — exactly 3 passes worth. Whether Precision.HIGH (3 passes)
picks those terms (vs the symmetric {a0b0, a0b1, a1b0}) is a hardware
question; this probe answers it empirically, in both operand orders and
both for gather (values on the left) and scatter (accumulation) shapes.

Also times the solve-kernel-shaped dot [16,128]x[128,128] at each
precision so the available speedup is measured, not assumed.

Usage: python scripts/precision_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

P = jax.lax.Precision


def onehot_cols(ids, n):
    """[n, len(ids)] one-hot: column j selects row ids[j]."""
    return (jnp.arange(n)[:, None] == ids[None, :]).astype(jnp.float32)


def main():
    rng = np.random.default_rng(0)
    n, m, vr = 128, 128, 16
    # adversarial f32 values: full mantissas, wide exponent spread, the
    # velocity-ish ranges the solver actually gathers
    x = np.float32(rng.standard_normal((vr, n)) *
                   10.0 ** rng.integers(-6, 3, (vr, n)))
    ids = rng.integers(0, n, m)
    oh = onehot_cols(jnp.asarray(ids), n)              # [n, m]
    xd = jnp.asarray(x)
    exact = x[:, ids]                                   # [vr, m]

    print(f"backend={jax.default_backend()}  device={jax.devices()[0]}")
    for prec in (P.HIGHEST, P.HIGH, P.DEFAULT):
        y = np.asarray(jax.jit(
            lambda a, b: jnp.dot(a, b, precision=prec))(xd, oh))
        bad = np.abs(y - exact)
        rel = bad / np.maximum(np.abs(exact), 1e-30)
        print(f"gather  x@onehot  {str(prec):18s} max_abs_err={bad.max():.3e}"
              f" max_rel_err={rel.max():.3e} bitwise={np.array_equal(y, exact)}")
    # scatter shape: onehot.T @ delta accumulates m deltas into n rows
    d = np.float32(rng.standard_normal((vr, m)) *
                   10.0 ** rng.integers(-6, 3, (vr, m)))
    dd = jnp.asarray(d)
    exact_sc = np.zeros((vr, n), np.float32)
    for j, i in enumerate(ids):
        exact_sc[:, i] += d[:, j]
    # NOTE: with duplicate ids the reference sum order differs; restrict to
    # unique ids for the bitwise check
    uids = np.unique(ids)
    for prec in (P.HIGHEST, P.HIGH, P.DEFAULT):
        y = np.asarray(jax.jit(
            lambda a, b: jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())), precision=prec))(dd, oh))
        bad = np.abs(y[:, uids] - exact_sc[:, uids])
        rel = bad / np.maximum(np.abs(exact_sc[:, uids]), 1e-30)
        print(f"scatter d@onehot.T {str(prec):18s} max_abs_err={bad.max():.3e}"
              f" max_rel_err={rel.max():.3e} "
              f"bitwise={np.array_equal(y[:, uids], exact_sc[:, uids])}")

    # timing at kernel shape, batched to amortize dispatch: [16,128]x[128,128]
    # executed 4096x as one [16, 128*4096] x block-diag? Simplest honest
    # proxy: one big dot with the same M: [16, K] x [K, N] at K=N=4096.
    K = 4096
    A = jnp.asarray(np.float32(rng.standard_normal((16, K))))
    B = jnp.asarray(np.float32(rng.standard_normal((K, K))))
    for prec in (P.HIGHEST, P.HIGH, P.DEFAULT):
        f = jax.jit(lambda a, b: jnp.dot(a, b, precision=prec))
        np.asarray(f(A, B))
        ts = []
        for _ in range(20):
            t0 = time.perf_counter()
            np.asarray(f(A, B))
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        fl = 2 * 16 * K * K
        print(f"timing M=16 K=N={K} {str(prec):18s} {t*1e3:7.2f} ms "
              f"{fl/t/1e12:6.2f} TF/s")


if __name__ == "__main__":
    main()
