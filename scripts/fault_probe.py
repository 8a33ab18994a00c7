"""Synthetic shape bisect for the TPU worker kernel-fault class.

Round-5 smoke battery (scripts/kernel_smoke.py): BOTH the setup and the
solve kernel crash the TPU worker at the config-5 chunk shape (33k bodies,
mpad ~125k) while the 20,480 pile runs clean through the full engine. This
probe runs ONE kernel at a parameterized synthetic shape — no scene, no
warmup, fabricated manifolds — so the (n_bodies, max_manifolds) threshold
can be bisected in minutes and shape effects are separated from data
effects.

Manifold fabrication: body pairs (i, i+1+k) within a band, round-robin
colors (conflict-free not required for a crash probe — GS scatter with
conflicts is still memory-safe), unit normals, small masses. Everything
finite and in-range; if a shape faults here, the fault is structural.

Usage:
  python scripts/fault_probe.py solve|setup N_BODIES [M_CAP]
  python scripts/fault_probe.py sweep         # subprocess bisect driver
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nudge_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()


def run_one(unit: str, n: int, mcap: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nudge_tpu.config import SimConfig
    from nudge_tpu.ops.solver_kernel import (
        color_sorted_slots, dynamic_windows, padded_groups, solve_packed,
        vel_rows, GROUP, LANES, CON_ROWS, _PT0, _PT, _PB0, _IDX_SENT,
    )

    cfg = SimConfig(max_bodies=n, max_boxes=n, max_manifolds=mcap,
                    max_box_box_pairs=8 * n)
    rng = np.random.default_rng(0)
    m = mcap
    npad = -(-max(n, LANES) // LANES) * LANES
    mpad = padded_groups(cfg) * GROUP

    # fabricated manifolds: local pairs, ~2.2/body live like a settled pile
    m_live = min(m, int(2.2 * n))
    body_a = rng.integers(1, n - 9, m).astype(np.int32)
    body_b = (body_a + rng.integers(1, 8, m)).astype(np.int32)
    valid = (np.arange(m) < m_live)
    color = (np.arange(m) % 12).astype(np.int32)
    color = np.where(valid, color, cfg.max_colors).astype(np.int32)

    ja = jnp.asarray(body_a)
    jb = jnp.asarray(body_b)
    jvalid = jnp.asarray(valid)
    dyn = jnp.ones((m,), bool)
    sub = jnp.minimum(ja, jb)
    slot, _ = color_sorted_slots(jnp.asarray(color), sub, m, cfg)
    win = dynamic_windows(slot, jvalid, ja, jb, dyn, dyn, mpad,
                          npad // LANES)
    # member-visit diagnostic (the roofline cost driver): how much gather
    # work does this synthetic layout actually demand?
    from nudge_tpu.ops.solver_kernel import WORD_BITS, window_words
    tmin_h, tmax_h, bits_h = (np.asarray(x) for x in win)
    ww = window_words(npad // LANES)
    visits = 0
    for g in range(len(tmin_h)):
        for bt in range(tmin_h[g], tmax_h[g]):
            if (bits_h[g * ww + bt // WORD_BITS] >> (bt % WORD_BITS)) & 1:
                visits += 1
    live_groups = int((tmax_h > tmin_h).sum())

    velw = jnp.asarray(
        rng.standard_normal((vel_rows(cfg), npad)).astype(np.float32) * 0.1)
    velw = velw.at[6, :].set(1.0)          # inv_mass row

    cf = np.zeros((CON_ROWS, mpad), np.float32)
    slot_np = np.asarray(slot)
    cols = slot_np
    cf[0, cols] = 0.0
    cf[1, cols] = 1.0                       # normal = +y
    cf[3, cols] = 1.0                       # t1 = x
    cf[8, cols] = 1.0                       # t2 = z
    cf[9, cols] = 0.5                       # mu
    cf[10, cols] = np.where(valid, 1.0, 0.0)
    for p in range(4):
        b0 = _PT0 + _PT * p
        cf[b0 + 24, cols] = 0.5             # mn
        cf[b0 + 25, cols] = 0.5
        cf[b0 + 26, cols] = 0.5
        cf[b0 + 27, cols] = 0.01            # bias
    cf[123, :] = _IDX_SENT
    cf[124, :] = _IDX_SENT
    cf[123, cols] = np.where(valid, body_a, _IDX_SENT)
    cf[124, cols] = np.where(valid, body_b, _IDX_SENT)
    cf[125, cols] = valid.astype(np.float32)
    cf = jnp.asarray(cf)

    af = jnp.zeros((12, mpad), jnp.float32)
    afp = jnp.zeros((4, mpad), jnp.float32)

    if unit == "solve":
        fn = jax.jit(lambda v, c, a, w, p: solve_packed(
            v, c, a, w, cfg, alias=False, afp=p)[0])
        t0 = time.perf_counter()
        out = np.asarray(fn(velw, cf, af, win, afp))
        dt = time.perf_counter() - t0
        for _ in range(2):
            t0 = time.perf_counter()
            out = np.asarray(fn(velw, cf, af, win, afp))
            dt = time.perf_counter() - t0
    elif unit == "setup":
        from nudge_tpu.ops.setup_kernel import setup_pallas
        from nudge_tpu.state import Bodies

        pos = rng.standard_normal((n, 3)).astype(np.float32) * 5
        quat = np.zeros((n, 4), np.float32)
        quat[:, 3] = 1.0
        bodies = Bodies(
            pos=jnp.asarray(pos), quat=jnp.asarray(quat),
            vel=jnp.zeros((n, 3), jnp.float32),
            angvel=jnp.zeros((n, 3), jnp.float32),
            inv_mass=jnp.ones((n,), jnp.float32),
            inv_inertia=jnp.ones((n, 3), jnp.float32),
        )

        class Man:                                   # duck-typed manifold set
            pass

        man = Man()
        man.normal = jnp.asarray(
            np.tile(np.float32([0, 1, 0]), (m, 1)))
        man.friction = jnp.full((m,), 0.5, jnp.float32)
        man.valid = jvalid
        man.body_a = ja
        man.body_b = jb
        man.pos = jnp.asarray(
            rng.standard_normal((m, 4, 3)).astype(np.float32))
        man.depth = jnp.full((m, 4), 0.01, jnp.float32)
        man.point_valid = jnp.ones((m, 4), bool)
        warm = jnp.zeros((m, 4, 3), jnp.float32)
        relax = jnp.ones((m,), jnp.float32)
        t0 = time.perf_counter()
        out = np.asarray(setup_pallas(
            bodies, man, warm, relax, slot, mpad, cfg)[1])
        dt = time.perf_counter() - t0
    else:
        raise ValueError(unit)
    print(json.dumps({
        "unit": unit, "n": n, "mcap": mcap, "npad": npad, "mpad": mpad,
        "tiles": npad // LANES, "groups": mpad // GROUP,
        "live_groups": live_groups, "visits": visits, "ok": True,
        "last_ms": round(dt * 1e3, 1), "finite": bool(np.isfinite(out).all()),
    }), flush=True)


def sweep():
    """Subprocess bisect: body-count sweep at 3x manifolds, then manifold
    sweep at fixed bodies."""
    shapes = [
        ("solve", 20480, 61440),     # known-good engine shape
        ("solve", 24576, 73728),
        ("solve", 28672, 86016),
        ("solve", 32768, 98304),     # 256 tiles exactly
        ("solve", 33024, 99072),     # 258 tiles
        ("solve", 20480, 98304),     # small n, BIG mpad (mpad-only probe)
        ("setup", 32768, 98304),
        ("setup", 33024, 99072),
    ]
    for unit, n, mcap in shapes:
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), unit, str(n),
                 str(mcap)],
                capture_output=True, text=True, timeout=700)
            lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
            if p.returncode == 0 and lines:
                row = json.loads(lines[-1])
            else:
                err = (p.stderr or "").strip().splitlines()
                row = {"unit": unit, "n": n, "mcap": mcap, "ok": False,
                       "rc": p.returncode,
                       "error": (err[-1] if err else "no output")[:240]}
        except subprocess.TimeoutExpired:
            row = {"unit": unit, "n": n, "mcap": mcap, "ok": False,
                   "error": "timeout"}
        row["elapsed_s"] = round(time.time() - t0, 1)
        print(json.dumps(row), flush=True)
        if not row.get("ok"):
            time.sleep(90)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "sweep":
        sweep()
    else:
        unit = sys.argv[1]
        n = int(sys.argv[2])
        mcap = int(sys.argv[3]) if len(sys.argv) > 3 else int(3 * n)
        run_one(unit, n, mcap)
