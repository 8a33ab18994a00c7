"""Roofline / MFU accounting for one simulation step (VERDICT r2 item 5).

Builds an analytic FLOPs + HBM-bytes model of the two Pallas kernels (solve,
setup) and the narrowphase from the *live* scene statistics (manifold count,
live solver groups, member body-tile visits), times the stages on the current
backend, and reports achieved GFLOP/s / GB/s against TPU v5e peaks — the
"denominator" that says how much headroom a stage has left.

Peaks used (public v5e spec + microarchitectural assumptions, stated so the
numbers can be re-derived):
  - HBM:  819 GB/s.
  - MXU:  197 TFLOP/s bf16. The solver's one-hot gather/scatter contractions
    run f32 at Precision.HIGHEST ~= 3-6 bf16 passes -> 33-66 TFLOP/s usable;
    we report against 49 TFLOP/s (4-pass midpoint). MXU utilization is also
    capped by shape: [16,128]x[128,128] one-hot dots fill 16/128 of the
    systolic rows -> 1/8 of even that.
  - VPU:  8x128 lanes x 2 FMA ports x ~0.94 GHz ~= 3.9 TFLOP/s f32 (order-of-
    magnitude; TPU VPU issue width is not published).

Usage: python scripts/roofline.py [n_bodies] [reps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nudge_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nudge_tpu.engine import simulate, step  # noqa: E402
from nudge_tpu.ops.contacts import collide  # noqa: E402
from nudge_tpu.ops.cache import read_cached_impulses  # noqa: E402
from nudge_tpu.ops.integrate import apply_gravity  # noqa: E402
from nudge_tpu.ops.setup_kernel import (  # noqa: E402
    body_rows, color_slots, setup_pallas,
)
from nudge_tpu.ops.solver import color_manifolds  # noqa: E402
from nudge_tpu.ops.solver_kernel import (  # noqa: E402
    ACC_ROWS, CON_ROWS, GROUP, LANES, SUB, WORD_BITS,
    dynamic_windows, padded_groups, solve_packed, vel_rows, window_words,
)
from nudge_tpu.scenes import scene_pile  # noqa: E402

PEAK_HBM = 819e9           # B/s, v5e public spec
PEAK_MXU_F32HI = 49e12     # FLOP/s, f32 HIGHEST ~ 4 bf16 passes of 197e12
PEAK_VPU = 3.9e12          # FLOP/s f32, assumption documented above


def fmt(x, unit):
    for s, m in (("T", 1e12), ("G", 1e9), ("M", 1e6), ("K", 1e3)):
        if abs(x) >= m:
            return f"{x / m:7.2f} {s}{unit}"
    return f"{x:7.2f}  {unit}"


def timeit(fn, *args, reps=10):
    fn(*args)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main(n=20480, reps=10):
    interp = jax.default_backend() != "tpu"
    b = scene_pile(n)
    mcap = max(512, int(n * 2.0))
    pcap = max(1024, int(n * 5.0))
    cfg = b.auto_config(max_box_box_pairs=pcap, max_manifolds=mcap,
                        grid_density=16)
    st = b.finalize(cfg)
    print(f"settling {n}-box pile (m={mcap} p={pcap}) ...")
    for _ in range(4):
        st, _ = simulate(st, cfg, 100)
        np.asarray(st.bodies.pos)

    # ---- live statistics that drive the model ----
    bodies = apply_gravity(st.bodies, st.sleep, cfg)
    man, _ = jax.jit(lambda s: collide(s, cfg))(st)
    warm, pwarm = read_cached_impulses(st.cache, man)
    color, _, relax, _ = color_manifolds(man, bodies, cfg)
    slot, mpad = color_slots(color, man, bodies, cfg)
    npad = -(-max(n, LANES) // LANES) * LANES
    da = jnp.asarray(bodies.inv_mass)[man.body_a] > 0
    db = jnp.asarray(bodies.inv_mass)[man.body_b] > 0
    tmin, tmax, bits = dynamic_windows(
        slot, man.valid, man.body_a, man.body_b, da, db, mpad, npad // LANES)
    tmin, tmax = np.asarray(tmin), np.asarray(tmax)
    bits = np.asarray(bits).reshape(len(tmin), -1)
    # member tiles per group = popcount of the bitmask, restricted to window
    members = np.zeros(len(tmin), np.int64)
    for g in range(len(tmin)):
        w = bits[g]
        cnt = 0
        for bt in range(tmin[g], tmax[g]):
            if (w[bt // WORD_BITS] >> (bt % WORD_BITS)) & 1:
                cnt += 1
        members[g] = cnt
    live_groups = int((tmax > tmin).sum())
    member_visits = int(members.sum())
    m_live = int(np.asarray(man.valid).sum())
    n_groups = padded_groups(cfg)
    iters = cfg.solver_iters
    vr = vel_rows(cfg)
    print(f"live manifolds {m_live} | live groups {live_groups}/{n_groups} "
          f"| member body-tile visits {member_visits} "
          f"(window tiles {int((tmax - tmin).sum())})")

    # ---- analytic model ----
    # solve kernel
    con_stream_B = iters * n_groups * CON_ROWS * GROUP * 4
    # gather+scatter: per (iter, member tile visit, sub-tile): 2 gather dots
    # [vr,128]x[128,128] + 2 scatter dots — 2*vr*128*128 FLOPs each
    mxu_flops = iters * member_visits * SUB * 4 * (2 * vr * 128 * 128)
    # VPU point math: ~420 f32 ops per contact point per lane (vrel crosses,
    # 3 channel solves, 4 impulse applications; counted from _solve_kernel)
    pts = 4 * m_live
    vpu_flops = iters * pts * 420
    solve = dict(hbm=con_stream_B, mxu=mxu_flops, vpu=vpu_flops)

    # setup kernel: one pass over groups; gathers body table rows
    # (body_rows) per member visit; writes CON_ROWS stream once
    br = body_rows(cfg)
    setup = dict(
        hbm=n_groups * CON_ROWS * GROUP * 4 + npad * br * 4,
        mxu=member_visits * SUB * 2 * (br * 128 * 128 * 2),
        vpu=pts * 600,
    )

    # ---- measured times ----
    velw, con_f, acc_f, pacc_f, win = setup_pallas(
        bodies, man, warm, relax, slot, mpad, cfg, interpret=interp)
    t_solve = timeit(
        jax.jit(lambda v, c, a, w, p: solve_packed(
            v, c, a, w, cfg, interpret=interp, alias=False, afp=p)[0]),
        velw, con_f, acc_f, win, pacc_f, reps=reps)
    t_setup = timeit(
        jax.jit(lambda bd, mn, w, r, s: setup_pallas(
            bd, mn, w, r, s, mpad, cfg, interpret=interp)[0]),
        bodies, man, warm, relax, slot, reps=reps)
    t_full = timeit(
        jax.jit(lambda s: step(s, cfg)[0].bodies.pos), st, reps=reps)

    # dispatch overhead floor: time an empty jitted identity
    t_null = timeit(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 128)),
                    reps=reps)

    print(f"\nmeasured: solve {t_solve*1e3:.2f} ms | setup "
          f"{t_setup*1e3:.2f} ms | full step {t_full*1e3:.2f} ms | "
          f"dispatch floor {t_null*1e3:.2f} ms")

    rows = []
    for name, mdl, t in (("solve", solve, t_solve), ("setup", setup, t_setup)):
        tn = max(t - t_null, 1e-6)   # net of relay dispatch
        sol_hbm = mdl["hbm"] / PEAK_HBM
        sol_mxu = mdl["mxu"] / PEAK_MXU_F32HI
        sol_vpu = mdl["vpu"] / PEAK_VPU
        sol = sol_hbm + sol_mxu + sol_vpu   # serial-roofline lower bound sum
        rows.append({
            "stage": name, "ms": round(t * 1e3, 2),
            "ms_net": round(tn * 1e3, 2),
            "hbm_bytes": mdl["hbm"], "mxu_flops": mdl["mxu"],
            "vpu_flops": mdl["vpu"],
            "achieved_GBps": round(mdl["hbm"] / tn / 1e9, 1),
            "achieved_mxu_GFs": round(mdl["mxu"] / tn / 1e9, 1),
            "achieved_vpu_GFs": round(mdl["vpu"] / tn / 1e9, 1),
            "sol_ms": round(sol * 1e3, 3),
            "x_over_sol": round(tn / sol, 1),
        })
        print(f"\n[{name}] net {tn*1e3:.2f} ms")
        print(f"  HBM  {fmt(mdl['hbm'], 'B')}  -> {fmt(mdl['hbm']/tn, 'B/s')}"
              f"  ({100*mdl['hbm']/tn/PEAK_HBM:5.1f}% of 819 GB/s)")
        print(f"  MXU  {fmt(mdl['mxu'], 'FLOP')} -> "
              f"{fmt(mdl['mxu']/tn, 'FLOP/s')}"
              f"  ({100*mdl['mxu']/tn/PEAK_MXU_F32HI:5.1f}% of f32-HI peak)")
        print(f"  VPU  {fmt(mdl['vpu'], 'FLOP')} -> "
              f"{fmt(mdl['vpu']/tn, 'FLOP/s')}"
              f"  ({100*mdl['vpu']/tn/PEAK_VPU:5.1f}% of est peak)")
        print(f"  speed-of-light {sol*1e3:.3f} ms -> running at "
              f"{tn/sol:.1f}x SoL")

    out = {"n": n, "m_live": m_live, "live_groups": live_groups,
           "member_visits": member_visits, "full_step_ms":
           round(t_full * 1e3, 2), "dispatch_floor_ms":
           round(t_null * 1e3, 2), "stages": rows,
           "backend": jax.default_backend()}
    print("\n" + json.dumps(out))


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20480
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    main(n, reps)
