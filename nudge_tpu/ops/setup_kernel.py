"""Pallas TPU kernel for contact-constraint setup (SURVEY C10, fused M5+).

The XLA `setup_constraints` is ~100 small ops over [M,P] arrays (body gathers,
quaternion rotations, effective masses, warm-start projection + scatter) and
dominates the non-kernel step cost once the solve runs in Pallas. This kernel
computes the ENTIRE packed constraint tensor consumed by the solve kernel
(solver_kernel.py row/group layout) directly on-chip:

  - XLA packs only a thin per-manifold *geometry* payload (normal, friction,
    contact points, depths, warm impulses, body ids) into color-sorted groups
    — one gather instead of ~25 scatters of derived rows;
  - manifolds are processed in GROUPS of SUB=8 128-lane tiles ([k,8,128]
    row math at full vreg occupancy — see solver_kernel.py);
  - per group, body state (pos/quat/inv-inertia/inv-mass) is gathered with
    the same windowed one-hot MXU matmuls as the solver; contact frames,
    angular response vectors I⁻¹(r×d), effective masses and Baumgarte bias
    are pure row math (reference: setup_contact_constraints, SURVEY §3.C);
  - warm-start impulses are projected onto the new frames, clamped, written
    to the accumulator tensor, and their velocity change is scattered into
    the resident body-momentum table (reference applies warm starts in
    setup).

Output feeds solver_kernel._solve_kernel unchanged — together they leave only
broadphase/narrowphase/cache-join outside the kernel layer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import CONTACT_POINTS, SimConfig
from ..state import Bodies
from .solver_kernel import (
    ACC_ROWS, CON_ROWS, GROUP, LANES, SUB, WORD_BITS, _IDX_SENT, _PB0, _PT,
    _PT0, _rup, acc_from_kernel_layout, color_sorted_slots, dynamic_windows,
    padded_groups, spatial_subkey, vel_rows, window_words,
)

GEOM_ROWS = 44
# geometry payload row layout (column = manifold):
#   0:3 n | 3 mu | 4 relax | 5 idx_a | 6 idx_b | 7 live
#   8:20  pos   (p-major: 8 + 3p + c)
#   20:24 depth
#   24:36 warm impulse (p-major)
#   36:40 point_valid
#   40:44 warm pseudo impulse (split impulse; zeros otherwise)

# body table row layout (column = body):
#   0:3 pos | 3:7 quat | 7:10 inv_inertia | 10 inv_mass
#   11:14 vel | 14:17 angvel (pre-step; packed when some bias term needs the
#   pre-solve contact velocity: restitution, or the deep-bias approach gate)
def needs_vel0(cfg: SimConfig) -> bool:
    return cfg.restitution > 0.0 or (
        cfg.split_impulse and cfg.deep_bias_gate >= 0.0)


def body_rows(cfg: SimConfig) -> int:
    return 24 if needs_vel0(cfg) else 16


def color_slots(color, man, bodies: Bodies, cfg: SimConfig):
    """Group-padded color-sorted slot for every manifold (each 1024-wide
    group single-color, spatially ordered within a color — see
    solver_kernel.spatial_subkey). Returns (slot i32[M], mpad)."""
    dyn = bodies.inv_mass > 0.0
    sub = spatial_subkey(man.body_a, man.body_b,
                         dyn[man.body_a], dyn[man.body_b])
    return color_sorted_slots(color, sub, man.normal.shape[0], cfg)


def pack_geometry(bodies: Bodies, man, warm, relax, slot, mpad,
                  cfg: SimConfig, pwarm=None):
    """Build (velw, body_tbl, geom, (tmin, tmax, bits)) for the setup kernel.

    One [GEOM_ROWS, M+1] row stack + one gather by inverse slot replaces
    per-row scatters; column M is the dead column every unused slot maps to.
    """
    n = bodies.pos.shape[0]
    m = man.normal.shape[0]
    npad = _rup(max(n, LANES), LANES)

    velw = jnp.zeros((vel_rows(cfg), npad), jnp.float32)
    velw = velw.at[0:3, :n].set(bodies.vel.T)
    velw = velw.at[3:6, :n].set(bodies.angvel.T)
    velw = velw.at[6, :n].set(bodies.inv_mass)

    bt = jnp.zeros((body_rows(cfg), npad), jnp.float32)
    bt = bt.at[0:3, :n].set(bodies.pos.T)
    bt = bt.at[3:7, :n].set(bodies.quat.T)
    bt = bt.at[7:10, :n].set(bodies.inv_inertia.T)
    bt = bt.at[10, :n].set(bodies.inv_mass)
    if needs_vel0(cfg):
        bt = bt.at[11:14, :n].set(bodies.vel.T)
        bt = bt.at[14:17, :n].set(bodies.angvel.T)

    live = man.valid
    ia = jnp.where(live, man.body_a, _IDX_SENT).astype(jnp.float32)
    ib = jnp.where(live, man.body_b, _IDX_SENT).astype(jnp.float32)
    P = CONTACT_POINTS
    rows = jnp.concatenate([
        man.normal.T,                                       # 0:3
        man.friction[None, :],                              # 3
        jnp.where(live, relax, 0.0)[None, :],               # 4
        ia[None, :],                                        # 5
        ib[None, :],                                        # 6
        live.astype(jnp.float32)[None, :],                  # 7
        man.pos.reshape(m, 3 * P).T,                        # 8:20
        man.depth.T,                                        # 20:24
        warm.reshape(m, 3 * P).T,                           # 24:36
        man.point_valid.astype(jnp.float32).T,              # 36:40
        (jnp.zeros((P, m), jnp.float32) if pwarm is None
         else pwarm.T),                                     # 40:44
    ], axis=0)
    # dead column: sentinel ids, zero everything else
    dead = jnp.zeros((GEOM_ROWS, 1), jnp.float32)
    dead = dead.at[5, 0].set(float(_IDX_SENT)).at[6, 0].set(float(_IDX_SENT))
    rows = jnp.concatenate([rows, dead], axis=1)            # [40, M+1]
    invslot = jnp.full((mpad,), m, jnp.int32).at[slot].set(
        jnp.arange(m, dtype=jnp.int32))
    geom = rows[:, invslot]                                 # [40, mpad]

    # per-group body-tile windows over dynamic sides only (see
    # solver_kernel.spatial_subkey for why static sides are excluded)
    dyn = bodies.inv_mass > 0.0
    win = dynamic_windows(
        slot, live, man.body_a, man.body_b, dyn[man.body_a],
        dyn[man.body_b], mpad, npad // LANES)

    return velw, bt, geom, win


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _cross3(a, b):
    ax, ay, az = a[0:1], a[1:2], a[2:3]
    bx, by, bz = b[0:1], b[1:2], b[2:3]
    return jnp.concatenate(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=0)


def _dot3(a, b):
    return jnp.sum(a * b, axis=0, keepdims=True)


def _qrot(q, v):
    """Rotate [3,S,128] rows v by quaternion rows q[4,S,128] (body->world)."""
    u, w = q[0:3], q[3:4]
    uv = _cross3(u, v)
    return v + 2.0 * (w * uv + _cross3(u, uv))


def _qrot_inv(q, v):
    u, w = -q[0:3], q[3:4]
    uv = _cross3(u, v)
    return v + 2.0 * (w * uv + _cross3(u, uv))


def _basis(n):
    """Duff et al. tangent frame for unit normal rows n[3,S,128] (mirrors
    mathx.orthonormal_basis)."""
    nx, ny, nz = n[0:1], n[1:2], n[2:3]
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    t1 = jnp.concatenate([1.0 + sign * nx * nx * a, sign * b, -sign * nx], 0)
    t2 = jnp.concatenate([b, sign + ny * ny * a, -ny], 0)
    return t1, t2


def _make_setup_kernel(cfg: SimConfig, w_words: int):
    baumgarte_over_dt = cfg.baumgarte / cfg.dt
    max_bias_vel = cfg.max_bias_vel
    max_pseudo_vel = cfg.max_pseudo_vel
    slop = cfg.slop
    deep_bias_depth = cfg.deep_bias_depth
    deep_bias_gate = cfg.deep_bias_gate
    ungated_depth = cfg.deep_bias_ungated_depth
    ungated_vel = cfg.deep_bias_ungated_vel
    restitution = cfg.restitution
    warm_start = cfg.warm_start
    split = cfg.split_impulse
    vel0 = needs_vel0(cfg)
    n_body_rows = body_rows(cfg)
    n_vel_rows = vel_rows(cfg)

    def kernel(tmin_ref, tmax_ref, bits_ref, bt_ref, geom_ref, velw_in,
               velw_out, con_out, acc_out, *rest):
        if split:
            pacc_out, gA, gB = rest
        else:
            gA, gB = rest
        t = pl.program_id(0)

        # velw_out is NOT aliased to velw_in (aliased pallas outputs chained
        # into the solve kernel corrupted buffers under scan+donation) —
        # initialize the resident output block once, then accumulate into it
        @pl.when(t == 0)
        def _init():
            velw_out[:, :] = velw_in[:, :]

        brow = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0
                                        ).astype(jnp.float32)
        hp = jax.lax.Precision.HIGHEST

        idxa = geom_ref[5:6, :, :]                          # [1,S,128]
        idxb = geom_ref[6:7, :, :]
        live = geom_ref[7:8, :, :]
        bt0 = tmin_ref[t]
        bt1 = tmax_ref[t]

        def member(bti):
            word = bits_ref[t * w_words + bti // WORD_BITS]
            return ((word >> (bti % WORD_BITS)) & 1) > 0

        # ---- gather body rows (windowed one-hot matmuls, bits skip) ----
        gA[:, :, :] = jnp.zeros((n_body_rows, SUB, LANES), jnp.float32)
        gB[:, :, :] = jnp.zeros((n_body_rows, SUB, LANES), jnp.float32)

        def gather_bt(bti, _):
            @pl.when(member(bti))
            def _():
                cols = pl.ds(bti * LANES, LANES)
                tbl = bt_ref[:, cols]
                for s in range(SUB):
                    ia_s = geom_ref[5:6, s, :]              # [1,128]
                    ib_s = geom_ref[6:7, s, :]
                    oha = (brow + bti * LANES == ia_s).astype(jnp.float32)
                    ohb = (brow + bti * LANES == ib_s).astype(jnp.float32)
                    gA[:, s, :] = gA[:, s, :] + jnp.dot(
                        tbl, oha, preferred_element_type=jnp.float32,
                        precision=hp)
                    gB[:, s, :] = gB[:, s, :] + jnp.dot(
                        tbl, ohb, preferred_element_type=jnp.float32,
                        precision=hp)
            return 0

        jax.lax.fori_loop(bt0, bt1, gather_bt, 0)
        A = gA[:, :, :]
        B = gB[:, :, :]

        pa, qa, iia, ima = A[0:3], A[3:7], A[7:10], A[10:11]
        pb, qb, iib, imb = B[0:3], B[3:7], B[7:10], B[10:11]

        n = geom_ref[0:3, :, :]
        mu = geom_ref[3:4, :, :]
        relax = geom_ref[4:5, :, :] * live
        t1, t2 = _basis(n)

        con_out[0:3, :, :] = n
        con_out[3:6, :, :] = t1
        con_out[6:9, :, :] = t2
        con_out[9:10, :, :] = mu
        con_out[10:11, :, :] = relax

        Pimp = jnp.zeros((3, SUB, LANES), jnp.float32)
        dwa = jnp.zeros((3, SUB, LANES), jnp.float32)
        dwb = jnp.zeros((3, SUB, LANES), jnp.float32)
        if split:
            PimpP = jnp.zeros((3, SUB, LANES), jnp.float32)
            dwaP = jnp.zeros((3, SUB, LANES), jnp.float32)
            dwbP = jnp.zeros((3, SUB, LANES), jnp.float32)

        for p in range(CONTACT_POINTS):
            pos = geom_ref[8 + 3 * p:11 + 3 * p, :, :]
            depth = geom_ref[20 + p:21 + p, :, :]
            warm = geom_ref[24 + 3 * p:27 + 3 * p, :, :]
            pv = geom_ref[36 + p:37 + p, :, :]

            ra = pos - pa
            rb = pos - pb

            def eff(d):
                rda = _cross3(ra, d)
                rdb = _cross3(rb, d)
                ja = _qrot(qa, iia * _qrot_inv(qa, rda))
                jb = _qrot(qb, iib * _qrot_inv(qb, rdb))
                k = ima + imb + _dot3(rda, ja) + _dot3(rdb, jb)
                meff = jnp.where(k > 0.0, 1.0 / jnp.maximum(k, 1e-12), 0.0)
                return ja, jb, meff

            jna, jnb, mn = eff(n)
            jt1a, jt1b, mt1 = eff(t1)
            jt2a, jt2b, mt2 = eff(t2)

            baum = jnp.minimum(
                baumgarte_over_dt * jnp.maximum(depth - slop, 0.0),
                max_bias_vel)
            if vel0:
                va0, wa0 = A[11:14], A[14:17]
                vb0, wb0 = B[11:14], B[14:17]
                vrel0 = (vb0 + _cross3(wb0, rb)) - (va0 + _cross3(wa0, ra))
                vn0 = _dot3(vrel0, n)
            if split:
                bias = jnp.minimum(
                    baumgarte_over_dt
                    * jnp.maximum(depth - deep_bias_depth, 0.0),
                    max_bias_vel)
                if deep_bias_gate >= 0.0:
                    # only counteract ACTIVE compression (SimConfig
                    # .deep_bias_gate): zero at rest, full under impact
                    bias = jnp.minimum(
                        bias, jnp.maximum(-vn0 - deep_bias_gate, 0.0))
                    # ungated anti-creep floor (SimConfig
                    # .deep_bias_ungated_depth): quasi-static column
                    # compaction slips under the approach gate
                    bias = jnp.maximum(bias, jnp.minimum(
                        baumgarte_over_dt
                        * jnp.maximum(depth - ungated_depth, 0.0),
                        ungated_vel))
                # pseudo channel: own higher cap (SimConfig.max_pseudo_vel —
                # position-only, no momentum; must outrun column creep)
                pos_bias = jnp.minimum(
                    baumgarte_over_dt * jnp.maximum(depth - slop, 0.0),
                    max_pseudo_vel)
            else:
                bias = baum
                pos_bias = jnp.zeros((1, SUB, LANES), jnp.float32)
            if restitution > 0.0:
                bias = jnp.maximum(
                    bias, restitution * jnp.maximum(-vn0 - 1.0, 0.0))

            # warm-start projection onto the new frame (clamped)
            if warm_start:
                an = jnp.maximum(_dot3(warm, n), 0.0) * pv
                bound = mu * an
                at1 = jnp.clip(_dot3(warm, t1), -bound, bound) * pv
                at2 = jnp.clip(_dot3(warm, t2), -bound, bound) * pv
            else:
                an = jnp.zeros((1, SUB, LANES), jnp.float32)
                at1 = an
                at2 = an

            Pimp = Pimp + an * n + at1 * t1 + at2 * t2
            dwa = dwa + an * jna + at1 * jt1a + at2 * jt2a
            dwb = dwb + an * jnb + at1 * jt1b + at2 * jt2b

            if split:
                # pseudo warm start: seed the pseudo accumulators and the
                # pseudo-velocity channel the same way real warm starts seed
                # momentum — the quasi-static correction field carries over
                if warm_start:
                    pw = jnp.maximum(
                        geom_ref[40 + p:41 + p, :, :], 0.0) * pv
                else:
                    pw = jnp.zeros((1, SUB, LANES), jnp.float32)
                pacc_out[p * SUB:(p + 1) * SUB, :] = pw.reshape(SUB, LANES)
                PimpP = PimpP + pw * n
                dwaP = dwaP + pw * jna
                dwbP = dwbP + pw * jnb

            b0 = _PT0 + _PT * p
            con_out[b0:b0 + 3, :, :] = ra
            con_out[b0 + 3:b0 + 6, :, :] = rb
            con_out[b0 + 6:b0 + 9, :, :] = jna
            con_out[b0 + 9:b0 + 12, :, :] = jnb
            con_out[b0 + 12:b0 + 15, :, :] = jt1a
            con_out[b0 + 15:b0 + 18, :, :] = jt1b
            con_out[b0 + 18:b0 + 21, :, :] = jt2a
            con_out[b0 + 21:b0 + 24, :, :] = jt2b
            con_out[b0 + 24:b0 + 25, :, :] = mn * pv
            con_out[b0 + 25:b0 + 26, :, :] = mt1 * pv
            con_out[b0 + 26:b0 + 27, :, :] = mt2 * pv
            con_out[b0 + 27:b0 + 28, :, :] = bias * pv
            con_out[_PB0 + p:_PB0 + p + 1, :, :] = pos_bias * pv

            # acc block rows: q*SUB + s layout (see solver_kernel acc docs)
            acc_out[p * SUB:(p + 1) * SUB, :] = an.reshape(SUB, LANES)
            acc_out[(4 + p) * SUB:(5 + p) * SUB, :] = at1.reshape(SUB, LANES)
            acc_out[(8 + p) * SUB:(9 + p) * SUB, :] = at2.reshape(SUB, LANES)

        con_out[123:124, :, :] = idxa
        con_out[124:125, :, :] = idxb
        con_out[125:126, :, :] = live
        con_out[_PB0 + CONTACT_POINTS:CON_ROWS, :, :] = jnp.zeros(
            (CON_ROWS - _PB0 - CONTACT_POINTS, SUB, LANES), jnp.float32)

        # ---- apply warm-start impulses to body momentum (and the pseudo
        # channel rows 8:14 under split impulse) ----
        if split:
            z2 = jnp.zeros((2, SUB, LANES), jnp.float32)
            dA = jnp.concatenate(
                [-Pimp * ima, -dwa, z2, -PimpP * ima, -dwaP, z2], 0) * live
            dB = jnp.concatenate(
                [Pimp * imb, dwb, z2, PimpP * imb, dwbP, z2], 0) * live
        else:
            pad_rows = n_vel_rows - 6
            dA = jnp.concatenate(
                [-Pimp * ima, -dwa,
                 jnp.zeros((pad_rows, SUB, LANES))], 0) * live
            dB = jnp.concatenate(
                [Pimp * imb, dwb,
                 jnp.zeros((pad_rows, SUB, LANES))], 0) * live

        def scatter_bt(bti, _):
            @pl.when(member(bti))
            def _():
                cols = pl.ds(bti * LANES, LANES)
                upd = jnp.zeros((n_vel_rows, LANES), jnp.float32)
                for s in range(SUB):
                    ia_s = geom_ref[5:6, s, :]
                    ib_s = geom_ref[6:7, s, :]
                    oha = (brow + bti * LANES == ia_s).astype(jnp.float32)
                    ohb = (brow + bti * LANES == ib_s).astype(jnp.float32)
                    upd = upd + (
                        jax.lax.dot_general(
                            dA[:, s, :], oha, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32, precision=hp)
                        + jax.lax.dot_general(
                            dB[:, s, :], ohb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32, precision=hp)
                    )
                velw_out[:, cols] = velw_out[:, cols] + upd
            return 0

        jax.lax.fori_loop(bt0, bt1, scatter_bt, 0)

    return kernel


def setup_pallas(bodies: Bodies, man, warm, relax, slot, mpad,
                 cfg: SimConfig, interpret: bool = False, pwarm=None):
    """Run the setup kernel. Returns (velw, con_f[CON_ROWS, mpad],
    acc_f[ACC_ROWS, mpad], pacc_f[4, mpad] | None, win) ready for
    solver_kernel's solve pass; velw already has warm starts applied (the
    pseudo channel too, under split impulse)."""
    split = cfg.split_impulse
    velw, bt, geom, win = pack_geometry(
        bodies, man, warm, relax, slot, mpad, cfg, pwarm=pwarm)
    npad = velw.shape[1]
    n_groups = mpad // GROUP
    geom3 = geom.reshape(GEOM_ROWS, n_groups * SUB, LANES)

    w_words = window_words(npad // LANES)
    out_specs = [
        pl.BlockSpec((vel_rows(cfg), npad), lambda t, *_: (0, 0),
                     memory_space=pltpu.VMEM),          # velw out
        pl.BlockSpec((CON_ROWS, SUB, LANES), lambda t, *_: (0, t, 0),
                     memory_space=pltpu.VMEM),          # con group
        pl.BlockSpec((ACC_ROWS * SUB, LANES), lambda t, *_: (0, t),
                     memory_space=pltpu.VMEM),          # acc group
    ]
    out_shape = [
        jax.ShapeDtypeStruct(velw.shape, jnp.float32),
        jax.ShapeDtypeStruct((CON_ROWS, n_groups * SUB, LANES), jnp.float32),
        jax.ShapeDtypeStruct((ACC_ROWS * SUB, n_groups * LANES), jnp.float32),
    ]
    if split:
        out_specs.append(
            pl.BlockSpec((CONTACT_POINTS * SUB, LANES), lambda t, *_: (0, t),
                         memory_space=pltpu.VMEM))      # pseudo acc group
        out_shape.append(jax.ShapeDtypeStruct(
            (CONTACT_POINTS * SUB, n_groups * LANES), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((body_rows(cfg), npad), lambda t, *_: (0, 0),
                         memory_space=pltpu.VMEM),          # body table
            pl.BlockSpec((GEOM_ROWS, SUB, LANES), lambda t, *_: (0, t, 0),
                         memory_space=pltpu.VMEM),          # geometry stream
            pl.BlockSpec((vel_rows(cfg), npad), lambda t, *_: (0, 0),
                         memory_space=pltpu.VMEM),          # velw (resident)
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((body_rows(cfg), SUB, LANES), jnp.float32),  # gather A
            pltpu.VMEM((body_rows(cfg), SUB, LANES), jnp.float32),  # gather B
        ],
    )
    tmin, tmax, bits = win
    outs = pl.pallas_call(
        _make_setup_kernel(cfg, w_words),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(tmin, tmax, bits, bt, geom3, velw)
    velw_out, con_f3, acc_k = outs[:3]
    con_f = con_f3.reshape(CON_ROWS, mpad)
    acc_f = acc_from_kernel_layout(acc_k, cfg)
    pacc_f = (acc_from_kernel_layout(outs[3], cfg, rows=CONTACT_POINTS)
              if split else None)
    return velw_out, con_f, acc_f, pacc_f, win


def setup_solve_fused(bodies: Bodies, man, warm, cfg: SimConfig,
                      interpret: bool = False, coloring=None, pwarm=None):
    """Full constraint setup + iterated solve in two Pallas kernels.

    Replaces setup_constraints + solve for the TPU path (reference:
    setup_contact_constraints + apply_impulses, SURVEY §3.C). Returns
    (bodies, world_impulse f32[M,P,3] for the cache, spill_count,
    (pseudo_vel, pseudo_angvel), pseudo_acc f32[M,P])."""
    from ..mathx import orthonormal_basis
    from .solver import color_manifolds
    from .solver_kernel import solve_packed

    if coloring is None:
        coloring = color_manifolds(man, bodies, cfg)
    color, _, relax, spill = coloring
    m = man.normal.shape[0]
    slot, mpad = color_slots(color, man, bodies, cfg)

    velw, con_f, acc_f, pacc_f, win = setup_pallas(
        bodies, man, warm, relax, slot, mpad, cfg, interpret=interpret,
        pwarm=pwarm)
    # alias=False is load-bearing: aliasing the solve's velw/acc in->out when
    # the inputs are this setup call's sole-consumer outputs makes XLA chain
    # the two custom calls through one donated buffer, which miscompiles at
    # large N (deterministic garbage at 20480; bit-identical with/without
    # scan donation or an optimization_barrier between the calls; every
    # kernel verified correct whenever the buffers had a second consumer —
    # scripts/debug_scan_chain2.py "solo" vs "chain" modes).
    velw_out, acc_out, pacc_out = solve_packed(
        velw, con_f, acc_f, win, cfg, interpret=interpret, alias=False,
        afp=pacc_f)

    n = bodies.pos.shape[0]
    bodies = bodies.replace(vel=velw_out[0:3, :n].T,
                            angvel=velw_out[3:6, :n].T)
    if velw_out.shape[0] >= 16:
        pseudo = (velw_out[8:11, :n].T, velw_out[11:14, :n].T)
    else:
        z = jnp.zeros((n, 3), jnp.float32)
        pseudo = (z, z)
    acc_n = acc_out[0:4, :].T[slot]
    acc_t1 = acc_out[4:8, :].T[slot]
    acc_t2 = acc_out[8:12, :].T[slot]
    if pacc_out is not None:
        pseudo_acc = pacc_out[0:CONTACT_POINTS, :].T[slot]
    else:
        pseudo_acc = jnp.zeros_like(acc_n)
    t1, t2 = orthonormal_basis(man.normal)
    world = (acc_n[..., None] * man.normal[:, None]
             + acc_t1[..., None] * t1[:, None]
             + acc_t2[..., None] * t2[:, None])
    return bodies, world, spill, pseudo, pseudo_acc
