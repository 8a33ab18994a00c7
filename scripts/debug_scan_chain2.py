"""In-scan diagnostic #3: continue the rollout through the PALLAS chain
(engine-like consumption: bodies from velw_op, cache from the fused world
impulse), printing per-step ke. If this corrupts while debug_scan_solve_chain
was clean, the trigger is the consumption of the kernel outputs.

    python scripts/debug_scan_chain2.py [n_bodies] [steps] [mode]

mode: chain  = bodies+cache both from pallas chain (engine-like)
      bodies = bodies from pallas, cache from XLA world
      cache  = bodies from XLA, cache from pallas world
"""

import sys

from nudge_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nudge_tpu.mathx import orthonormal_basis  # noqa: E402
from nudge_tpu.ops.cache import read_cached_impulses, write_cached_impulses  # noqa: E402
from nudge_tpu.ops.contacts import collide  # noqa: E402
from nudge_tpu.ops.integrate import advance, apply_gravity  # noqa: E402
from nudge_tpu.ops.setup_kernel import color_slots, setup_pallas  # noqa: E402
from nudge_tpu.ops.sleeping import update_sleep  # noqa: E402
from nudge_tpu.ops.solver import (  # noqa: E402
    accumulated_world_impulse, color_manifolds, setup_constraints,
)
from nudge_tpu.ops.solver_kernel import (  # noqa: E402
    pack_solver_inputs, solve_packed, unpack_solver_outputs,
)
from nudge_tpu.scenes import scene_pile  # noqa: E402


def main(n=20480, steps=8, mode="chain"):
    b = scene_pile(n)
    cfg = b.auto_config(max_box_box_pairs=int(n * 4),
                        max_manifolds=int(n * 2), grid_density=12)
    st = b.finalize(cfg)

    def step_diag(state, _):
        bodies = apply_gravity(state.bodies, state.sleep, cfg)
        man, bp = collide(state, cfg)
        warm, pwarm = read_cached_impulses(state.cache, man)
        m = man.normal.shape[0]

        if mode != "solo":
            # XLA reference chain
            con, bodies_x, acc = setup_constraints(bodies, man, warm, cfg)
            velw_x, cf_x, af_x, _afp, win_x, slot_x = pack_solver_inputs(
                bodies_x, con, acc, cfg)
            velw_ox, acc_ox, _ = solve_packed(velw_x, cf_x, af_x, win_x, cfg)
            bodies_xs, acc2 = unpack_solver_outputs(bodies_x, velw_ox, acc_ox,
                                                    slot_x, m)
            world_x = accumulated_world_impulse(con, acc2)

        # Pallas chain
        color, _, relax, _ = color_manifolds(man, bodies, cfg)
        slot_p, mpad = color_slots(color, man, bodies, cfg)
        velw_p, cf_p, af_p, _pacc, win_p = setup_pallas(
            bodies, man, warm, relax, slot_p, mpad, cfg)
        velw_op, acc_op, _ = solve_packed(velw_p, cf_p, af_p, win_p, cfg,
                                       alias=False)
        nb = bodies.pos.shape[0]
        bodies_ps = bodies.replace(vel=velw_op[0:3, :nb].T,
                                   angvel=velw_op[3:6, :nb].T)
        acc_n = acc_op[0:4, :].T[slot_p]
        acc_t1 = acc_op[4:8, :].T[slot_p]
        acc_t2 = acc_op[8:12, :].T[slot_p]
        t1, t2 = orthonormal_basis(man.normal)
        world_p = (acc_n[..., None] * man.normal[:, None]
                   + acc_t1[..., None] * t1[:, None]
                   + acc_t2[..., None] * t2[:, None])

        if mode in ("chain", "solo"):
            bodies2, world = bodies_ps, world_p
        elif mode == "bodies":
            bodies2, world = bodies_ps, world_x
        else:
            bodies2, world = bodies_xs, world_p

        diag = {"max_vel": jnp.max(jnp.abs(bodies2.vel))}
        if mode != "solo":
            diag["d_vel"] = jnp.max(jnp.abs(bodies_ps.vel - bodies_xs.vel))
            diag["d_world"] = jnp.max(jnp.abs(world_p - world_x))

        cache = write_cached_impulses(man, world)
        bodies2 = advance(bodies2, state.sleep, cfg)
        sleep, bodies2 = update_sleep(bodies2, man, state.sleep, cfg)
        return state.replace(bodies=bodies2, cache=cache, sleep=sleep, bp=bp,
                             step_count=state.step_count + 1), diag

    @jax.jit
    def sim(st):
        return jax.lax.scan(step_diag, st, None, length=steps)

    st1, diag = sim(st)
    diag = jax.tree.map(np.asarray, diag)
    for i in range(steps):
        print(f"step {i}: " + "  ".join(
            f"{k}={float(diag[k][i]):.4g}" for k in sorted(diag)))


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20480
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    mode = sys.argv[3] if len(sys.argv) > 3 else "chain"
    main(n, steps, mode)
