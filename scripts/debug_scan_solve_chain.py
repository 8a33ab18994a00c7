"""In-scan diagnostic #2: the setup kernel's outputs were verified correct
in-scan (debug_scan_setup.py); now compare the SOLVE outputs when fed the
kernel-packed tensors vs the XLA-packed tensors, inside the same scan step.

    python scripts/debug_scan_solve_chain.py [n_bodies] [steps]
"""

import sys

from nudge_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

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


def main(n=20480, steps=8):
    b = scene_pile(n)
    cfg = b.auto_config(max_box_box_pairs=int(n * 4),
                        max_manifolds=int(n * 2), grid_density=12)
    st = b.finalize(cfg)

    def step_diag(state, _):
        bodies = apply_gravity(state.bodies, state.sleep, cfg)
        man, bp = collide(state, cfg)
        warm, pwarm = read_cached_impulses(state.cache, man)

        # XLA reference setup + pack + solve
        con, bodies_x, acc = setup_constraints(bodies, man, warm, cfg)
        velw_x, cf_x, af_x, _afp, win_x, slot_x = pack_solver_inputs(
            bodies_x, con, acc, cfg)
        velw_ox, acc_ox, _ = solve_packed(velw_x, cf_x, af_x, win_x, cfg)

        # Pallas setup kernel + solve (the fused chain)
        color, _, relax, _ = color_manifolds(man, bodies, cfg)
        slot_p, mpad = color_slots(color, man, bodies, cfg)
        velw_p, cf_p, af_p, _pacc, win_p = setup_pallas(
            bodies, man, warm, relax, slot_p, mpad, cfg)
        velw_op, acc_op, _ = solve_packed(velw_p, cf_p, af_p, win_p, cfg,
                                       alias=False)

        diag = {
            "d_solved_velw": jnp.max(jnp.abs(velw_ox - velw_op)),
            "d_solved_acc": jnp.max(jnp.abs(acc_ox - acc_op)),
            "max_velw_ox": jnp.max(jnp.abs(velw_ox[0:6])),
            "max_velw_op": jnp.max(jnp.abs(velw_op[0:6])),
        }

        # continue the rollout with the XLA chain
        bodies2, acc2 = unpack_solver_outputs(bodies_x, velw_ox, acc_ox,
                                              slot_x, man.normal.shape[0])
        cache = write_cached_impulses(man, accumulated_world_impulse(
            con, acc2))
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
    main(n, steps)
