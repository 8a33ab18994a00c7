"""Static simulation configuration.

The reference engine's only configuration is compile-time (`NUDGE_SIMDV_WIDTH`,
SURVEY.md C16) plus per-call arguments (dt, iteration count chosen by the demo's
step loop, SURVEY.md §3.A). Here every capacity and solver knob lives in one
hashable frozen dataclass so it can be a `jax.jit` static argument: capacities
become static array shapes (they replace the reference's caller-sized `Arena`
and SoA capacities, `nudge.h` — SURVEY.md C1/C3).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

# Contact identity is the (gid_a, gid_b, feature) triple of two i32 global
# collider ids + feature id — no packed-key collider cap (the reference's
# uint16 BodyPair caps bodies at 64Ki; we only cap by memory).

# Contact points per manifold (box-box clip output is reduced to this many
# well-spread points; sphere manifolds use slot 0).
CONTACT_POINTS = 4


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """All static knobs. Hashable; pass as a jit static argument."""

    # --- capacities (static shapes; replace the reference Arena, SURVEY C3) ---
    max_bodies: int = 64
    max_boxes: int = 64
    max_spheres: int = 0
    # candidate-pair capacities per narrowphase class (SURVEY C5 output)
    max_box_box_pairs: int = 256
    max_box_sphere_pairs: int = 0
    max_sphere_sphere_pairs: int = 0
    # compacted manifold capacity (SURVEY C1 ContactData.capacity analog;
    # each manifold holds up to CONTACT_POINTS contact points)
    max_manifolds: int = 256
    # user-filtered pair list capacity (BodyConnections, SURVEY C14)
    max_connections: int = 0

    # --- time stepping ---
    dt: float = 1.0 / 60.0
    gravity: Tuple[float, float, float] = (0.0, -9.81, 0.0)

    # --- solver (SURVEY C10/C11) ---
    solver_iters: int = 20          # reference demo uses ~20 velocity iterations [MED]
    solver: str = "auto"            # auto | xla | pallas | pallas_interpret (M5)
    # Ceiling for the XLA-solver branch on TPU (round-5 bisect, final
    # diagnosis): the TPU worker kills ANY single program execution running
    # longer than ~3-5 minutes — the kill reports as "worker crashed /
    # kernel fault" and blacks out the relay for 10-20 min. The XLA
    # setup+solve branch is slow at scale (multi-second steps at 16k+
    # bodies), so ordinary 30-100-step scan windows cross that deadline and
    # get the worker killed; the Pallas kernel path at the same shapes is
    # ~10-50x faster per step and stays far under it. (Proof the code is
    # innocent: a CLEAN pile2048-XLA program also kills the worker when
    # asked for one 4,000-step scan.) The engine therefore refuses at TRACE
    # time to build an XLA-solver step above this body count on TPU — a
    # loud Python error beats a dead worker. Callers that bound their
    # per-call step counts can raise it (scripts/kernel_smoke.py probes do).
    xla_solver_max_bodies: int = 8192
    max_colors: int = 24            # greedy contact coloring rounds (SURVEY §7 M3)
    # reuse last frame's conflict-free coloring via a (ga,gb) join; only new
    # manifolds run greedy rounds (settled scenes: zero rounds). Off = fresh
    # greedy coloring every step like the reference's per-frame batching.
    persistent_coloring: bool = True
    # Aligned-equality fast paths (round-4, VERDICT r3 item 3a): the warm
    # cache and the color cache are stored in manifold-slot order, so when
    # this step's manifold identity stream (ga, gb, feat, validity) equals
    # last step's, the cache read and the coloring join collapse from
    # ~126 ms of lax.sort joins (20,480-pile profile) to one elementwise
    # compare + lax.cond. Near-rest scenes hit almost every step. Disable
    # under vmap(step) (parallel.mesh batched paths): vmapped lax.cond
    # lowers to lax.select, which executes BOTH branches and the compare.
    aligned_fast_path: bool = True
    # differentiable mode: replace the solve's dynamic trip count
    # (solver_iters * n_colors_actually_used, a traced value) with the
    # static bound solver_iters * max_colors so jax.grad/vjp can reverse
    # through the step (reverse-mode AD rejects dynamic fori_loop bounds).
    # Passes for unused colors match no manifolds and are exact no-ops; the
    # cost is wasted sweeps when the scene uses far fewer colors than
    # max_colors. New capability vs the C++ reference — nothing upstream
    # can differentiate through a simulation (see tests/test_autodiff.py).
    differentiable: bool = False
    baumgarte: float = 0.2          # position-bias factor (bias = β·max(0,pen−slop)/dt)
    slop: float = 0.005             # allowed penetration before bias kicks in
    # cap on the penetration-recovery velocity: deep transient penetrations
    # (falling-pile impacts) would otherwise inject bias velocities of
    # β·depth/dt >> impact speed and pump energy into the pile until it
    # explodes (observed at the 20480-box drop; the standard stabilization
    # in production engines)
    max_bias_vel: float = 2.0
    # cap on the PSEUDO (position-correction) recovery velocity under split
    # impulse. Separate from max_bias_vel because the pseudo channel moves
    # positions only — it cannot inject kinetic energy, so it is safe to run
    # much stronger than the momentum-carrying bias. It NEEDS to be strong:
    # under a deep column load the velocity solve under-converges and leaves
    # a sustained downward creep of ~1-1.6 m/s at the bottom contacts
    # (measured, 20,480-box pile at peak compaction) — a pseudo capped at
    # max_bias_vel=2 barely outruns it, and once penetration outgrows the
    # AABB margin the pair count multiplies, convergence worsens, and the
    # pile implodes into the ground (round-3 TPU trace, steps 700-1000).
    max_pseudo_vel: float = 10.0
    # split-impulse position correction: penetration is resolved by a
    # parallel PSEUDO-velocity solve whose result moves positions but never
    # momentum, and the Baumgarte term leaves the velocity solve entirely —
    # removing its energy injection (round-1 fidelity finding: settled-pile
    # KE grew linearly from bias churn). β/cap reuse baumgarte/max_bias_vel.
    split_impulse: bool = True
    # emergency decompression: under split impulse, penetration deeper than
    # this still gets a (capped) Baumgarte velocity bias on the part beyond
    # the threshold. Pseudo corrections carry no momentum, so a deep pile
    # impact (20k-box drop: 26 layers raining) can out-compress the
    # position-only recovery until box centers cross and SAT normals flip —
    # real separating momentum must cascade the decompression there. At rest
    # depths (~slop) this term is exactly zero, so no energy churn returns.
    deep_bias_depth: float = 0.15
    # approach-velocity gate on the deep bias: the emergency term is capped
    # at max(0, -vn0 - deep_bias_gate) where vn0 is the contact's pre-solve
    # normal velocity (negative = approaching). While the pile actively
    # compresses (impact: approach speeds of m/s) the bias runs at full
    # strength; at rest vn0 is just the per-step gravity kick (~g*dt=0.16 on
    # ground contacts), inside the deadband, so the bias is exactly zero —
    # without the gate, resting contacts deeper than deep_bias_depth become
    # bias trampolines (observed on the settled 20,480 pile: KE doubled
    # every ~25 steps from ~750 until the broadphase overflowed and the
    # pile exploded). Negative disables gating (unconditional deep bias).
    deep_bias_gate: float = 0.3
    # UNGATED anti-creep floor under the gate (round-3 fix): a column under
    # sustained load creeps — each under-converged solve leaves a residual
    # approach velocity, positions compact by its dt-integral, and the gate
    # above reads the slow approach (< deep_bias_gate) as "at rest" and
    # zeroes the emergency bias. Nothing resists, interpenetration deepens,
    # overlapping AABBs multiply the pair/manifold load (which worsens
    # convergence), and at the 20,480-box pile the bottom boxes creep past
    # the ground slab's center plane, the SAT normal flips, and the solver
    # ejects them through the floor (observed round 3: eternal free fall
    # below the world, PE -> -inf). Reproduced at 650 bodies with
    # solver_iters=5 (scripts/debug_tower.py). Fix: penetration beyond
    # deep_bias_ungated_depth gets a bias of up to deep_bias_ungated_vel
    # REGARDLESS of approach velocity. The small cap (~3x the per-step
    # gravity kick g*dt=0.16) beats the creep rate but cannot re-create the
    # 2 m/s bias trampolines that forced the gate; the threshold is 50x the
    # rest depth (~slop) so settled contacts never see it.
    deep_bias_ungated_depth: float = 0.25
    deep_bias_ungated_vel: float = 0.5
    # include the pseudo (position-solve) normal impulse in the friction
    # cone bound: the pseudo impulse IS contact force spent resolving
    # penetration, and classic Baumgarte implicitly granted friction for it
    # by inflating the real normal impulse. Without this, piles that were
    # stable under Baumgarte lose shear strength under split impulse and
    # avalanche (observed: 2048-box pile restless, KE bursts).
    pseudo_friction: bool = True
    # hard per-step speed limit (0 = unlimited), applied in advance() before
    # the pose update. Tunneling armor (the Box2D maxTranslation analog):
    # collapsing piles focus momentum Newton's-cradle style into ejecta
    # FASTER than free fall (observed 47 m/s on the 20,480 drop, ~2x free
    # fall) which cross a box diameter per 1/60 step — past any possible
    # contact resolution and, for thin geometry, past the SAT normal-flip
    # plane. scenes.auto_config sets this to 1.25x the scene's free-fall
    # ceiling (never touches legitimate motion; floor 20 m/s).
    max_lin_vel: float = 0.0
    friction: float = 0.5           # default Coulomb friction if collider has none
    restitution: float = 0.0        # reference has none [MED]; kept as a knob
    warm_start: bool = True

    # --- broadphase ---
    aabb_margin: float = 0.02       # fattening so near-touching pairs persist
    broadphase: str = "auto"        # "allpairs" | "grid" | "auto"
    grid_cell: float = 0.0          # 0 => derived from max collider extent
    grid_density: int = 24          # colliders read per neighbor cell (M4)
    grid_table_dims: Tuple[int, int, int] = (128, 32, 128)  # dense cell table
    max_big_colliders: int = 16     # oversized colliders (dense side channel)
    # capacity of the compacted candidate list the grid expands stencil
    # windows into (0 => 16x total_pairs ~= 80 slots/body under the standard
    # 5x-bodies pair tuning; measured settled piles use 13-18/body and
    # deepen with pile height). Candidates are pre-AABB-test pair slots;
    # overflow is flagged AND drops contacts, so headroom matters: a
    # 2048-pile sat at 0.5 KE for 500 steps, crossed a 20/body cap as it
    # compacted, and collapsed through itself within 100 steps.
    grid_expand_cap: int = 0
    persistent_broadphase: bool = False  # amortize pair gen across steps (opt-in)
    rebuild_margin: float = 0.1     # speculative AABB fattening at rebuild
    # The fat speculative set is a different population than the tight set:
    # on a lattice spawn (or a settled pile) the 0.1 margin catches ~13
    # half-stencil neighbors/body where the tight margin catches ~2-7. The
    # persistent cache therefore gets its OWN capacity = this factor x the
    # per-class pair caps; the per-step re-filter compacts back down to the
    # tight caps, so everything downstream keeps non-persistent shapes.
    # 3x the 5x-bodies tuning = 15 pairs/body, above the 13/body lattice max.
    fat_pair_factor: int = 3

    # --- sleeping (SURVEY C13) ---
    sleeping: bool = False
    sleep_lin_vel: float = 0.05     # |v| threshold
    sleep_ang_vel: float = 0.10     # |ω| threshold
    sleep_frames: int = 60          # idle frames before a body may sleep
    island_sweeps: int = 8          # label-propagation rounds for island grouping
    # kill plane (needs sleeping=True): a dynamic body whose center falls
    # below this y is force-slept and never woken — it has left the world.
    # Runaway debris in eternal free fall is not just untidy: at extreme
    # coordinates it drags the grid broadphase's mean re-base anchor and
    # clamps the LIVE scene into border cells (observed round 3: ~1,100
    # ejecta at y ~ -10^3 re-exploded the settled 20,480 pile). Default off;
    # prefer containment geometry where possible — force-slept bodies park
    # in a border cell of the grid and can raise the density-overflow flag
    # if many accumulate.
    kill_plane_y: float = -1e9
    # wake hysteresis: a contact only wakes a sleeper if the toucher moves
    # faster than wake_factor x the sleep thresholds PRE-solve. Settled piles
    # keep a few residual jigglers slightly above the sleep threshold; at
    # 1x they would re-wake their sleeping neighbors every step and the pile
    # never finishes falling asleep. Real impacts arrive well above this.
    wake_factor: float = 4.0


    @property
    def num_colliders(self) -> int:
        return self.max_boxes + self.max_spheres

    @property
    def total_pairs(self) -> int:
        return (
            self.max_box_box_pairs
            + self.max_box_sphere_pairs
            + self.max_sphere_sphere_pairs
        )

    @property
    def cache_capacity(self) -> int:
        return self.max_manifolds * CONTACT_POINTS

    def replace(self, **kw) -> "SimConfig":
        return dataclasses.replace(self, **kw)
