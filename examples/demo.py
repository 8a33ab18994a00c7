"""Demo driver — the TPU analog of the reference's GLUT box-pile demo
(SURVEY.md C15): drop a pile of boxes (+ optional spheres), simulate
on-device, and render frames to PNGs / an animated GIF with matplotlib.

Rendering is host-side and optional; the simulation itself never leaves the
device except for the sampled frame readbacks.

Usage:
    python examples/demo.py                    # 256-box pile, 600 steps, GIF
    python examples/demo.py --bodies 64 --spheres 0.3 --steps 400
    python examples/demo.py --no-render        # just run + print metrics
    python examples/demo.py --cpu              # run on the host CPU backend
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nudge_tpu.utils.platform import enable_compilation_cache  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bodies", type=int, default=256)
    ap.add_argument("--spheres", type=float, default=0.0,
                    help="fraction of bodies that are spheres")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--frame-every", type=int, default=10)
    ap.add_argument("--out", default="/tmp/nudge_demo")
    ap.add_argument("--no-render", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--sleeping", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        from nudge_tpu.utils.platform import force_cpu

        force_cpu()
    enable_compilation_cache()

    import jax
    import numpy as np

    from nudge_tpu.engine import simulate
    from nudge_tpu.scenes import scene_pile

    b = scene_pile(args.bodies, sphere_frac=args.spheres)
    cfg = b.auto_config(sleeping=args.sleeping)
    st = b.finalize(cfg)
    print(f"{args.bodies} bodies on {jax.devices()[0].platform}; "
          f"caps: pairs {cfg.max_box_box_pairs}, manifolds {cfg.max_manifolds}")

    frames = []
    chunk = args.frame_every
    t0 = time.perf_counter()
    for s in range(0, args.steps, chunk):
        st, m = simulate(st, cfg, chunk)
        frames.append((np.asarray(st.bodies.pos).copy(),
                       np.asarray(st.sleep.awake).copy()))
    wall = time.perf_counter() - t0
    m = jax.tree.map(np.asarray, m)
    print(f"{args.steps} steps in {wall:.2f}s -> {args.steps / wall:.0f} steps/s "
          f"(incl. compile + frame readbacks)")
    print(f"final: contacts={int(m.contact_count[-1])} "
          f"ke={float(m.kinetic_energy[-1]):.3f} "
          f"max_depth={float(m.max_depth[-1]):.4f} "
          f"awake={int(m.awake_count[-1])} overflow={bool(m.overflow.any())}")

    if args.no_render:
        return

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(args.out, exist_ok=True)
    lim = max(8.0, float(np.abs(frames[-1][0][1:, [0, 2]]).max()) + 2)
    images = []
    for i, (pos, awake) in enumerate(frames):
        fig = plt.figure(figsize=(6, 6))
        ax = fig.add_subplot(projection="3d")
        p = pos[1:args.bodies + 1]
        aw = awake[1:args.bodies + 1]
        ax.scatter(p[:, 0], p[:, 2], p[:, 1], s=12,
                   c=np.where(aw, "#1f77b4", "#999999"))
        ax.set_xlim(-lim, lim); ax.set_ylim(-lim, lim); ax.set_zlim(0, 2 * lim)
        ax.set_title(f"step {(i + 1) * chunk}")
        fname = os.path.join(args.out, f"frame_{i:04d}.png")
        fig.savefig(fname, dpi=60)
        plt.close(fig)
        images.append(fname)
    try:
        from PIL import Image

        gif = os.path.join(args.out, "demo.gif")
        imgs = [Image.open(f) for f in images]
        imgs[0].save(gif, save_all=True, append_images=imgs[1:],
                     duration=60, loop=0)
        print(f"wrote {gif} ({len(images)} frames)")
    except ImportError:
        print(f"wrote {len(images)} PNG frames to {args.out}/")


if __name__ == "__main__":
    main()
