"""Probe how much simultaneously-resident Pallas VMEM this chip holds.

Evidence for ops/solver_kernel._vmem_budget_bytes(): binary-search the
largest (input + output resident) Pallas copy kernel that compiles AND runs
on the attached TPU. The solver/setup kernels keep their body table and
accumulators resident (no grid over them), so their feasibility is governed
by exactly this number, not by the "~16MB/core" guide figure (which v5e's
128MB scratch window renders wildly conservative — measured 120MB OK on
TPU v5 lite, 2026-08-19).

Usage: python scripts/vmem_probe.py [max_mb] (default 160)
Prints one line per trial and a final PROBE_OK line with the largest
working size; feed budget = ~0.8x that into NUDGE_VMEM_BUDGET_MB or the
per-chip table in _vmem_budget_bytes().
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def trial(total_mb: float) -> bool:
    """One kernel holding total_mb of resident VMEM (half input, half
    output), all blocks unviewed (no index_map grid) => simultaneously
    resident."""
    n_f32 = int(total_mb * 1024 * 1024 / 4 / 2)
    rows = max(n_f32 // 128, 8)
    x = jnp.ones((rows, 128), jnp.float32)

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    try:
        out = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        )(x)
        ok = bool(np.isfinite(np.asarray(out[0, 0])))
        return ok
    except Exception as e:                             # noqa: BLE001
        print(f"  {total_mb:.0f}MB failed: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        return False


def main():
    max_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 160.0
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    lo, hi = 0.0, None
    size = 8.0
    while size <= max_mb:                  # exponential ascent
        ok = trial(size)
        print(f"trial {size:.0f}MB resident: {'OK' if ok else 'FAIL'}",
              flush=True)
        if not ok:
            hi = size
            break
        lo = size
        size *= 2
    if hi is not None:                     # bisect the edge
        while hi - lo > 8.0:
            mid = (lo + hi) / 2
            ok = trial(mid)
            print(f"trial {mid:.0f}MB resident: {'OK' if ok else 'FAIL'}",
                  flush=True)
            if ok:
                lo = mid
            else:
                hi = mid
    print(f"PROBE_OK device_kind={dev.device_kind!r} "
          f"max_resident_mb={lo:.0f} suggested_budget_mb={0.8 * lo:.0f}",
          flush=True)


if __name__ == "__main__":
    main()
