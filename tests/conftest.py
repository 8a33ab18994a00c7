"""Tests run on CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware (driver contract).

This machine's sitecustomize pre-imports jax and exports JAX_PLATFORMS=axon
(TPU tunnel), so env vars set here are too late for jax.config's import-time
read — use jax.config.update instead. XLA_FLAGS still works because backends
initialize lazily at first use."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Cap XLA:CPU codegen at AVX2: this VM advertises AMX/AVX512 subsets that
# the host doesn't reliably execute — three long suite runs segfaulted in
# compile-adjacent native code (LLVM JIT / executable (de)serialization)
# before this cap; see utils/platform.py for the same cap on force_cpu.
if "xla_cpu_max_isa" not in flags:
    flags = (flags + " --xla_cpu_max_isa=avx2").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The persistent compile cache is OFF on CPU by default: even with the
# AVX2 ISA cap above (which fixed the 2026-08-18 get-path segfaults and
# gave two clean cached fast-tier runs), a 2026-08-19 fast-tier run STILL
# segfaulted inside compilation_cache.put_executable_and_time at 64% — the
# executable-serialization write path itself is unsafe on this migrating
# VM. Cold runs cost ~16m vs ~7m cached; reliability wins. NUDGE_CPU_CACHE=1
# opts back in for local iteration.
if os.environ.get("NUDGE_CPU_CACHE", "0") == "1":
    from nudge_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache(allow_cpu=True)
