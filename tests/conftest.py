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

# The persistent compile cache was disabled on CPU 2026-08-18 after two
# full-suite runs died inside the cache's get/put. Root cause was the
# pre-AVX2-cap ISA mismatch (AOT executables serialized with AMX/AVX512
# subsets this migrating VM can't reliably execute): with the cap above in
# place, two clean cached fast-tier runs landed 2026-08-19 (71 passed cold
# 13m19s, warm 6m41s vs 16m25s uncached), so the cache is ON by default.
# NUDGE_CPU_CACHE=0 opts out if the segfaults ever return.
if os.environ.get("NUDGE_CPU_CACHE", "1") != "0":
    from nudge_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache(allow_cpu=True)
