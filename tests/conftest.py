"""Tests run on CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware (driver contract).

This machine's sitecustomize pre-imports jax and exports JAX_PLATFORMS=axon
(TPU tunnel), so env vars set here are too late for jax.config's import-time
read — use jax.config.update instead. XLA_FLAGS still works because backends
initialize lazily at first use."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: jit compiles dominate suite wall time and are
# identical between runs — repeat runs of the fast tier drop well under the
# 3-minute target once warm
from nudge_tpu.utils.platform import enable_compilation_cache  # noqa: E402

enable_compilation_cache(os.path.expanduser("~/.cache/nudge_tpu_xla_tests"))
