"""Platform helpers: persistent compilation cache + CPU forcing.

The dev box reaches its TPU through a relay whose remote-compile service is
slow/flaky for larger programs; a persistent compilation cache makes repeat
runs immune to that. Call `enable_compilation_cache()` before the first jit
execution (bench.py and the demo drivers do)."""

from __future__ import annotations

import os

import jax

_DEFAULT_CACHE = os.path.expanduser("~/.cache/nudge_tpu_xla")


def enable_compilation_cache(path: str = _DEFAULT_CACHE) -> None:
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def force_cpu(n_virtual_devices: int = 0) -> None:
    """Use the host CPU backend (works even though sitecustomize pre-imports
    jax with JAX_PLATFORMS=axon). Must run before first backend use."""
    if n_virtual_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={n_virtual_devices}"
            ).strip()
    jax.config.update("jax_platforms", "cpu")
