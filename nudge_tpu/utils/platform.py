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
    jax with JAX_PLATFORMS=axon). Must run before first backend use.

    If an ``xla_force_host_platform_device_count`` flag is already present
    with a *smaller* count than requested, it is replaced — a stale count
    would otherwise produce a silently undersized mesh downstream."""
    if n_virtual_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        marker = "--xla_force_host_platform_device_count="
        parts = [f for f in flags.split() if not f.startswith(marker)]
        kept = [f[len(marker):] for f in flags.split() if f.startswith(marker)]
        count = max([n_virtual_devices] + [int(k) for k in kept if k.isdigit()])
        parts.append(f"{marker}{count}")
        os.environ["XLA_FLAGS"] = " ".join(parts)
    jax.config.update("jax_platforms", "cpu")
