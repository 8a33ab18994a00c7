"""Platform helpers: persistent compilation cache + CPU forcing.

The dev box reaches its TPU through a relay whose remote-compile service is
slow/flaky for larger programs; a persistent compilation cache makes repeat
runs immune to that. Call `enable_compilation_cache()` before the first jit
execution (bench.py and the demo drivers do)."""

from __future__ import annotations

import hashlib
import os

import jax

_DEFAULT_CACHE = os.path.expanduser("~/.cache/nudge_tpu_xla")


def _host_fingerprint() -> str:
    """Hash of the host CPU feature flags. XLA:CPU AOT executables are
    compiled for the build host's exact feature set; loading an entry
    produced under a different host profile can crash outright (observed
    2026-08-18: a full-suite run segfaulted inside
    compilation_cache.get_executable_and_time; this VM migrates between
    hosts). Keying the cache directory by the feature set makes a host
    change start a fresh cache instead of deserializing foreign AOT code.
    (The 'Target machine feature +prefer-no-scatter is not supported'
    warnings are a separate, benign mismatch: XLA records its own tuning
    pseudo-features, which never appear in the loader's host list.)"""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(
                        " ".join(sorted(line.split()[2:])).encode()
                    ).hexdigest()[:12]
    except OSError:
        pass
    return "nocpuinfo"


def enable_compilation_cache(path: str = _DEFAULT_CACHE,
                             allow_cpu: bool = False) -> None:
    """No-op on the CPU platform unless `allow_cpu`: XLA:CPU executable
    (de)serialization segfaults nondeterministically on this box — observed
    2026-08-18 in BOTH directions (get_executable_and_time on a stale
    entry, put_executable_and_time on a fresh one, each killing a full
    test-suite run). The cache exists to amortize the TPU relay's
    slow/flaky REMOTE compiles; CPU processes recompile instead of
    crashing. Checked via jax.config.jax_platforms (no backend init, so
    calling this before a bounded relay probe cannot block)."""
    platforms = str(getattr(jax.config, "jax_platforms", "") or "")
    if not allow_cpu and platforms.startswith("cpu"):
        return
    path = os.path.join(path, _host_fingerprint())
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
    # Cap XLA:CPU codegen at AVX2: this VM advertises AMX/AVX512 subsets
    # the host doesn't reliably execute — long runs segfaulted inside the
    # LLVM JIT and in executable (de)serialization until capped (observed
    # 2026-08-18, three independent crashes). Applies only when this
    # process is being pointed at the CPU backend, so TPU codegen is
    # untouched.
    if "xla_cpu_max_isa" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_cpu_max_isa=avx2").strip()
    jax.config.update("jax_platforms", "cpu")
    # a cache dir registered while the platform was (expected to be) TPU
    # must not persist into the CPU fallback — see enable_compilation_cache
    if getattr(jax.config, "jax_compilation_cache_dir", None):
        jax.config.update("jax_compilation_cache_dir", None)
