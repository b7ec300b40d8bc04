"""Process-level runtime knobs: compilation cache, platform helpers."""

from __future__ import annotations

import os

import jax

_CACHE_PATH = None


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache (TPU compiles via the remote
    compile service take minutes; the cache makes repeat runs instant).
    Re-applies the config if called again with a different path."""
    global _CACHE_PATH
    path = path or os.environ.get(
        "ANS_TPU_CACHE", os.path.join(os.path.dirname(__file__), os.pardir,
                                      ".jax_cache"))
    path = os.path.abspath(path)
    if _CACHE_PATH == path:
        return
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _CACHE_PATH = path


def force_cpu(n_virtual_devices: int | None = None) -> None:
    """Route jax to the host CPU backend (tests / virtual meshes).

    Must run before the first CPU client is created.  The axon
    sitecustomize pre-imports jax with JAX_PLATFORMS=axon, so the config
    update (not the env var) is the reliable switch.
    """
    if n_virtual_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count="
                f"{n_virtual_devices}").strip()
    jax.config.update("jax_platforms", "cpu")
