"""Backend selection helpers.

The hosting environment may pre-import jax with a TPU plugin pinned via
`jax.config` (which outranks the JAX_PLATFORMS env var). `force_platform`
re-pins through the config API, which works as long as no backend has been
initialized in this process.
"""

from __future__ import annotations

import os


def force_platform(platform: str | None) -> None:
    """platform: "cpu", "tpu", or None/"auto" to leave the default."""
    if not platform or platform == "auto":
        return
    import jax

    jax.config.update("jax_platforms", {"tpu": "axon,tpu,cpu"}.get(platform, platform))


def enable_compile_cache(path: str) -> None:
    """Point JAX's persistent compilation cache at `path` so every XLA
    program (prefill buckets, decode ticks, Pallas kernels) compiles once
    per machine instead of once per process — Engine.warmup() then reloads
    from disk in milliseconds on every later server start."""
    import jax

    jax.config.update("jax_compilation_cache_dir", str(path))
    for knob, val in (("jax_persistent_cache_min_compile_time_secs", 0.2),
                      ("jax_persistent_cache_min_entry_size_bytes", 0)):
        try:
            jax.config.update(knob, val)
        except Exception:  # noqa: BLE001 — knob names vary across jax versions
            pass


def cpu_devices(n: int) -> None:
    """Request n virtual CPU devices (call before any backend init)."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}"
        ).strip()
