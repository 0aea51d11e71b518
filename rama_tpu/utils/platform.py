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


def cpu_devices(n: int) -> None:
    """Request n virtual CPU devices (call before any backend init)."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}"
        ).strip()
