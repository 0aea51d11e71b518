"""Multi-host pod-slice initialization and serving topology.

The reference is single-process (SURVEY §2: no distributed support of any
kind). The multi-host model here:

- every host calls `init_distributed()` (jax.distributed handshake over DCN),
  then builds the same global (data, model) mesh over all pod-slice chips;
- tensor-parallel shards ride ICI *within* the compiled step (psum /
  all_gather inserted by rama_tpu.parallel.tp);
- serving is **host-0 fronted**: host 0 runs the HTTP server, tokenization,
  and the scheduling decisions; every other host runs `Engine.follow()`,
  replaying the identical sequence of jitted calls. Host-side inputs
  (tokens, positions, sampling params, PRNG keys, page tables) are
  broadcast from host 0 before each dispatch (`broadcast_step`), so all
  processes issue the same computation on the same global values — the
  multi-host jit contract. Device-side state (params, KV cache) never
  crosses DCN outside the compiled collectives;
- host failure == job failure (documented semantics; elastic recovery is a
  restart from checkpoint, which for inference means re-loading weights).

On a single host every helper here degrades to a no-op/identity, so the
engine runs the same code path (covered by dryrun_multichip) without a
distributed runtime.
"""

from __future__ import annotations

import os

import numpy as np


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed when running on a multi-host slice.

    With no arguments, relies on TPU environment auto-detection (the
    standard GKE/TPU-VM path). Returns True when distributed mode is
    active, False for single-process runs.
    """
    import jax

    explicit = coordinator_address is not None
    env_hosts = int(os.environ.get("RAMA_NUM_HOSTS", "1"))
    if not explicit and env_hosts <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the host that should run tokenization + the HTTP frontend."""
    import jax

    return jax.process_index() == 0


def broadcast_step(arrays: list[np.ndarray]) -> list[np.ndarray]:
    """Broadcast a list of host arrays from host 0 to every process.

    Every process must call this with arrays of the SAME shapes/dtypes
    (values on non-primary hosts are ignored). Identity in single-process
    mode, so the engine's primary path is identical with and without a
    distributed runtime.
    """
    import jax

    if jax.process_count() == 1:
        return arrays
    from jax.experimental import multihost_utils

    out = multihost_utils.broadcast_one_to_all(tuple(arrays))
    return [np.asarray(a) for a in out]


def make_global(x, mesh, spec):
    """Build a globally-sharded jax.Array from an identical host value.

    Single-process: plain device_put. Multi-process: assemble from each
    host's addressable shards (every host must pass the same full `x`).
    """
    import jax
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])
