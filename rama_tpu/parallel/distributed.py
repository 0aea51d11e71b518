"""Multi-host pod-slice initialization and serving topology.

The reference is single-process (SURVEY §2: no distributed support of any
kind). The multi-host model here:

- every host calls `init_distributed()` (jax.distributed handshake over DCN),
  then builds the same global (data, model) mesh over all pod-slice chips;
- tensor-parallel shards ride ICI *within* the compiled step (psum /
  all_gather inserted by rama_tpu.parallel.tp);
- serving is host-0 fronted: host 0 runs the HTTP server and tokenization,
  and every host executes the same jitted decode tick over the global mesh —
  multi-host jit keeps per-host programs in lockstep as long as every host
  sees the same shapes each step (the engine's fixed-slot batching
  guarantees exactly that);
- host failure == job failure (documented semantics; elastic recovery is a
  restart from checkpoint, which for inference means re-loading weights).

On a single host this module is a no-op and everything runs locally.
"""

from __future__ import annotations

import os


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
