"""Device mesh construction.

The reference has no distributed support at all — backend choice is a
compile-time cargo feature on a single device (SURVEY §2 "Parallelism
strategies": every row is 'No'). Here the mesh is the runtime device model:
axes ("data", "model") — batch replicas over `data`, tensor-parallel shards
over `model` — with collectives riding ICI inside the compiled step.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(tp_size: int | None = None, dp_size: int | None = None,
              devices=None) -> Mesh:
    """(dp, tp) mesh over the available devices.

    Default: all devices go to tensor parallelism (the common single-host
    serving shape, e.g. v5e-8 -> (1, 8)); pass dp_size to carve replicas.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tp_size is None:
        tp_size = n // (dp_size or 1)
    if dp_size is None:
        dp_size = n // tp_size
    if dp_size * tp_size != n:
        raise ValueError(f"dp {dp_size} x tp {tp_size} != {n} devices")
    arr = np.asarray(devices).reshape(dp_size, tp_size)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), (DATA_AXIS, MODEL_AXIS))
