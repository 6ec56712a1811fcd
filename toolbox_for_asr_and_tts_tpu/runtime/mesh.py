"""Device/mesh bootstrap for serving.

The reference toolbox serves concurrent streams/jobs with Python thread pools
on a single CUDA GPU (reference: tts-service/app/services/tts_service.py:47,
voice-service/app/services/voice_interface.py:644). The TPU-native equivalent
is a 1-axis `jax.sharding.Mesh` over all local chips with **batch/data
parallelism over ICI**: concurrent streams are batched onto the leading axis
and sharded across devices by `jax.jit` + `NamedSharding`. No peer-to-peer
collectives are required for inference parity; XLA inserts any needed
all-gathers automatically.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "data"


def local_device_count() -> int:
    return jax.local_device_count()


@functools.lru_cache(maxsize=None)
def serving_mesh(n_devices: Optional[int] = None, axis: str = BATCH_AXIS) -> Mesh:
    """A 1-D mesh over (up to) all local devices.

    Serving is data-parallel: the leading batch axis of every model input is
    sharded over this mesh. A single-chip host gets a trivial 1-device mesh,
    so all serving code is mesh-agnostic.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=(axis,))


def batch_sharding(mesh: Mesh, axis: str = BATCH_AXIS) -> NamedSharding:
    """Sharding that splits the leading (batch/stream) axis over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = BATCH_AXIS):
    """Place a pytree of host arrays with the leading axis sharded over `mesh`.

    The leading dim must be divisible by mesh size — callers go through
    `runtime.bucketing.Bucketer.pad_batch` first so this is always true.
    """
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
