"""Device mesh construction for multi-chip / multi-host rendering.

The reference is single-process with no distribution anywhere (SURVEY.md
§2.4); this module is its TPU-native replacement: ``jax.sharding.Mesh``
over the pod slice, with the convention that the ``data`` axis shards rays/
pixels/samples (DP) and the optional ``prim`` axis shards scene primitives
(the TP analog, for scenes larger than one chip's HBM — BASELINE config 5).

Multi-host bring-up uses ``jax.distributed.initialize()`` (call
``init_distributed`` once per process before building meshes); on a single
host the same code runs over local devices, and tests fake 8 devices with
``--xla_force_host_platform_device_count=8``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up; no-op when JAX is already initialized or
    single-process args are absent."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_render_mesh(data: Optional[int] = None, prim: int = 1,
                     devices: Optional[Sequence] = None) -> Mesh:
    """Mesh with a ``data`` (rays/samples) axis and a ``prim`` axis.

    Defaults to all devices on ``data``.  On multi-host slices, callers
    should put hosts on the outer (``data``) axis so the heavy primitive
    min-reduction collectives of config 5 ride ICI within a host's chips.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % prim != 0:
            raise ValueError(f"{n} devices not divisible by prim={prim}")
        data = n // prim
    if data * prim > n:
        raise ValueError(f"mesh {data}x{prim} exceeds {n} devices")
    dev_array = np.asarray(devices[:data * prim]).reshape(data, prim)
    return Mesh(dev_array, ("data", "prim"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh) -> NamedSharding:
    """Image rows over the data axis."""
    return NamedSharding(mesh, P("data"))
