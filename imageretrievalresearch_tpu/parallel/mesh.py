"""Device mesh + sharding helpers (the DDP replacement).

One ``Mesh`` over the ICI with a ``data`` axis; train batches are sharded on
their leading dim, model/optimizer state is replicated. XLA derives the
gradient all-reduce from the sharded loss mean — no NCCL-style hand-written
collectives (cf. SURVEY.md §2 "Distributed communication backend").
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None,
              axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, ndim: int = 1,
                  axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim, replicate the rest."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = "data") -> Any:
    """Device-put a host batch pytree with leading-dim sharding.

    Multi-process (``jax.distributed``): each process passes only its LOCAL
    slice of the global batch (see TripletLoader process sharding); the
    global array is assembled across processes without any data exchange.
    """

    def put(x):
        x = np.asarray(x)
        sharding = data_sharding(mesh, x.ndim, axis_name)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def put_replicated(mesh: Mesh, tree: Any) -> Any:
    """Replicate a host pytree onto the mesh (multi-process safe: every
    process must hold identical values, e.g. a same-seed init)."""
    sharding = replicate(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.device_put(tree, sharding)


def put_row_sharded(arr: np.ndarray, mesh: Mesh,
                    axis_name: str = "data") -> jax.Array:
    """Place a host array onto the mesh sharded on its leading dim WITHOUT
    ever materializing the full array on any single device.

    Each device receives exactly its own row slice via a per-device
    ``device_put`` and the global array is assembled with
    ``make_array_from_single_device_arrays`` — the point of sharded compact
    galleries is holding ``G/n_dev`` rows per chip, which a
    full-array-then-reshard path would defeat (it would OOM exactly when
    the mesh path is needed).
    """
    arr = np.asarray(arr)
    sharding = data_sharding(mesh, arr.ndim, axis_name)
    bufs = [jax.device_put(arr[idx], d)
            for d, idx in
            sharding.addressable_devices_indices_map(arr.shape).items()]
    return jax.make_array_from_single_device_arrays(arr.shape, sharding,
                                                    bufs)


def pad_to_multiple(batch: Any, multiple: int) -> tuple[Any, int]:
    """Pad leading dims so every array divides the mesh (returns real size)."""
    sizes = {np.asarray(x).shape[0] for x in jax.tree.leaves(batch)}
    assert len(sizes) == 1, "ragged batch"
    n = sizes.pop()
    pad = (-n) % multiple
    if pad == 0:
        return batch, n

    def pad_fn(x):
        x = np.asarray(x)
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, widths, mode="edge")

    return jax.tree.map(pad_fn, batch), n
