"""Mesh + sharding helpers for data-parallel eval and multi-chip dry runs."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D ``data`` mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("data",))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 over ``data``, replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(arr: np.ndarray, multiple: int):
    """Pad axis 0 to a multiple (repeat-last padding); returns (padded, n)."""
    n = arr.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad = np.repeat(arr[-1:], rem, axis=0)
    return np.concatenate([arr, pad], axis=0), n


def shard_batch(mesh: Mesh, tree):
    """device_put a pytree of host arrays with batch-axis sharding."""
    return jax.tree.map(
        lambda a: jax.device_put(a, batch_sharding(mesh, np.ndim(a))), tree
    )
