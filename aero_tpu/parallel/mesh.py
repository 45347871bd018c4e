"""Mesh construction and sharding helpers."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "vfo") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_over_vfo(mesh: Mesh, tree, axis: str = "vfo"):
    """Place every leaf of a pytree with its LEADING axis sharded over the
    mesh's vfo axis (scalars/0-d leaves replicated)."""
    def put(leaf):
        leaf = jax.numpy.asarray(leaf)
        if leaf.ndim == 0:
            sh = NamedSharding(mesh, P())
        else:
            sh = NamedSharding(mesh, P(axis, *([None] * (leaf.ndim - 1))))
        return jax.device_put(leaf, sh)
    return jax.tree.map(put, tree)
