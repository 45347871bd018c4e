"""Multi-host deployment helpers and topology recipes.

The scaling story (BASELINE.md: "near-linear 1 -> N hosts") has two shapes:

1. **Station-per-host (recommended, embarrassingly parallel).** Each host
   owns one or more wideband streams (its SDRs, or ZMQ/DCN feeds speaking
   the reference wire format) and runs a full Station on its local chips.
   There is no cross-host communication in the hot path at all, so scaling
   is exactly linear; only decoded ACARS (bytes/s) leaves the host.

2. **One giant stream, time-sharded.** A single very wide capture is
   scattered over a global ("host", "time") mesh; the channelizer's causal
   filters exchange ntaps-1 halo samples per block via ppermute
   (parallel/time_shard.py) — ICI within a host, DCN across hosts.  Use
   only when one stream exceeds a host's ingest (not the case for any
   SDR the reference supports).

This module provides the jax.distributed plumbing for shape 2 and for
multi-host VFO banks.  It cannot be exercised in a single-host CI
environment; the per-host mesh path is covered by the virtual-device tests.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def init_distributed(coordinator: str, num_processes: int, process_id: int):
    """Initialize jax.distributed (call once, before device use).

    coordinator: "host0:port" reachable from every process.
    """
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def make_global_mesh(vfo_per_host: bool = True) -> Mesh:
    """Global mesh over all processes' devices.

    vfo_per_host=True -> ("host", "vfo"): VFO banks sharded within each
    host, hosts independent (shape 1 with a shared jit program).
    Otherwise ("time",): one stream time-sharded across everything.
    """
    devs = np.array(jax.devices())
    n_hosts = jax.process_count()
    if vfo_per_host and n_hosts > 1:
        per = len(devs) // n_hosts
        return Mesh(devs.reshape(n_hosts, per), ("host", "vfo"))
    return Mesh(devs, ("time",))


def host_local_slice(n_total_vfos: int) -> slice:
    """Which VFO indices this process owns under station-per-host."""
    n = jax.process_count()
    per = -(-n_total_vfos // n)
    i = jax.process_index()
    return slice(i * per, min((i + 1) * per, n_total_vfos))


def scatter_time_shards(mesh: Mesh, local_block: np.ndarray,
                        axis: str = "time"):
    """Assemble each host's locally-ingested contiguous sample block into
    ONE globally time-sharded array (shape 2's ingest step).

    Each process pulls its own slice of the wideband stream off its DCN
    feed (ZMQ speaking the reference wire format, io/zmq_transport.py) —
    no host ever materializes the full stream.  The returned jax.Array is
    addressable-shard-only on every process and can be fed straight into
    the time-sharded kernels (parallel/time_shard.py).
    """
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P
    return multihost_utils.host_local_array_to_global_array(
        local_block, mesh, P(axis))


def gather_to_hosts(x) -> np.ndarray:
    """Replicate a (possibly sharded) global array onto every process as
    numpy — the egress step for small results (soft bits, sync scores).
    Large streams should stay sharded; only decoded frames leave devices.
    """
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
