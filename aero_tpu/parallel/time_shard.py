"""Time-sharded wideband filtering with halo exchange.

The sequence-parallel axis of this framework: one wideband block is split
over a ``time`` mesh axis; each device filters its shard and the causal
filter history (ntaps-1 samples) crosses shard boundaries as a halo sent by
``ppermute`` over ICI (SURVEY.md §2.6 / §7: "overlap-save filter boundary
samples exchanged via collectives").

Composable with the ``vfo`` axis: a (time, vfo) mesh runs hundreds of VFO
chains over a time-sharded wideband stream.
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def halo_filter_time_sharded(mesh: Mesh, taps, axis: str = "time"):
    """Build a jitted time-sharded causal FIR: x [T] -> y [T].

    Each shard receives its left neighbor's last ntaps-1 samples via
    ppermute, so the result is bit-identical to the unsharded filter
    (first shard sees zeros, i.e. zero initial state).
    """
    taps = jnp.asarray(taps, jnp.float32)
    k = taps.shape[0]

    def local(x_shard):
        n = lax.axis_index(axis)
        size = lax.axis_size(axis)
        tail = x_shard[-(k - 1):]
        # send my tail to my right neighbor (shard i -> i+1)
        perm = [(i, i + 1) for i in range(size - 1)]
        halo = lax.ppermute(tail, axis, perm)
        halo = jnp.where(n == 0, jnp.zeros_like(halo), halo)
        xp = jnp.concatenate([halo, x_shard])
        if jnp.iscomplexobj(xp):
            tr = jnp.convolve(xp.real, taps[::-1], mode="valid")
            ti = jnp.convolve(xp.imag, taps[::-1], mode="valid")
            return (tr + 1j * ti).astype(jnp.complex64)
        return jnp.convolve(xp, taps[::-1], mode="valid")

    fn = jax.shard_map(local, mesh=mesh, in_specs=P(axis),
                       out_specs=P(axis), check_vma=False)
    return jax.jit(fn)


def halo_decimate_time_sharded(mesh: Mesh, taps, factor: int,
                               axis: str = "time"):
    """Time-sharded causal FIR + keep-every-``factor``-th sample.

    Shard length must be a multiple of ``factor``; output shards stay on
    their devices (global result = concatenation).
    """
    taps = jnp.asarray(taps, jnp.float32)
    k = taps.shape[0]

    def local(x_shard):
        n = lax.axis_index(axis)
        size = lax.axis_size(axis)
        tail = x_shard[-(k - 1):]
        perm = [(i, i + 1) for i in range(size - 1)]
        halo = lax.ppermute(tail, axis, perm)
        halo = jnp.where(n == 0, jnp.zeros_like(halo), halo)
        xp = jnp.concatenate([halo, x_shard])

        def conv(z):
            zb = z.reshape(1, 1, -1)
            hb = taps[::-1].reshape(1, 1, -1).astype(z.dtype)
            y = lax.conv_general_dilated(
                zb, hb, window_strides=(factor,), padding="VALID",
                dimension_numbers=("NCH", "IOH", "NCH"))
            return y.reshape(-1)

        if jnp.iscomplexobj(xp):
            return (conv(xp.real) + 1j * conv(xp.imag)).astype(jnp.complex64)
        return conv(xp)

    fn = jax.shard_map(local, mesh=mesh, in_specs=P(axis),
                       out_specs=P(axis), check_vma=False)
    return jax.jit(fn)


def pfb_channelize_time_sharded(mesh: Mesh, K: int, taps_per_branch: int = 8,
                                axis: str = "time"):
    """Time-sharded WOLA polyphase channelizer: the wideband stream is
    split over the ``axis`` mesh axis and every device computes its own
    hops after receiving the L-M = (P-1/2)*K-sample filter history from
    its left neighbor by ``ppermute`` (channelizer/pfb.py semantics,
    SURVEY.md §2.5 stage sharding).

    Returns a jitted fn ``(state, x) -> z``:
      state [L-M] complex — the stream carry (consumed by shard 0; for
      the next block pass ``x[-(L-M):]`` of the current global block);
      x [T] complex sharded over ``axis`` (shard length % (K//2) == 0);
      z [K, T//(K//2)] with the hop axis sharded over ``axis``.

    Bit-identical to the unsharded ``pfb_channelize`` on the same block:
    every hop sees exactly the same L input samples.
    """
    from aero_tpu.channelizer.pfb import pfb_channelize

    M = K // 2
    L = taps_per_branch * K
    hist = L - M

    def local(state, x_shard):
        n = lax.axis_index(axis)
        size = lax.axis_size(axis)
        assert x_shard.shape[-1] >= hist, (
            f"time shard ({x_shard.shape[-1]}) shorter than the PFB "
            f"history ({hist}): the halo would need to span multiple "
            f"neighbors — use longer blocks or fewer time shards")
        tail = x_shard[-hist:]
        perm = [(i, i + 1) for i in range(size - 1)]
        halo = lax.ppermute(tail, axis, perm)
        halo = jnp.where(n == 0, state, halo)
        _, z = pfb_channelize(halo, x_shard, K,
                              taps_per_branch=taps_per_branch)
        return z

    fn = jax.shard_map(local, mesh=mesh, in_specs=(P(), P(axis)),
                       out_specs=P(None, axis), check_vma=False)
    return jax.jit(fn)
