"""Mesh sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import scipy.signal as ss
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aero_tpu.ops.design import HALFBAND_TAPS


def test_time_sharded_filter_bit_exact():
    from aero_tpu.parallel.time_shard import halo_filter_time_sharded
    mesh = Mesh(np.array(jax.devices()), ("time",))
    taps = HALFBAND_TAPS[23].astype(np.float32)
    rng = np.random.default_rng(0)
    x = (rng.normal(size=16384) + 1j * rng.normal(size=16384)).astype(np.complex64)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("time")))
    y = np.asarray(halo_filter_time_sharded(mesh, taps)(xs))
    ref = ss.lfilter(taps, [1], x)
    np.testing.assert_allclose(y, ref, atol=1e-5)


def test_time_sharded_decimator_bit_exact():
    from aero_tpu.parallel.time_shard import halo_decimate_time_sharded
    mesh = Mesh(np.array(jax.devices()), ("time",))
    taps = HALFBAND_TAPS[11].astype(np.float32)
    rng = np.random.default_rng(1)
    x = (rng.normal(size=16384) + 1j * rng.normal(size=16384)).astype(np.complex64)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("time")))
    y = np.asarray(halo_decimate_time_sharded(mesh, taps, 2)(xs))
    ref = ss.lfilter(taps, [1], x)[::2]
    np.testing.assert_allclose(y, ref, atol=1e-5)


def test_msk_vfo_bank_sharded_consistent():
    from aero_tpu.parallel.vfo_bank import MskVfoBank
    from aero_tpu.models.msk import msk_modulate
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, 4000).astype(np.uint8)
    sig = msk_modulate(bits, 24000, 1200, freq=1000.0)[:16000]
    bank = MskVfoBank(8, 24000.0, 1200.0)
    out = bank.process_block(np.tile(sig, (8, 1)))
    soft = np.asarray(out["soft_bits"])
    assert soft.shape == (8, 800)
    for r in range(1, 8):
        np.testing.assert_array_equal(soft[0], soft[r])


def test_oqpsk_vfo_bank_runs():
    from aero_tpu.parallel.vfo_bank import OqpskVfoBank
    bank = OqpskVfoBank(4, 48000.0, 10500.0)
    out = bank.process_block(np.zeros((4, 16000), np.float32))
    assert np.asarray(out["soft_bits"]).shape == (4, 3500)


def test_graft_dryrun():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_pfb_time_sharded_bit_identical():
    """The WOLA channelizer time-sharded over 8 devices (halo = filter
    history via ppermute) matches the unsharded pass bit-for-bit, across
    consecutive blocks with a carried stream state."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from aero_tpu.channelizer.pfb import pfb_channelize, pfb_init
    from aero_tpu.parallel.time_shard import pfb_channelize_time_sharded

    K = 32
    M = K // 2
    n_dev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), ("time",))
    rng = np.random.default_rng(0)
    T = n_dev * M * 40
    fn = pfb_channelize_time_sharded(mesh, K)

    state = pfb_init(K)
    for _ in range(3):
        x = jnp.asarray((rng.standard_normal(T)
                         + 1j * rng.standard_normal(T)
                         ).astype(np.complex64))
        ref_state, z_ref = pfb_channelize(state, x, K)
        z_sh = fn(state, x)
        np.testing.assert_array_equal(np.asarray(z_sh), np.asarray(z_ref))
        state = ref_state         # == x[-(L-M):], the stream carry
