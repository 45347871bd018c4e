"""Polyphase filterbank channelizer tests."""

import numpy as np
import scipy.signal as ss
import jax.numpy as jnp
import pytest

from aero_tpu.channelizer.pfb import (pfb_init, pfb_channelize, pfb_prototype,
                                      pfb_bin_for_freq, PfbChannelizer)
from aero_tpu.channelizer import load_ini


def test_pfb_matches_direct_channelization():
    K, P = 64, 8
    M = K // 2
    rng = np.random.default_rng(0)
    T = 16384
    x = (rng.normal(size=T) + 1j * rng.normal(size=T)).astype(np.complex64)
    st = pfb_init(K, P)
    _, z = pfb_channelize(st, jnp.asarray(x), K, P)
    z = np.asarray(z)
    h = np.asarray(pfb_prototype(K, P), np.float64)
    for k in (0, 5, 31, 40, 63):
        mixed = x * np.exp(-2j * np.pi * k * np.arange(T) / K)
        direct = ss.lfilter(h, [1.0], mixed)[M - 1::M][: z.shape[1]]
        assert np.abs(z[k][: len(direct)] - direct).max() < 1e-3


def test_pfb_streaming_consistent():
    K = 64
    rng = np.random.default_rng(1)
    x = (rng.normal(size=8192) + 1j * rng.normal(size=8192)).astype(np.complex64)
    st = pfb_init(K)
    _, z_full = pfb_channelize(st, jnp.asarray(x), K)
    st = pfb_init(K)
    st, za = pfb_channelize(st, jnp.asarray(x[:4096]), K)
    st, zb = pfb_channelize(st, jnp.asarray(x[4096:]), K)
    z_split = np.concatenate([np.asarray(za), np.asarray(zb)], axis=1)
    np.testing.assert_array_equal(np.asarray(z_full), z_split)


def test_pfb_channelizer_end_to_end():
    from aero_tpu.models.msk import MskDemodulator
    from aero_tpu.protocol.framing import build_p_frames, PChannelFramer
    from aero_tpu.protocol.crc import append_crc16_bytes

    fs, center = 1536000, 1545000000
    rf = 1545110300
    ini = (f"sample_rate={fs}\ncenter_frequency={center}\n[vfos]\nsize=1\n"
           f"1\\frequency={rf}\n1\\data_rate=1200\n1\\topic=P1\n")
    cfg = load_ini(ini, is_text=True)
    rng = np.random.default_rng(3)
    fields = [b"".join(append_crc16_bytes(bytes([0x71] + list(rng.integers(0, 256, 9))))
                       for _ in range(6)) for _ in range(2)]
    bits = build_p_frames(fields, 1200, lead_frames=3)
    sps = fs / 1200.0
    e = np.empty_like(bits)
    prev = 0
    for k in range(len(bits)):
        cur = bits[k] ^ prev if k % 2 == 0 else bits[k] ^ prev ^ 1
        e[k] = cur
        prev = cur
    steps = np.repeat((1 - 2 * e.astype(np.float64)) * (np.pi / 2) / sps, int(sps))
    ph = np.concatenate([[0.0], np.cumsum(steps)])[:-1]
    off = (rf + 1000) - center
    s = 0.05 * np.exp(1j * (2 * np.pi * off / fs * np.arange(len(ph)) + ph))
    wb = np.zeros(len(s) + 3 * fs, np.complex64)
    wb[: len(s)] = s.astype(np.complex64)

    ch = PfbChannelizer(cfg)
    B = fs // 4
    audio = []
    for i in range(len(wb) // B):
        for topic, rate, payload in ch.process(wb[i * B:(i + 1) * B]):
            assert (topic, rate) == ("P1", 24000)
            audio.append(np.frombuffer(payload, "<i2").astype(np.float32) / 32768.0)
    a = np.concatenate(audio)
    dm = MskDemodulator(24000, 1200)
    outs = dm.process(np.concatenate([a, np.zeros(32000, np.float32)]))
    soft = np.concatenate([o["soft_bits"] for o in outs]).astype(np.float32)
    evs = PChannelFramer(1200).feed(soft)
    assert sum(f in [ev.infofield for ev in evs] for f in fields) == 2


def test_fused_matches_gather_formulation():
    """pfb_channelize_fused must be numerically equivalent to the
    reference gather formulation across streamed blocks."""
    import numpy as np
    from aero_tpu.channelizer.pfb import (pfb_channelize,
                                          pfb_channelize_fused, pfb_init)
    rng = np.random.default_rng(42)
    K = 64
    s1 = pfb_init(K)
    s2 = pfb_init(K)
    for _ in range(3):
        x = (rng.standard_normal(2048)
             + 1j * rng.standard_normal(2048)).astype(np.complex64)
        s1, z1 = pfb_channelize(s1, x, K)
        s2, z2 = pfb_channelize_fused(s2, x, K)
        np.testing.assert_allclose(np.asarray(z1), np.asarray(z2),
                                   atol=2e-5)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
