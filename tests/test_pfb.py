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


def test_pfb_adjacent_channel_rejection():
    """Guard for the widened WOLA prototype (0.75x bin spacing passband):
    two 1200 bps carriers in ADJACENT bins of the same rate group — each
    with a strong neighbor one bin spacing (12 kHz) away — must both
    decode through the FusedStation.  The per-demod
    matched filters provide the final selectivity the wider prototype
    gives up."""
    from aero_tpu.channelizer import load_ini
    from aero_tpu.runtime.fused_station import FusedStation
    from aero_tpu.models.msk import msk_modulate
    from aero_tpu.protocol.framing import build_p_frames
    from aero_tpu.protocol.crc import append_crc16_bytes
    from aero_tpu.protocol.isu import make_acars_userdata, segment_isu

    fs, center = 288000, 1545000000
    # adjacent PFB bins: bin spacing fs/K = 12 kHz at out_rate 24000 (K=24)
    ini = (f"sample_rate={fs}\ncenter_frequency={center}\n[vfos]\nsize=2\n"
           f"1\\frequency={center + 24000}\n1\\data_rate=1200\n"
           "1\\topic=A\n1\\gain=100\n"
           f"2\\frequency={center + 36000}\n2\\data_rate=1200\n"
           "2\\topic=B\n2\\gain=100\n")
    cfg = load_ini(ini, is_text=True)

    def p_bits(tag):
        ud = make_acars_userdata("2", "N" + tag, "!", "H1", "A",
                                 f"ADJACENT {tag}")
        sus = [append_crc16_bytes(b) for b in segment_isu(ud, 0x123456, 0x41)]
        fill = append_crc16_bytes(bytes([0x01] + [0] * 9))
        while len(sus) % 6:
            sus.append(fill)
        fields = [b"".join(sus[i:i + 6]) for i in range(0, len(sus), 6)]
        return build_p_frames(fields, 1200, lead_frames=3)

    rng = np.random.default_rng(13)
    dur = 7 * fs
    wb = np.zeros(dur, np.complex64)
    for tag, delta, amp in (("AA", 24000, 1.0), ("BB", 36000, 10.0)):
        audio = msk_modulate(p_bits(tag), 24000, 1200.0, freq=1000.0) * amp
        up = fs // 24000
        x = np.zeros(len(audio) * up, np.float32)
        x[::up] = audio * up
        from scipy.signal import firwin, lfilter
        bb = lfilter(firwin(511, 1.0 / up), 1.0, x).astype(np.complex64)
        t = np.arange(len(bb)) / fs
        mixed = (bb * np.exp(2j * np.pi * delta * t)).astype(np.complex64)
        wb[: len(mixed)] += mixed[: dur]
    wb += (rng.normal(0, 0.002, dur)
           + 1j * rng.normal(0, 0.002, dur)).astype(np.complex64)

    got = []
    st = FusedStation(cfg, ingest_dtype="int16", hunt=False,
                      on_acars=lambda v, item: got.append((v, item.message)))
    w = np.concatenate([wb, np.zeros(2 * st.block_len, np.complex64)])
    for i in range(0, (len(w) // st.block_len) * st.block_len, st.block_len):
        st.process(w[i:i + st.block_len])
    st.flush()

    assert ("A", "ADJACENT AA") in got, got
    assert ("B", "ADJACENT BB") in got, got
