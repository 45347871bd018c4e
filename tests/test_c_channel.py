"""C-channel (8400 bps) tests: bit-level framing and full modem chain."""

import numpy as np
import pytest

from aero_tpu.models.oqpsk import OqpskDemodulator, oqpsk_modulate
from aero_tpu.protocol.c_framing import CChannelFramer, build_c_frames
from aero_tpu.protocol.crc import append_crc16_bytes


def _frames(rng, n=3):
    out = []
    for _ in range(n):
        sus = [append_crc16_bytes(bytes([0x30]) +
                                  bytes(rng.integers(0, 256, 9, dtype=np.uint8).tolist()))
               for _ in range(3)]
        voice = bytes(rng.integers(0, 256, 300, dtype=np.uint8).tolist())
        out.append((sus, voice))
    return out


def test_c_framing_bit_level():
    rng = np.random.default_rng(0)
    frames = _frames(rng)
    bits = build_c_frames(frames)
    fr = CChannelFramer()
    evs = fr.feed(bits.astype(np.float32) * 255)
    assert sum(any(e.voice == f[1] for e in evs) for f in frames) == 3
    assert sum(any([s for s, _, _ in e.signalling] == f[0] for e in evs)
               for f in frames) == 3


def test_c_framing_single_arm_inverted():
    rng = np.random.default_rng(1)
    frames = _frames(rng, 2)
    soft = build_c_frames(frames).astype(np.float32) * 255
    soft[0::2] = 255 - soft[0::2]
    evs = CChannelFramer().feed(soft)
    assert sum(any(e.voice == f[1] for e in evs) for f in frames) == 2


@pytest.mark.parametrize("cfo,snr", [(0.0, 40.0), (-300.0, 12.0)])
def test_c_channel_modem_roundtrip(cfo, snr):
    rng = np.random.default_rng(2)
    frames = _frames(rng)
    bits = build_c_frames(frames, lead_frames=3)
    sig = oqpsk_modulate(bits, 48000, 8400, freq=8000.0 + cfo)
    p = np.mean(sig ** 2)
    noisy = (sig + rng.normal(0, np.sqrt(p / 10 ** (snr / 10)), len(sig))).astype(np.float32)
    dm = OqpskDemodulator(48000, 8400)
    outs = dm.process(np.concatenate([noisy, np.zeros(48000, np.float32)]))
    soft = np.concatenate([o["soft_bits"] for o in outs]).astype(np.float32)
    evs = CChannelFramer().feed(soft)
    assert sum(any(e.voice == f[1] for e in evs) for f in frames) == 3
    assert sum(any([s for s, _, _ in e.signalling] == f[0] for e in evs)
               for f in frames) == 3


def test_c_channel_adjacent_interferer():
    """The 2048-tap RRC prefilter must reject a 3x-stronger adjacent
    channel at +12.5 kHz (ref: oqpskdemodulator.cpp:239-249)."""
    rng = np.random.default_rng(0)
    frames = _frames(rng, 2)
    bits = build_c_frames(frames, lead_frames=3)
    sig = oqpsk_modulate(bits, 48000, 8400, freq=8000.0)
    ib = rng.integers(0, 2, len(bits)).astype(np.uint8)
    intf = oqpsk_modulate(ib, 48000, 8400, freq=20500.0, amplitude=0.75)
    n = min(len(sig), len(intf))
    mix = (sig[:n] + intf[:n] + rng.normal(0, 0.01, n)).astype(np.float32)
    dm = OqpskDemodulator(48000, 8400)
    outs = dm.process(np.concatenate([mix, np.zeros(48000, np.float32)]))
    soft = np.concatenate([o["soft_bits"] for o in outs]).astype(np.float32)
    evs = CChannelFramer().feed(soft)
    assert sum(any(e.voice == f[1] for e in evs) for f in frames) == 2
