"""P-channel framing round-trip tests at the soft-bit level (no modem)."""

import numpy as np
import pytest

from aero_tpu.protocol.framing import (build_p_frames, PChannelFramer,
                                       FRAME_SPECS, UW_BITS)
from aero_tpu.protocol.crc import append_crc16_bytes


def _fields(rate, n, rng):
    nsu = FRAME_SPECS[rate].payload_info_bits // 96
    return [b"".join(append_crc16_bytes(bytes([0x71] + list(rng.integers(0, 256, 9))))
                     for _ in range(nsu)) for _ in range(n)]


@pytest.mark.parametrize("rate", [600, 1200, 10500])
def test_framing_roundtrip(rate):
    rng = np.random.default_rng(0)
    fields = _fields(rate, 3, rng)
    bits = build_p_frames(fields, rate)
    soft = bits.astype(np.float32) * 255.0
    fr = PChannelFramer(rate)
    evs = []
    for i in range(0, len(soft), 777):
        evs.extend(fr.feed(soft[i:i + 777]))
    got = [e.infofield for e in evs]
    assert all(f in got for f in fields)
    assert all(all(e.su_crc_ok) for e in evs)


@pytest.mark.parametrize("rate", [1200, 10500])
def test_framing_inverted_stream(rate):
    """Polarity-inverted soft stream must still decode (phase invariance)."""
    rng = np.random.default_rng(1)
    fields = _fields(rate, 2, rng)
    bits = build_p_frames(fields, rate)
    soft = (1 - bits).astype(np.float32) * 255.0
    fr = PChannelFramer(rate)
    evs = fr.feed(soft)
    got = [e.infofield for e in evs]
    assert all(f in got for f in fields)


def test_framing_noise_only_no_frames():
    rng = np.random.default_rng(2)
    soft = rng.integers(0, 256, size=30000).astype(np.float32)
    fr = PChannelFramer(1200, uw_tolerance=0)
    evs = fr.feed(soft)
    # UW is 32 bits; random 30k bits may rarely alias, but frames must not
    # produce valid CRCs
    assert all(not any(e.su_crc_ok) for e in evs)


def test_framing_relock_after_gap(  ):
    rng = np.random.default_rng(3)
    fields = _fields(1200, 2, rng)
    bits = build_p_frames(fields, 1200)
    soft = bits.astype(np.float32) * 255.0
    gap = np.full(5000, 128.0, dtype=np.float32)
    fr = PChannelFramer(1200)
    evs = fr.feed(np.concatenate([soft, gap, soft]))
    got = [e.infofield for e in evs]
    assert sum(f in got for f in fields) == len(fields)
