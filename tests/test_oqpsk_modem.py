"""End-to-end OQPSK 10500 modem round-trip tests."""

import numpy as np
import pytest

from aero_tpu.models.oqpsk import OqpskDemodulator, oqpsk_modulate
from aero_tpu.protocol.framing import build_p_frames, PChannelFramer, FRAME_SPECS
from aero_tpu.protocol.crc import append_crc16_bytes


def _roundtrip(cfo, snr_db, seed=7, nfields=3):
    rng = np.random.default_rng(seed)
    nsu = FRAME_SPECS[10500].payload_info_bits // 96
    fields = [b"".join(append_crc16_bytes(bytes([0x71] + list(rng.integers(0, 256, 9))))
                       for _ in range(nsu)) for _ in range(nfields)]
    bits = build_p_frames(fields, 10500, lead_frames=4)
    sig = oqpsk_modulate(bits, 48000, 10500, freq=8000.0 + cfo)
    p = np.mean(sig ** 2)
    noisy = (sig + rng.normal(0, np.sqrt(p / 10 ** (snr_db / 10)), len(sig))).astype(np.float32)
    dm = OqpskDemodulator(48000, 10500)
    outs = dm.process(np.concatenate([noisy, np.zeros(48000, np.float32)]))
    soft = np.concatenate([o["soft_bits"] for o in outs]).astype(np.float32)
    fr = PChannelFramer(10500)
    evs = fr.feed(soft)
    got = [e.infofield for e in evs]
    return sum(f in got for f in fields), nfields


@pytest.mark.parametrize("cfo,snr", [
    (0.0, 40.0),
    (100.0, 40.0),     # exercises single-arm-flip carrier locks
    (-250.0, 12.0),
    (300.0, 8.0),
])
def test_oqpsk_roundtrip(cfo, snr):
    rec, total = _roundtrip(cfo, snr)
    assert rec == total, f"recovered {rec}/{total}"


def test_oqpsk_noise_only():
    rng = np.random.default_rng(0)
    dm = OqpskDemodulator(48000, 10500)
    outs = dm.process(rng.normal(0, 0.1, 64000).astype(np.float32))
    assert not bool(outs[-1]["signal"])
