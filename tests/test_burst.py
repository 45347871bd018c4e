"""Burst R/T channel tests: bit-level framing round trips and full
over-the-air burst modem chains."""

import numpy as np
import pytest

from aero_tpu.models.burst_msk import BurstMskDemodulator
from aero_tpu.models.burst_oqpsk import BurstOqpskDemodulator
from aero_tpu.models.msk import msk_modulate
from aero_tpu.models.oqpsk import oqpsk_modulate
from aero_tpu.protocol.rt_framing import (RTChannelFramer, build_r_burst,
                                          build_t_burst)
from aero_tpu.protocol.isu import make_acars_userdata, segment_isu


def _acars_sus():
    ud = make_acars_userdata("2", "N100TP", "!", "H1", "A",
                             "TEST VIA T CHANNEL")
    return segment_isu(ud, aesid=0x123456, gesid=0x41)


def _r_info(payload=b"HELLO BURST"):
    return (bytes([0x1B, 0x28, 0x0A, 0x0B, 0x0C, 0x77]) + payload).ljust(17, b"\0")[:17]


def _bits_to_stream(bits, invert_mask=None):
    soft = np.where(bits > 0, 255, 0).astype(np.int16)
    if invert_mask is not None:
        flip = invert_mask[np.arange(len(soft)) % 2]
        soft = np.where(flip, 255 - soft, soft)
    return np.concatenate([[-1], soft, np.full(40, -2, np.int16)]).astype(np.int16)


@pytest.mark.parametrize("oqpsk", [False, True])
def test_rt_bit_level_roundtrip(oqpsk):
    acars = []
    fr = RTChannelFramer(oqpsk=oqpsk, on_acars=acars.append)
    evs = fr.feed(_bits_to_stream(build_r_burst(_r_info(), oqpsk=oqpsk)))
    assert [e.kind for e in evs] == ["R"]
    fr2 = RTChannelFramer(oqpsk=oqpsk, on_acars=acars.append)
    evs2 = fr2.feed(_bits_to_stream(build_t_burst(0x123456, 0x41, _acars_sus(),
                                                  oqpsk=oqpsk)))
    assert [(e.kind, e.n_sus) for e in evs2] == [("T", 6)]
    assert any(a.message == "TEST VIA T CHANNEL" for a in acars)


@pytest.mark.parametrize("mask", [
    np.array([1, 1]),   # global inversion
    np.array([1, 0]),   # single-arm flip (90-degree carrier lock)
    np.array([0, 1]),
])
def test_rt_polarity_hypotheses(mask):
    acars = []
    fr = RTChannelFramer(oqpsk=True, on_acars=acars.append)
    bits = build_t_burst(0x123456, 0x41, _acars_sus(), oqpsk=True)
    evs = fr.feed(_bits_to_stream(bits, invert_mask=mask))
    assert [(e.kind, e.n_sus) for e in evs] == [("T", 6)]
    assert acars[0].message == "TEST VIA T CHANNEL"


def test_burst_msk_over_the_air():
    fs, fb = 12000.0, 600.0
    rng = np.random.default_rng(2)
    b1 = build_r_burst(_r_info(), preamble_bits=96)
    b2 = build_t_burst(0x123456, 0x41, _acars_sus(), preamble_bits=96)
    sig = np.concatenate([
        np.zeros(30000, np.float32),
        msk_modulate(b1, fs, fb, freq=2600.0, amplitude=0.3),
        np.zeros(47000, np.float32),
        msk_modulate(b2, fs, fb, freq=3777.0, amplitude=0.3),
        np.zeros(60000, np.float32)])
    p = np.mean(msk_modulate(b1, fs, fb)**2)
    sig += rng.normal(0, np.sqrt(p / 10), len(sig)).astype(np.float32)  # 10 dB
    dm = BurstMskDemodulator(fs, fb)
    acars = []
    fr = RTChannelFramer(on_acars=acars.append)
    evs = []
    for i in range(0, (len(sig) // 16000) * 16000, 16000):
        for o in dm.process(sig[i:i + 16000]):
            if o["burst"]:
                evs.extend(fr.feed(o["soft_bits"]))
    assert ("R", 0) in [(e.kind, e.n_sus) for e in evs]
    assert ("T", 6) in [(e.kind, e.n_sus) for e in evs]
    assert any(a.message == "TEST VIA T CHANNEL" for a in acars)


def test_burst_oqpsk_over_the_air():
    fs, fb = 48000.0, 10500.0
    rng = np.random.default_rng(3)
    b = build_t_burst(0x123456, 0x41, _acars_sus(), oqpsk=True,
                      preamble_bits=128)
    sig = np.concatenate([
        np.zeros(40000, np.float32),
        oqpsk_modulate(b, fs, fb, freq=7400.0, amplitude=0.3),
        np.zeros(80000, np.float32)])
    sig += rng.normal(0, 0.02, len(sig)).astype(np.float32)
    dm = BurstOqpskDemodulator(fs, fb)
    acars = []
    fr = RTChannelFramer(oqpsk=True, on_acars=acars.append)
    evs = []
    for i in range(0, (len(sig) // 16000) * 16000, 16000):
        for o in dm.process(sig[i:i + 16000]):
            if o["burst"]:
                evs.extend(fr.feed(o["soft_bits"]))
    assert [(e.kind, e.n_sus) for e in evs] == [("T", 6)]
    assert acars[0].message == "TEST VIA T CHANNEL"


def test_no_bursts_in_noise():
    rng = np.random.default_rng(4)
    dm = BurstMskDemodulator(12000, 600)
    got = []
    for i in range(6):
        for o in dm.process(rng.normal(0, 0.1, 16000).astype(np.float32)):
            got.append(bool(o["burst"]))
    assert not any(got)
