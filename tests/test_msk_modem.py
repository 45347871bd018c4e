"""End-to-end MSK modem round-trip tests: P-channel frames -> audio ->
feedforward demodulator -> deframer -> recovered infofields."""

import numpy as np
import pytest

from aero_tpu.models.msk import MskDemodulator, msk_modulate, make_config, msk_init, msk_step
from aero_tpu.protocol.framing import build_p_frames, PChannelFramer
from aero_tpu.protocol.crc import append_crc16_bytes


def _roundtrip(fs, fb, cfo, snr_db, seed=7, nfields=4):
    rng = np.random.default_rng(seed)
    fields = [b"".join(append_crc16_bytes(bytes([0x71] + list(rng.integers(0, 256, 9))))
                       for _ in range(6)) for _ in range(nfields)]
    bits = build_p_frames(fields, int(fb), lead_frames=4)
    sig = msk_modulate(bits, fs, fb, freq=1000.0 + cfo)
    p = np.mean(sig ** 2)
    noisy = (sig + rng.normal(0, np.sqrt(p / 10 ** (snr_db / 10)), len(sig))).astype(np.float32)
    dm = MskDemodulator(fs, fb)
    outs = dm.process(np.concatenate([noisy, np.zeros(32000, np.float32)]))
    soft = np.concatenate([o["soft_bits"] for o in outs]).astype(np.float32)
    fr = PChannelFramer(int(fb))
    evs = fr.feed(soft)
    got = [e.infofield for e in evs]
    return sum(f in got for f in fields), nfields, outs


@pytest.mark.parametrize("fs,fb,cfo,snr", [
    (24000, 1200, 0.0, 40.0),
    (24000, 1200, 77.0, 6.0),
    (12000, 600, -50.0, 40.0),
    (12000, 600, 150.0, 3.0),
    (48000, 1200, 300.0, 12.0),
    (48000, 600, -300.0, 40.0),
])
def test_msk_roundtrip(fs, fb, cfo, snr):
    rec, total, outs = _roundtrip(fs, fb, cfo, snr)
    assert rec == total, f"recovered {rec}/{total}"
    # demod must report lock by the end
    assert float(outs[-4]["mse"]) < 0.5


def test_msk_no_signal_reports_unlocked():
    rng = np.random.default_rng(0)
    noise = rng.normal(0, 0.1, 64000).astype(np.float32)
    dm = MskDemodulator(24000, 1200)
    outs = dm.process(noise)
    assert not bool(outs[-1]["signal"])


def test_msk_step_is_jittable_and_batched():
    """vmap the whole demod step over a VFO axis."""
    import jax
    import jax.numpy as jnp
    cfg = make_config(24000, 1200)
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, size=4000).astype(np.uint8)
    sig = msk_modulate(bits, 24000, 1200, freq=1000.0)
    blk = np.stack([sig[:16000], sig[:16000]])       # 2 identical VFOs
    states = jax.vmap(lambda _: msk_init(cfg))(jnp.arange(2))
    step = jax.vmap(lambda s, x: msk_step(s, x, cfg))
    states, out = step(states, jnp.asarray(blk))
    assert out["soft_bits"].shape == (2, 16000 // 40 * 2)
    np.testing.assert_array_equal(np.asarray(out["soft_bits"][0]),
                                  np.asarray(out["soft_bits"][1]))
