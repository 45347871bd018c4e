"""Unit tests for the Aero-L protocol codecs (CRC, scrambler, interleaver,
depuncture, Viterbi) — pure-function round trips and cross-checks against
independently-computed references."""

import numpy as np
import jax.numpy as jnp
import pytest

from aero_tpu.protocol import (
    crc16_bits, crc16_bytes, crc16_check_bits,
    SCRAMBLE_KEYSTREAM, scramble_bits,
    deinterleave_indices, interleave_indices, deinterleave_msk_burst_indices,
    depuncture_soft,
    conv_encode, viterbi_decode_soft, viterbi_decode_soft_batch, StreamingViterbi,
)
from aero_tpu.protocol.crc import append_crc16_bits, append_crc16_bytes
from aero_tpu.protocol.interleaver import puncture_soft


# ---------- CRC ----------

def _crc16_bitwise_ref(bits):
    """Literal transcription of the reference bit loop (aerol.h:308-331)."""
    crc = 0xFFFF
    for b in bits:
        crc_bit = crc & 1
        crc >>= 1
        if crc_bit ^ int(b):
            crc ^= 0x8408
    return crc ^ 0xFFFF


def test_crc16_bits_matches_bitwise():
    rng = np.random.default_rng(0)
    for n in (80, 8 * 17, 37):
        bits = rng.integers(0, 2, size=n).astype(np.uint8)
        assert crc16_bits(bits) == _crc16_bitwise_ref(bits)


def test_crc16_bytes_is_lsb_first_bit_crc():
    data = bytes(range(10))
    bits = np.unpackbits(np.frombuffer(data, np.uint8), bitorder="little")
    assert crc16_bytes(data) == crc16_bits(bits)


def test_crc16_append_and_check_roundtrip():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, size=80).astype(np.uint8)
    framed = append_crc16_bits(bits)
    assert crc16_check_bits(framed)
    bad = framed.copy()
    bad[3] ^= 1
    assert not crc16_check_bits(bad)


def test_crc16_su_byte_layout():
    su = append_crc16_bytes(bytes(range(10)))
    assert len(su) == 12
    bits = np.unpackbits(np.frombuffer(su, np.uint8), bitorder="little")
    assert crc16_check_bits(bits)


# ---------- scrambler ----------

def test_keystream_matches_lfsr_transcription():
    state = [1, 1, 0, 1, 0, 0, 1, 0, 1, 0, 1, 1, 0, 0, 1]
    ref = []
    for _ in range(200):
        v = state[0] ^ state[14]
        ref.append(v)
        state = [v] + state[:-1]
    np.testing.assert_array_equal(SCRAMBLE_KEYSTREAM[:200], ref)


def test_scramble_self_inverse():
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, size=576).astype(np.uint8)
    np.testing.assert_array_equal(scramble_bits(scramble_bits(bits)), bits)


# ---------- interleaver ----------

def _deinterleave_ref(block, cols):
    """Literal transcription of deinterleave_ba (aerol.cpp:594-613)."""
    dep = [(i * 27) % 64 for i in range(64)]
    out = []
    for j in range(cols):
        for i in range(64):
            out.append(block[dep[i] * cols + j])
    return np.array(out)


def _deinterleave_msk_ref(block, blocks):
    """Literal transcription of deinterleaveMSK_ba (aerol.cpp:651-686)."""
    dep = [(i * 27) % 64 for i in range(64)]
    out = []
    for j in range(5):
        for i in range(64):
            out.append(block[dep[i] * 5 + j])
    procblocks = 5
    while len(out) < blocks * 64:
        for j in range(3):
            for i in range(64):
                out.append(block[64 * procblocks + dep[i] * 3 + j])
        procblocks += 3
    return np.array(out)


@pytest.mark.parametrize("cols", [6, 9, 4, 78])
def test_deinterleave_matches_reference(cols):
    rng = np.random.default_rng(3)
    block = rng.integers(0, 256, size=64 * cols)
    np.testing.assert_array_equal(block[deinterleave_indices(cols)],
                                  _deinterleave_ref(block, cols))


@pytest.mark.parametrize("cols", [6, 9, 78])
def test_interleave_is_inverse(cols):
    rng = np.random.default_rng(4)
    data = rng.integers(0, 256, size=64 * cols)
    tx = data[interleave_indices(cols)]
    np.testing.assert_array_equal(tx[deinterleave_indices(cols)], data)


@pytest.mark.parametrize("blocks", [5, 8, 11])
def test_deinterleave_msk_burst_matches_reference(blocks):
    rng = np.random.default_rng(5)
    block = rng.integers(0, 256, size=64 * blocks)
    np.testing.assert_array_equal(block[deinterleave_msk_burst_indices(blocks)],
                                  _deinterleave_msk_ref(block, blocks))


# ---------- depuncture ----------

def _depuncture_ref(src, pattern):
    """Literal transcription of depunture_soft_block (aerol.cpp:2432-2446)."""
    out = []
    ptr = 0
    for i in range(len(src) - 1):
        ptr += 1
        out.append(src[i])
        if ptr >= pattern - 1:
            out.append(128)
        ptr %= pattern - 1
    return np.array(out)


@pytest.mark.parametrize("n,pattern", [(100, 4), (4096, 4), (31, 3)])
def test_depuncture_matches_reference(n, pattern):
    rng = np.random.default_rng(6)
    src = rng.integers(0, 256, size=n)
    np.testing.assert_array_equal(depuncture_soft(src, pattern),
                                  _depuncture_ref(src, pattern))


def test_puncture_depuncture_positions():
    coded = np.arange(1, 101)
    tx = puncture_soft(coded, 4)
    rx = depuncture_soft(np.append(tx, 0), 4)  # modulator appends a dummy
    # every non-128 position must carry the original value
    orig = coded[: len(rx)]
    mask = rx != 128
    np.testing.assert_array_equal(rx[mask], orig[mask])


# ---------- Viterbi ----------

def test_viterbi_roundtrip_clean():
    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, size=500).astype(np.uint8)
    coded = conv_encode(bits)
    soft = coded.astype(np.float32) * 255.0
    dec = np.asarray(viterbi_decode_soft(jnp.asarray(soft)))
    # all but the last few bits (no tail flush) must match
    np.testing.assert_array_equal(dec[:-6], bits[:-6])


def test_viterbi_corrects_errors():
    rng = np.random.default_rng(8)
    bits = rng.integers(0, 2, size=400).astype(np.uint8)
    coded = conv_encode(bits).astype(np.float32)
    soft = coded * 255.0
    # flip 5% of coded bits hard
    idx = rng.choice(len(soft), size=len(soft) // 20, replace=False)
    soft[idx] = 255.0 - soft[idx]
    dec = np.asarray(viterbi_decode_soft(jnp.asarray(soft)))
    errs = np.sum(dec[:-6] != bits[:-6])
    assert errs == 0


def test_viterbi_soft_noise():
    rng = np.random.default_rng(9)
    bits = rng.integers(0, 2, size=600).astype(np.uint8)
    coded = conv_encode(bits).astype(np.float32)
    # AWGN at ~2 dB Eb/N0 on the soft metric scale
    llr = (coded * 2.0 - 1.0) + rng.normal(0, 0.7, size=len(coded))
    soft = np.clip(llr * 127.0 + 128.0, 0, 255)
    dec = np.asarray(viterbi_decode_soft(jnp.asarray(soft)))
    ber = np.mean(dec[:-6] != bits[:-6])
    assert ber < 0.01


def test_viterbi_batch():
    rng = np.random.default_rng(10)
    bits = rng.integers(0, 2, size=(8, 200)).astype(np.uint8)
    soft = np.stack([conv_encode(b) for b in bits]).astype(np.float32) * 255.0
    dec = np.asarray(viterbi_decode_soft_batch(jnp.asarray(soft)))
    np.testing.assert_array_equal(dec[:, :-6], bits[:, :-6])


def test_streaming_viterbi_matches_block_decode():
    rng = np.random.default_rng(11)
    bits = rng.integers(0, 2, size=1728).astype(np.uint8)
    soft = conv_encode(bits).astype(np.float32) * 255.0
    sv = StreamingViterbi()
    outs = []
    for i in range(0, len(soft), 1152):
        outs.append(sv.decode(soft[i:i + 1152]))
    dec = np.concatenate(outs)
    assert dec.shape == (1728,)
    # interior bits exact; last few lack tail
    np.testing.assert_array_equal(dec[:-6], bits[:-6])
