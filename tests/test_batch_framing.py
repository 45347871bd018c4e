"""Batched device-side frame decoding tests."""

import numpy as np
import jax.numpy as jnp

from aero_tpu.protocol.batch_framing import (batch_decode_p_frames,
                                             crc16_check_batch)
from aero_tpu.protocol.framing import (build_p_frames, FRAME_SPECS,
                                       bits_to_bytes_lsb)
from aero_tpu.protocol.crc import append_crc16_bytes
from aero_tpu.protocol.interleaver import deinterleave_indices


def test_crc_batch_matches_scalar():
    rng = np.random.default_rng(0)
    sus = [np.unpackbits(np.frombuffer(
        append_crc16_bytes(bytes(rng.integers(0, 256, 10, dtype=np.uint8).tolist())),
        np.uint8), bitorder="little") for _ in range(16)]
    bad = sus[3].copy()
    bad[7] ^= 1
    sus.append(bad)
    ok = np.asarray(crc16_check_batch(jnp.asarray(np.stack(sus))))
    assert ok[:16].all() and not ok[16]


def test_batch_decode_matches_stream():
    rng = np.random.default_rng(1)
    rate = 1200
    spec = FRAME_SPECS[rate]
    fields = [b"".join(append_crc16_bytes(bytes([0x71] + list(rng.integers(0, 256, 9))))
                       for _ in range(6)) for _ in range(6)]
    bits = build_p_frames(fields, rate, lead_frames=1)
    soft = bits.astype(np.float32) * 255
    tb, hb = spec.total_bits, spec.header_bits
    didx = deinterleave_indices(spec.cols)
    payloads, prefixes = [], []
    prev_tail = np.full(62, 128.0, np.float32)
    for j in range(len(bits) // tb):
        pay = soft[j * tb + hb: j * tb + hb + spec.payload_soft_bits]
        payloads.append(pay)
        prefixes.append(prev_tail.copy())
        de = np.concatenate(
            [pay[b * 64 * spec.cols:(b + 1) * 64 * spec.cols][didx]
             for b in range(spec.blocks_per_frame)])
        prev_tail = de[-62:]
    out = batch_decode_p_frames(jnp.asarray(np.stack(payloads)),
                                jnp.asarray(np.stack(prefixes)), rate=rate)
    info = np.asarray(out["info_bits"])
    su_ok = np.asarray(out["su_ok"])
    assert su_ok.all()
    recovered = sum(bits_to_bytes_lsb(info[j]) in fields
                    for j in range(len(payloads)))
    assert recovered == len(fields)


def test_batch_decode_pallas_interpret_agrees():
    rng = np.random.default_rng(2)
    rate = 600
    spec = FRAME_SPECS[rate]
    fields = [b"".join(append_crc16_bytes(bytes([0x71] + list(rng.integers(0, 256, 9))))
                       for _ in range(6)) for _ in range(2)]
    bits = build_p_frames(fields, rate, lead_frames=1)
    soft = bits.astype(np.float32) * 255
    tb, hb = spec.total_bits, spec.header_bits
    payloads = np.stack([soft[j * tb + hb: j * tb + hb + spec.payload_soft_bits]
                         for j in range(len(bits) // tb)])
    prefixes = np.full((len(payloads), 62), 128.0, np.float32)
    a = batch_decode_p_frames(jnp.asarray(payloads), jnp.asarray(prefixes),
                              rate=rate)
    assert np.asarray(a["su_ok"])[1:-1].all()
