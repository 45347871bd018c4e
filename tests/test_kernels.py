"""Pallas kernel (interpret mode) and native C++ component tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from aero_tpu.protocol.viterbi import conv_encode, viterbi_decode_soft


def test_pallas_viterbi_interpret_matches_bits():
    from aero_tpu.ops.pallas.viterbi_kernel import viterbi_decode_soft_pallas
    rng = np.random.default_rng(0)
    B, T = 4, 256
    bits = rng.integers(0, 2, size=(B, T)).astype(np.uint8)
    soft = np.stack([conv_encode(b) for b in bits]).astype(np.float32)
    soft = np.clip((soft * 2 - 1 + rng.normal(0, 0.4, soft.shape)) * 127 + 128,
                   0, 255)
    dec = np.asarray(viterbi_decode_soft_pallas(jnp.asarray(soft),
                                                chunk=64, interpret=True))
    assert np.sum(dec[:, :-8] != bits[:, :-8]) == 0


def test_native_viterbi_matches_jax():
    from aero_tpu import native
    if not native.have_native():
        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, size=500).astype(np.uint8)
    soft = np.clip((conv_encode(bits).astype(np.float32) * 2 - 1
                    + rng.normal(0, 0.6, 1000)) * 127 + 128, 0, 255)
    b_native = native.viterbi_decode_soft_native(soft)
    b_jax = np.asarray(viterbi_decode_soft(jnp.asarray(soft)))
    np.testing.assert_array_equal(b_native, b_jax)


def test_database_stub():
    from aero_tpu.protocol.database import DataBaseTextUser, DATABASE_SCHEMA
    results = []
    db = DataBaseTextUser(on_result=lambda ok, ref, res: results.append((ok, ref, res)))
    ref = db.request("", "ABCDEF", userdata={"x": 1})
    assert results == [(False, ref, [])]
    assert db.get_userdata(ref) == {"x": 1}
    assert "Registration" in DATABASE_SCHEMA


# A register-exchange Viterbi variant (no survivor memory/traceback) was
# prototyped through round 4 and REMOVED in round 5 after a head-to-head
# on the real chip: it compiled (the earlier Mosaic stall is gone) but
# decoded 69.5 Mbit/s vs the traceback kernel's ~12,900 Mbit/s (185x)
# AND was no longer bit-exact outside interpreter mode.  The traceback
# kernel (ops/pallas/viterbi_kernel.py, chunk=52) is the production path.
