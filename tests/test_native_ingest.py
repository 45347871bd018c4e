"""Native ingest library (aero_tpu/native/ingest.cc): bit-exactness against
the numpy reference paths and the DC-tracker recurrence."""

import numpy as np
import pytest

from aero_tpu import native


pytestmark = pytest.mark.skipif(not native.have_native_ingest(),
                                reason="g++ unavailable")


def _iq(n=100001, seed=3, scale=0.7):
    rng = np.random.default_rng(seed)
    return (scale * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
            ).astype(np.complex64)


def test_quantize_int4_matches_numpy():
    iq = _iq()
    got = native.quantize_native(iq, "int4")
    re = np.clip(np.round(iq.real * 7.0), -8, 7).astype(np.int64)
    im = np.clip(np.round(iq.imag * 7.0), -8, 7).astype(np.int64)
    want = (((re & 0xF) << 4) | (im & 0xF)).astype(np.uint8)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_quantize_int2_matches_numpy():
    iq = _iq(n=100000)
    got, sigma = native.quantize_native(iq, "int2")
    arms = np.stack([iq.real, iq.imag], axis=-1).astype(np.float32)
    want_sigma = np.float32(np.sqrt(np.mean(arms * arms)))
    assert abs(sigma - want_sigma) < 1e-6
    code = (((arms >= 0).astype(np.uint8) << 1)
            | (np.abs(arms) >= want_sigma).astype(np.uint8))
    q = code.reshape(-1, 4)
    want = ((q[:, 0] << 6) | (q[:, 1] << 4) | (q[:, 2] << 2)
            | q[:, 3]).astype(np.uint8)
    assert got.shape == (iq.size // 2,)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("dtype,lim", [("int8", 127.0), ("int16", 32767.0)])
def test_quantize_planar_matches_numpy(dtype, lim):
    iq = _iq(seed=4, scale=1.3)   # exercise clipping
    got = native.quantize_native(iq, dtype)
    pair = np.stack([iq.real, iq.imag])
    want = np.clip(pair * lim, -lim, lim).astype(dtype)
    assert got.shape == (2, iq.size)
    np.testing.assert_array_equal(got, want)


def test_dc_correct_recurrence():
    iq = (_iq(5000, seed=5) + (0.25 - 0.1j)).astype(np.complex64)
    alpha = 2e-3
    # run natively in two chunks (state must carry across)
    state = np.zeros(2, np.float32)
    a = iq[:2000].copy()
    b = iq[2000:].copy()
    native.dc_correct_native(a, alpha, state)
    native.dc_correct_native(b, alpha, state)
    got = np.concatenate([a, b])
    # reference per-sample recurrence
    dc = 0.0 + 0.0j
    want = np.empty_like(iq)
    for i, x in enumerate(iq):
        dc = dc + alpha * (x - dc)
        want[i] = x - dc
    np.testing.assert_allclose(got, want, atol=1e-5)
    # DC is actually removed
    assert abs(np.mean(got[3000:])) < 0.01


def test_pcm16_roundtrip():
    pcm = np.array([-32768, -1, 0, 1, 32767, 12345], "<i2")
    out = native.pcm16_to_f32_native(pcm)
    np.testing.assert_allclose(out, pcm.astype(np.float32) / 32768.0)


def test_fused_station_uses_native_quantize():
    from aero_tpu.channelizer import load_ini
    from aero_tpu.runtime.fused_station import FusedStation
    ini = ("sample_rate=1536000\ncenter_frequency=1545000000\n[vfos]\n"
           "size=1\n1\\frequency=1545010000\n1\\data_rate=1200\n"
           "1\\topic=V\n1\\gain=100\n")
    st = FusedStation(load_ini(ini, is_text=True), ingest_dtype="int4")
    iq = _iq(st.block_len, seed=6, scale=0.1)
    q = st.quantize(iq)
    assert q.dtype == np.uint8 and q.shape == (st.block_len,)
