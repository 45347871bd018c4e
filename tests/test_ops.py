"""Golden tests for the DSP primitive library (vs scipy/numpy references)."""

import numpy as np
import scipy.signal as sig
import jax.numpy as jnp
import pytest

from aero_tpu.ops import (
    nco_init, nco_mix,
    fir_init, fir_apply, fir_decimate_init, fir_decimate_apply,
    halfband_cascade_init, halfband_cascade_apply,
    HALFBAND_TAPS, low_pass_design, root_raised_cosine, msk_matched_filter,
    hilbert_design, block_agc, single_bin_dft, tone_phase_and_freq,
)


def test_nco_matches_numpy_and_carries_phase():
    rng = np.random.default_rng(0)
    x = (rng.normal(size=256) + 1j * rng.normal(size=256)).astype(np.complex64)
    f = 0.01234
    st = nco_init()
    st, y1 = nco_mix(st, jnp.asarray(x[:128]), f)
    st, y2 = nco_mix(st, jnp.asarray(x[128:]), f)
    y = np.concatenate([np.asarray(y1), np.asarray(y2)])
    ref = x * np.exp(2j * np.pi * f * np.arange(256))
    np.testing.assert_allclose(y, ref, atol=2e-4)


def test_nco_batch():
    x = np.ones((3, 64), dtype=np.complex64)
    st = jnp.zeros((3,))
    freqs = jnp.asarray([0.0, 0.1, 0.25])
    st, y = nco_mix(st, jnp.asarray(x), freqs)
    ref = np.exp(2j * np.pi * np.asarray(freqs)[:, None] * np.arange(64))
    np.testing.assert_allclose(np.asarray(y), ref, atol=2e-4)


def test_fir_streaming_equals_lfilter():
    rng = np.random.default_rng(1)
    x = rng.normal(size=1000).astype(np.float32)
    taps = low_pass_design(1.0, 48000, 4000, 2000).astype(np.float32)
    st = fir_init(len(taps))
    outs = []
    for i in range(0, 1000, 200):
        st, y = fir_apply(st, jnp.asarray(x[i:i + 200]), taps)
        outs.append(np.asarray(y))
    y = np.concatenate(outs)
    ref = sig.lfilter(taps, [1.0], x)
    np.testing.assert_allclose(y, ref, atol=1e-4)


def test_fir_complex_and_batch():
    rng = np.random.default_rng(2)
    x = (rng.normal(size=(4, 300)) + 1j * rng.normal(size=(4, 300))).astype(np.complex64)
    taps = HALFBAND_TAPS[11].astype(np.float32)
    st = fir_init(len(taps), batch_shape=(4,), dtype=jnp.complex64)
    st, y = fir_apply(st, jnp.asarray(x), taps)
    ref = np.stack([sig.lfilter(taps, [1.0], x[i]) for i in range(4)])
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)


def test_halfband_decimator_streaming():
    rng = np.random.default_rng(3)
    x = (rng.normal(size=1024) + 1j * rng.normal(size=1024)).astype(np.complex64)
    taps = HALFBAND_TAPS[11].astype(np.float32)
    st = fir_decimate_init(len(taps), dtype=jnp.complex64)
    outs = []
    for i in range(0, 1024, 256):
        st, y = fir_decimate_apply(st, jnp.asarray(x[i:i + 256]), taps, 2)
        outs.append(np.asarray(y))
    y = np.concatenate(outs)
    ref = sig.lfilter(taps, [1.0], x)[::2]
    np.testing.assert_allclose(y, ref, atol=1e-4)
    assert len(y) == 512


def test_halfband_cascade_shapes_and_passband():
    # a slow complex exponential must survive 3 stages of 8:1 decimation
    fs = 96000.0
    t = np.arange(8192) / fs
    x = np.exp(2j * np.pi * 1000.0 * t).astype(np.complex64)
    taps = HALFBAND_TAPS[23].astype(np.float32)
    sts = halfband_cascade_init(3, len(taps))
    sts, y = halfband_cascade_apply(sts, jnp.asarray(x), taps)
    y = np.asarray(y)
    assert y.shape == (1024,)
    # steady-state amplitude ~1 (skip the filter transient)
    assert abs(np.mean(np.abs(y[200:])) - 1.0) < 0.02


def test_rrc_matches_commpy_style_properties():
    taps = root_raised_cosine(1.0, 55, 48000, 10500)
    assert len(taps) == 55
    # symmetric, peak at center
    np.testing.assert_allclose(taps, taps[::-1], rtol=1e-12)
    assert np.argmax(taps) == 27
    # RRC convolved with itself ~ Nyquist: zero ISI at symbol spacings
    rc = np.convolve(taps, taps)
    sps = 48000 / 10500
    mid = len(rc) // 2
    for k in (1, 2, 3):
        idx = int(round(mid + k * sps))
        assert abs(rc[idx]) < 0.05 * rc[mid]


def test_msk_matched_filter_vs_reference_formula():
    h = msk_matched_filter(20)
    i = np.arange(40)
    np.testing.assert_allclose(h, np.sin(np.pi * i / 40.0) / 40.0, rtol=1e-12)


def test_low_pass_design_is_lowpass():
    taps = low_pass_design(1.0, 48000, 3000, 1000)
    w, h = sig.freqz(taps, fs=48000)
    h = np.abs(h)
    assert np.all(h[w < 2000] > 0.9)
    assert np.all(h[w > 4500] < 0.05)
    assert abs(np.sum(taps) - 1.0) < 1e-9


def test_hilbert_design_phase():
    h = hilbert_design(125)
    w, resp = sig.freqz(h, fs=2.0)
    band = (w > 0.1) & (w < 0.9)
    np.testing.assert_allclose(np.abs(resp[band]), 1.0, atol=0.02)
    # 90-degree phase (type III, imaginary response after delay removal)
    delay = (len(h) - 1) / 2
    adj = resp[band] * np.exp(1j * np.pi * w[band] * delay)
    assert np.max(np.abs(adj.real)) < 0.02


def test_block_agc():
    x = np.abs(np.random.default_rng(4).normal(size=(2, 1000))).astype(np.float32) * 5.0
    ema = jnp.zeros((2,))
    ema, gain = block_agc(ema, jnp.asarray(x))
    scaled_mean = np.mean(x * np.asarray(gain)[:, None], axis=-1)
    np.testing.assert_allclose(scaled_mean, np.sqrt(2), rtol=1e-3)


def test_single_bin_dft_and_tone():
    fs = 48000.0
    f0 = 600.0
    t = np.arange(4800)
    phase0 = 0.3
    x = np.exp(2j * np.pi * (f0 / fs * t + phase0)).astype(np.complex64)
    c = np.asarray(single_bin_dft(jnp.asarray(x), f0 / fs))
    assert abs(abs(c) - 4800) < 1.0
    est_phase, est_f, mag = tone_phase_and_freq(jnp.asarray(x), f0 / fs, 2)
    assert abs(float(est_phase) - phase0) < 1e-3
    assert abs(float(est_f) - f0 / fs) < 1e-6
