"""Spectral helpers: single-bin DFTs and tone trackers.

These power the feedforward synchronizers: instead of per-sample PLLs
(IIR resonator + arctan error, ref decode/mskdemodulator.cpp:323-340), each
block extracts its timing tone with one dense single-bin DFT — an O(T)
reduction that vectorizes perfectly over the VFO axis.
"""

from __future__ import annotations

import jax.numpy as jnp


def single_bin_dft(x, freq_norm):
    """DFT of x [..., T] at normalized frequency f/Fs (cycles/sample).

    Returns complex coefficient sum(x[n] * exp(-2j pi f n)).  ``freq_norm``
    broadcasts against the leading axes.
    """
    T = x.shape[-1]
    n = jnp.arange(T, dtype=jnp.float32)
    f = jnp.asarray(freq_norm, jnp.float32)
    ang = -2.0 * jnp.pi * jnp.mod(f[..., None] * n, 1.0)
    tw = jnp.exp(1j * ang).astype(jnp.complex64)
    return jnp.sum(x * tw, axis=-1)


def tone_phase_and_freq(x, freq_norm, halfspan_bins: int = 1):
    """Estimate phase of a known tone near ``freq_norm`` in x [..., T].

    Evaluates 2*halfspan+1 candidate bins spaced by one DFT bin around the
    nominal frequency, picks the strongest, and returns (phase_cycles,
    refined_freq_norm, magnitude).  Used for symbol-timing tone extraction.
    """
    T = x.shape[-1]
    offs = jnp.arange(-halfspan_bins, halfspan_bins + 1, dtype=jnp.float32) / T
    f = jnp.asarray(freq_norm, jnp.float32)
    cands = f[..., None] + offs  # [..., C]
    coeffs = jnp.stack([single_bin_dft(x, cands[..., i]) for i in range(offs.shape[0])], axis=-1)
    mags = jnp.abs(coeffs)
    best = jnp.argmax(mags, axis=-1)
    coeff = jnp.take_along_axis(coeffs, best[..., None], axis=-1)[..., 0]
    fbest = jnp.take_along_axis(cands, best[..., None], axis=-1)[..., 0]
    phase = jnp.angle(coeff) / (2.0 * jnp.pi)
    return phase, fbest, jnp.abs(coeff)
