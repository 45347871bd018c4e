"""Coarse carrier-frequency estimation via the fold-spectrum method.

Block equivalent of CoarseFreqEstimate (ref: decode/coarsefreqestimate.cpp:
89-150): low-pass the baseband in the frequency domain, square the signal to
expose the two MSK/OQPSK tones at 2*df +- fb/2, take a dB spectrum smoothed
across blocks, then fold at the expected +-fb/2 tone spacing and pick the
strongest fold inside the locking bandwidth.

Everything is dense FFT/elementwise work batched over the leading (VFO) axes.
Sign convention: input is baseband after mixing by exp(-2j pi f_c n); the
returned estimate is the residual offset of the signal (add it to f_c).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def coarse_freq_init(nfft: int, batch_shape=()):
    """Smoothed-dB-spectrum carry, flooded high like bigchange()
    (ref: coarsefreqestimate.cpp:83-87)."""
    return jnp.full(batch_shape + (nfft,), 20.0, jnp.float32)


@partial(jax.jit, static_argnames=("nfft", "fb", "fs", "lockingbw"))
def coarse_freq_estimate(y_state, x, *, nfft: int, fb: float, fs: float,
                         lockingbw: float):
    """x: complex baseband [..., T] with T >= nfft (first nfft samples used).

    Returns (new_y_state, freq_offset_hz [...]).
    """
    x = x[..., :nfft]
    hzperbin = fs / nfft
    startbin = max(int(round(lockingbw / hzperbin)), 1)
    epb = int(round(fb / (2.0 * hzperbin)))

    X = jnp.fft.fft(x, axis=-1)
    # brick-wall low-pass: zero bins [startbin, nfft-startbin]
    # (ref: coarsefreqestimate.cpp:99-101)
    bins = jnp.arange(nfft)
    keep = (bins < startbin) | (bins > nfft - startbin)
    X = X * keep.astype(X.dtype)
    xlp = jnp.fft.ifft(X, axis=-1)
    sq = xlp * xlp
    S = jnp.fft.fftshift(jnp.fft.fft(sq, axis=-1), axes=-1)

    # scale-invariant dB spectrum: the reference floors at an absolute 1.0
    # (coarsefreqestimate.cpp:116) because its input is pre-scaled by the
    # demod AGC; here the estimator sees raw audio at arbitrary level
    # (e.g. the INI default gain is 0.01, vfo.cpp:7), so normalize by the
    # block peak and floor 40 dB below it instead — otherwise a quiet
    # channel's spectrum clamps flat and the fold argmax pins to the
    # locking-band edge, retuning forever.
    mag = jnp.abs(S)
    ref = jnp.max(mag, axis=-1, keepdims=True)
    db = 10.0 * jnp.log10(jnp.maximum(mag / jnp.maximum(ref, 1e-30), 1e-4))
    # the reference smooths 0.9/0.1 per FFT at ~4 overlapped FFTs/s
    # (mskdemodulator.cpp:287, coarsefreqestimate.cpp:116); at our one FFT
    # per ~0.7 s block, 0.7/0.3 gives the same effective time constant
    y = y_state * 0.7 + 0.3 * db

    # fold at +-expectedpeakbin with a 3-bin sum (ref: :119-141)
    def fold_sum(yv):
        tot = jnp.zeros_like(yv)
        for j in (-1, 0, 1):
            lo = jnp.roll(yv, epb + j, axis=-1)    # y[i - (epb+j)]
            hi = jnp.roll(yv, -(epb + j), axis=-1)  # y[i + (epb+j)]
            tot = tot + lo + hi
        return tot

    z = fold_sum(y)
    mid = nfft // 2
    span = int(round(lockingbw / hzperbin))
    inwin = (bins >= mid - span) & (bins < mid + span)
    z = jnp.where(inwin, z, -jnp.inf)
    loc = jnp.argmax(z, axis=-1)
    # squared signal doubles the offset -> halve; sign: +loc means the
    # squared tone pair is centered above DC, i.e. signal sits above f_c.
    est = (loc - mid).astype(jnp.float32) * hzperbin * 0.5
    return y, est


def spectrum_snapshot(y_state, nbins: int = 256):
    """Decimated smoothed dB fold-spectrum for displays/telemetry
    (the role of the reference's OrgOverlapedBuffer/Plottables GUI signals,
    SURVEY.md §5 — emitted but headless there too)."""
    nfft = y_state.shape[-1]
    step = nfft // nbins
    return jnp.max(y_state[..., : nbins * step].reshape(
        y_state.shape[:-1] + (nbins, step)), axis=-1)


def spectrum_display(coarse_y, fs: float, nbins: int = 256):
    """(freqs_hz, dB) display arrays from the smoothed fold-spectrum
    carry: frequencies are SIGNAL offsets relative to the current tune
    (the squared-signal axis halved).  Shared by the host demod
    wrappers' ``spectrum()`` (Plottables analogue, SURVEY.md §5)."""
    import numpy as _np
    y = _np.asarray(spectrum_snapshot(coarse_y, nbins))
    nfft = coarse_y.shape[-1]
    step = nfft // nbins
    hzperbin = fs / nfft
    freqs = ((_np.arange(nbins) + 0.5) * step - nfft / 2) * hzperbin * 0.5
    return freqs.astype(_np.float32), y
