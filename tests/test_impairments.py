"""Channel-impairment stress suite (VERDICT r4 item 1).

Every other synthetic test uses AWGN + a CONSTANT carrier offset.  Real
aircraft/satellite links and real SDR clocks add three impairments the
reference's per-sample PLLs track implicitly (mskdemodulator.cpp:323-369
timing, :346-369 carrier, AFC :430-469; oqpskdemodulator.cpp:412-476)
and this repo's block-feedforward demodulators must therefore track
explicitly:

  (a) sustained linear Doppler ramps — handled by the block-rate CFO
      slope tracker (models/msk.py `_segment_slope_track` + chirp
      derotation), added in round 5 after this suite's first run
      measured 0/56 frames at a mere 25 Hz/s;
  (b) constant sample-clock offsets (RX ADC ppm error) — handled by the
      second-order timing loop with clock-ratio-scaled strobe spacing,
      the demod's slip flag + host realignment (apply_slip: a
      renormalization costs two soft-bit erasures, not a frame), and
      the deframer's slipped-UW fast relock as the fallback;
  (c) phase noise (Wiener / random-walk carrier phase).

Measured tracking envelopes (frame recovery at 20 dB SNR, this suite's
exact streams; thresholds below leave margin for numeric jitter only —
a real regression fails the test):

  MSK 1200 @24k:  ramp 25/50/100/150 Hz/s -> LOSSLESS 56/56 (fit-
                  residual gate + slip realignment; 200 Hz/s -> 51/56);
                  ppm +-100/200/500 -> LOSSLESS 28/28; phase noise
                  5 mrad/sample -> 16/16, 10 mrad -> lost
  OQPSK 10500 @48k: ramp 240 Hz/s -> LOSSLESS 120/120 (2.4x the
                  L-band scale — the harsher C-band case; 360 degrades);
                  ppm +-100 -> LOSSLESS 60/60 (17 slips realigned;
                  44/60 without); 200 ppm -> lost (per-block drift
                  exceeds half a strobe interval: tracker aliases)
  Burst R (600):  per-burst CFO spread by a ramp + 100 ppm + phase
                  noise decodes >= 12/14
  Stations:       the same 400 ppm stream decodes end to end through
                  BOTH the FusedStation (slip rides the packed device
                  telemetry) and the classic Station's VfoBank path

Losses under ramps are the acquisition transient (the first few
seconds); steady-state tracking is asserted separately at ~100%.
"""

import numpy as np
import pytest

from aero_tpu.protocol.crc import append_crc16_bytes
from aero_tpu.protocol.framing import (FRAME_SPECS, PChannelFramer,
                                       build_p_frames)


def impair(sig, fs, cfo0=0.0, ramp=0.0, ppm=0.0, pn=0.0, seed=0):
    """Apply carrier ramp / sample-clock offset / phase noise to real
    audio: analytic signal -> time-varying rotation -> resample."""
    from scipy.signal import hilbert
    rng = np.random.default_rng(seed)
    z = hilbert(sig.astype(np.float64))
    t = np.arange(len(z)) / fs
    ph = 2 * np.pi * (cfo0 * t + 0.5 * ramp * t * t)
    if pn:
        ph = ph + np.cumsum(rng.normal(0, pn, len(z)))
    x = (z * np.exp(1j * ph)).real
    if ppm:
        r = 1.0 + ppm * 1e-6
        idx = np.arange(int((len(x) - 2) / r)) * r
        x = np.interp(idx, np.arange(len(x)), x)
    return x.astype(np.float32)


def _fill_fields(rate, n_fields, seed=1):
    rng = np.random.default_rng(seed)
    nsu = FRAME_SPECS[rate].payload_info_bits // 96
    return [b"".join(append_crc16_bytes(
        bytes([0x71] + list(rng.integers(0, 256, 9))))
        for _ in range(nsu)) for _ in range(n_fields)]


def _msk_stream(n_fields, snr=20.0, seed=1):
    from aero_tpu.models.msk import msk_modulate
    fields = _fill_fields(1200, n_fields, seed)
    bits = build_p_frames(fields, 1200, lead_frames=4)
    sig = msk_modulate(bits, 24000, 1200, freq=1000.0)
    p = np.mean(sig ** 2)
    rng = np.random.default_rng(seed + 100)
    sig = sig + rng.normal(0, np.sqrt(p / 10 ** (snr / 10)), len(sig))
    return fields, sig.astype(np.float32)


def _feed_with_slip(outs, framer):
    """Feed demod block outputs through a framer, passing the slip flag
    the way every runtime consumer does — realignment happens INSIDE
    framer.feed (protocol/framing.py)."""
    evs = []
    for o in outs:
        evs += framer.feed(o["soft_bits"].astype(np.float32),
                           slip=int(o["slip"]))
    return evs


def _run_msk(fields, sig):
    from aero_tpu.models.msk import MskDemodulator
    dm = MskDemodulator(24000, 1200)
    outs = dm.process(np.concatenate([sig, np.zeros(48000, np.float32)]))
    got = [e.infofield for e in _feed_with_slip(outs, PChannelFramer(1200))]
    return [i for i, f in enumerate(fields) if f in got]


def _oqpsk_stream(n_fields, snr=20.0, seed=1):
    from aero_tpu.models.oqpsk import oqpsk_modulate
    fields = _fill_fields(10500, n_fields, seed)
    bits = build_p_frames(fields, 10500, lead_frames=4)
    sig = oqpsk_modulate(bits, 48000, 10500, freq=8000.0)
    p = np.mean(sig ** 2)
    rng = np.random.default_rng(seed + 100)
    sig = sig + rng.normal(0, np.sqrt(p / 10 ** (snr / 10)), len(sig))
    return fields, sig.astype(np.float32)


def _run_oqpsk(fields, sig):
    from aero_tpu.models.oqpsk import OqpskDemodulator
    dm = OqpskDemodulator(48000, 10500)
    outs = dm.process(np.concatenate([sig, np.zeros(96000, np.float32)]))
    got = [e.infofield for e in _feed_with_slip(outs, PChannelFramer(10500))]
    return [i for i, f in enumerate(fields) if f in got]


# ---- (a) Doppler ramps, >= 60 s sustained ---------------------------

@pytest.mark.parametrize("rate,min_total,min_steady", [
    (25.0, 52, 0.95),    # L-band realistic (0.5 g maneuver at 1.5 GHz)
    (150.0, 48, 0.9),    # 6x that — measured envelope edge (200 degrades)
])
def test_msk_doppler_ramp_61s(rate, min_total, min_steady):
    fields, sig = _msk_stream(56)          # 61 s of continuous frames
    x = impair(sig, 24000, cfo0=-500.0, ramp=rate)
    rec = _run_msk(fields, x)
    assert len(rec) >= min_total, (len(rec), sorted(set(range(56)) - set(rec)))
    # steady state (past the acquisition transient) must hold ~100%
    steady = [i for i in rec if i >= 16]
    assert len(steady) / 40.0 >= min_steady


def test_oqpsk_doppler_ramp_240hzps_62s():
    """The harsher C-band case: 240 Hz/s sustained over 62 s (2.4x the
    L-band scale times the same maneuver envelope)."""
    fields, sig = _oqpsk_stream(120)       # 62 s
    x = impair(sig, 48000, cfo0=-1500.0, ramp=240.0)
    rec = _run_oqpsk(fields, x)
    assert len(rec) >= 112, len(rec)          # measured lossless 120/120
    steady = [i for i in rec if i >= 20]
    assert len(steady) / 100.0 >= 0.9


# ---- (b) sample-clock offset (RX ADC ppm) ---------------------------

@pytest.mark.parametrize("ppm,min_ok", [(100.0, 27), (-100.0, 27),
                                        (500.0, 26)])
def test_msk_clock_offset_33s(ppm, min_ok):
    """A sample-clock offset forces the strobe grid to renormalize (a
    bit-pair slip; every ~17 s at 100 ppm).  The demod reports each slip
    (out['slip']) and the consumer realigns the soft stream
    (protocol/framing.apply_slip), so a slip costs two soft-bit
    erasures — which the Viterbi absorbs — and recovery is LOSSLESS
    (28/28 measured at 100, 200 and even 500 ppm)."""
    fields, sig = _msk_stream(28)          # 33 s
    x = impair(sig, 24000, ppm=ppm)
    rec = _run_msk(fields, x)
    assert len(rec) >= min_ok, (len(rec), sorted(set(range(28)) - set(rec)))


@pytest.mark.parametrize("ppm,min_ok", [(100.0, 57), (-100.0, 57)])
def test_oqpsk_clock_offset_32s(ppm, min_ok):
    """At 10500 bps a 100 ppm offset slips one strobe every 1.9 s — one
    slip per 3.75 frames.  With slip realignment recovery is LOSSLESS
    (60/60 measured; without it the fixed-length soft stream would lose
    one frame per slip, 44/60).  200 ppm exceeds the timing tracker's
    per-block unambiguous innovation (drift > half a strobe interval
    per block) and is the documented envelope edge."""
    fields, sig = _oqpsk_stream(60)        # 32 s
    x = impair(sig, 48000, ppm=ppm)
    rec = _run_oqpsk(fields, x)
    assert len(rec) >= min_ok, (len(rec), sorted(set(range(60)) - set(rec)))


# ---- (c) phase noise ------------------------------------------------

def test_msk_phase_noise():
    """Wiener phase noise, 5 mrad/sample at 24 kHz (~0.6 Hz Lorentzian
    linewidth — an order beyond any real SDR TCXO): zero frame loss."""
    fields, sig = _msk_stream(16)
    x = impair(sig, 24000, pn=0.005, seed=9)
    rec = _run_msk(fields, x)
    assert len(rec) >= 14, len(rec)


def test_oqpsk_phase_noise():
    """2 mrad/sample at 48 kHz (~0.2 Hz linewidth): zero frame loss."""
    fields, sig = _oqpsk_stream(30)
    x = impair(sig, 48000, pn=0.002, seed=9)
    rec = _run_oqpsk(fields, x)
    assert len(rec) >= 27, len(rec)


def _wideband_msk_msgs(n_msgs, fs_wb, delta, seed=5):
    """Wideband complex stream carrying n_msgs single-frame ACARS
    messages on an MSK 1200 VFO at +delta Hz off center."""
    from scipy.signal import resample_poly
    from aero_tpu.models.msk import msk_modulate
    from aero_tpu.protocol.isu import make_acars_userdata, segment_isu

    fill = append_crc16_bytes(bytes([0x01] + [0] * 9))
    fields = []
    texts = []
    for k in range(n_msgs):
        text = f"SLIP MSG {k:03d}"
        texts.append(text)
        ud = make_acars_userdata("2", "VH-SLP", "!", "AA", "M", text)
        sus = [append_crc16_bytes(b)
               for b in segment_isu(ud, 0x654321, 0x41)]
        sus += [fill] * (6 - len(sus))
        fields.append(b"".join(sus))
    bits = build_p_frames(fields, 1200, lead_frames=4)
    audio = msk_modulate(bits, 24000, 1200, freq=1000.0)
    up = fs_wb // 24000
    # single-sideband, the way the channel exists over the air (see the
    # C-channel test below for why DSB synthetic wideband misbehaves
    # under any impairment that breaks the ± mirror symmetry)
    from scipy.signal import hilbert
    an = hilbert(audio.astype(np.float64))
    bb = resample_poly(an, up, 1).astype(np.complex64)
    t = np.arange(len(bb)) / fs_wb
    return texts, (bb * np.exp(2j * np.pi * delta * t)).astype(np.complex64)


def _ppm_resample_iq(wide, ppm):
    r = 1.0 + ppm * 1e-6
    idx = np.arange(int((len(wide) - 2) / r)) * r
    base = np.arange(len(wide))
    return (np.interp(idx, base, wide.real)
            + 1j * np.interp(idx, base, wide.imag)).astype(np.complex64)


def test_fused_station_clock_offset_slip_realignment():
    """400 ppm through the FULL FusedStation: the slip flag rides the
    packed device telemetry (5th slot per VFO) and _drain realigns the
    soft stream before the framers — every message decodes."""
    from aero_tpu.channelizer import load_ini
    from aero_tpu.runtime.fused_station import FusedStation

    fs_wb = 288000
    texts, wide = _wideband_msk_msgs(10, fs_wb, 24000)
    wide = _ppm_resample_iq(wide, 400.0)
    ini = (f"[General]\nsample_rate={fs_wb}\ncenter_frequency=1545000000\n"
           "[vfos]\nsize=1\n1\\frequency=1545024000\n1\\data_rate=1200\n"
           "1\\topic=V1\n1\\gain=100\n")
    msgs = []
    st = FusedStation(load_ini(ini, is_text=True),
                      on_acars=lambda t, it: msgs.append(it.message))
    w = np.concatenate([wide, np.zeros(2 * st.block_len, np.complex64)])
    for i in range(0, (len(w) // st.block_len) * st.block_len, st.block_len):
        st.process(w[i:i + st.block_len])
    st.flush()
    got = [t for t in texts if t in msgs]
    assert len(got) >= 9, (len(got), sorted(set(texts) - set(msgs)))


def test_fused_station_doppler_ramp():
    """A 40 Hz/s Doppler ramp on the wideband IQ through the FULL
    FusedStation: the per-VFO slope tracker runs under vmap on the
    device chain and every message decodes once acquisition settles."""
    from aero_tpu.channelizer import load_ini
    from aero_tpu.runtime.fused_station import FusedStation

    fs_wb = 288000
    texts, wide = _wideband_msk_msgs(12, fs_wb, 24000)
    t = np.arange(len(wide)) / fs_wb
    wide = (wide * np.exp(2j * np.pi * (0.5 * 40.0) * t * t)
            ).astype(np.complex64)
    ini = (f"[General]\nsample_rate={fs_wb}\ncenter_frequency=1545000000\n"
           "[vfos]\nsize=1\n1\\frequency=1545024000\n1\\data_rate=1200\n"
           "1\\topic=V1\n1\\gain=100\n")
    msgs = []
    st = FusedStation(load_ini(ini, is_text=True),
                      on_acars=lambda t_, it: msgs.append(it.message))
    w = np.concatenate([wide, np.zeros(2 * st.block_len, np.complex64)])
    for i in range(0, (len(w) // st.block_len) * st.block_len, st.block_len):
        st.process(w[i:i + st.block_len])
    st.flush()
    got = [x for x in texts if x in msgs]
    assert len(got) >= 10, (len(got), sorted(set(texts) - set(msgs)))


def test_classic_station_clock_offset_slip_realignment():
    """The same 400 ppm stream through the classic Station's VfoBank
    path (tree channelizer): the bank's per-row slip output realigns
    each VFO's soft stream before its framer."""
    from aero_tpu.channelizer import load_ini
    from aero_tpu.runtime.station import Station

    fs_wb = 288000
    texts, wide = _wideband_msk_msgs(10, fs_wb, 24000)
    wide = _ppm_resample_iq(wide, 400.0)
    ini = (f"[General]\nsample_rate={fs_wb}\ncenter_frequency=1545000000\n"
           "[vfos]\nsize=1\n1\\frequency=1545024000\n1\\data_rate=1200\n"
           "1\\topic=V1\n1\\gain=100\n")
    cfg = load_ini(ini, is_text=True)
    msgs = []
    st = Station(cfg, on_acars=lambda t, it: msgs.append(it.message))
    B = cfg.buflen_complex
    w = np.concatenate([wide, np.zeros(2 * B, np.complex64)])
    for i in range(0, (len(w) // B) * B, B):
        st.process(w[i:i + B])
    got = [t for t in texts if t in msgs]
    assert len(got) >= 9, (len(got), sorted(set(texts) - set(msgs)))


def test_fused_station_c_channel_clock_offset():
    """The 8400 C channel (voice + signalling) under a 100 ppm ADC clock
    offset through the FusedStation: the OQPSK-based C demod emits the
    same slip flags and the C framers receive the realigned stream.

    Construction note (a trap worth recording): the wideband must carry
    the channel as a SINGLE sideband (analytic audio upconverted), the
    way the signal exists over the air.  Building it from real audio
    puts both sidebands in the IQ stream; a clock offset then scales
    them asymmetrically relative to the channelizer's mix, and the USB
    extraction folds them into two carriers ~19 Hz apart — an
    unphysical beat no receiver would ever see.  The clock offset
    itself is a clean complex resample of the IQ stream
    (scipy resample_poly; linear interpolation shreds content at
    fs/3)."""
    from scipy.signal import firwin, hilbert, lfilter, resample_poly
    from aero_tpu.channelizer import load_ini
    from aero_tpu.runtime.fused_station import FusedStation
    from aero_tpu.models.oqpsk import oqpsk_modulate
    from aero_tpu.protocol.c_framing import build_c_frames

    rng = np.random.default_rng(11)
    cframes = []
    for _ in range(9):
        csus = [append_crc16_bytes(
            bytes([0x30]) + bytes(rng.integers(0, 256, 9,
                                               dtype=np.uint8).tolist()))
            for _ in range(3)]
        voice = bytes(rng.integers(0, 256, 300, dtype=np.uint8).tolist())
        cframes.append((csus, voice))
    audio = oqpsk_modulate(build_c_frames(cframes, lead_frames=4),
                           48000, 8400, freq=8000.0)
    up = 6                                  # 288000 / 48000
    an = hilbert(audio.astype(np.float64))  # USB-only, like the air
    x = np.zeros(len(an) * up, np.complex128)
    x[::up] = an * up
    bb = lfilter(firwin(511, 1.0 / up), 1.0, x)
    t = np.arange(len(bb)) / 288000.0
    wide = (bb * np.exp(2j * np.pi * 96000.0 * t)).astype(np.complex64)
    wide = resample_poly(wide.astype(np.complex128),
                         10000, 10001).astype(np.complex64)   # +100 ppm

    ini = ("[General]\nsample_rate=288000\ncenter_frequency=1545000000\n"
           "[vfos]\nsize=1\n1\\frequency=1545096000\n1\\data_rate=8400\n"
           "1\\topic=C1\n1\\gain=100\n")
    voices = []
    st = FusedStation(load_ini(ini, is_text=True),
                      on_voice=lambda t_, d, hx: voices.append(d))
    w = np.concatenate([wide, np.zeros(2 * st.block_len, np.complex64)])
    for i in range(0, (len(w) // st.block_len) * st.block_len, st.block_len):
        st.process(w[i:i + st.block_len])
    st.flush()
    got = [v for _, v in cframes if v in voices]
    # the scaled carrier sits +9.6 Hz off (beyond the fine span): the
    # wide fold-in must catch it, then the timing loop rides the drift
    assert len(got) >= 6, len(got)


def test_msk_combined_ramp_ppm_phase_noise():
    """All three impairments at once (35 s): the trackers must not fight
    each other — the slope tracker sees a chirp, the timing loop sees
    clock drift, the phase estimator sees a random walk, simultaneously."""
    fields, sig = _msk_stream(30)
    x = impair(sig, 24000, cfo0=-500.0, ramp=40.0, ppm=60.0, pn=0.003)
    rec = _run_msk(fields, x)
    assert len(rec) >= 26, (len(rec), sorted(set(range(30)) - set(rec)))


# ---- burst (R/T) path under combined impairments --------------------

def test_burst_r_under_ramp_ppm_phase_noise():
    """R bursts spread over ~60 s with a CFO ramp sweeping the burst-to-
    burst carrier, 100 ppm clock offset and phase noise all at once.
    The stateless window demod re-estimates CFO per burst, so a ramp
    that would break a continuous tracker only moves each burst's
    operating point."""
    from aero_tpu.models.burst_msk import BurstMskDemodulator
    from aero_tpu.models.msk import msk_modulate
    from aero_tpu.protocol.rt_framing import RTChannelFramer, build_r_burst

    fs, fb = 12000.0, 600.0
    info = (bytes([0x1B, 0x28, 0x0A, 0x0B, 0x0C, 0x77]) + b"IMPAIRED BST"
            ).ljust(17, b"\0")[:17]
    burst = msk_modulate(build_r_burst(info, preamble_bits=96),
                         fs, fb, freq=2600.0, amplitude=0.3)
    rng = np.random.default_rng(3)
    parts = [np.zeros(20000, np.float32)]
    n_bursts = 14
    for _ in range(n_bursts):
        parts += [burst, np.zeros(40000, np.float32)]
    sig = np.concatenate(parts)            # ~60 s
    p = np.mean(burst ** 2)
    sig = sig + rng.normal(0, np.sqrt(p / 10 ** 1.0),   # 10 dB full-band
                           len(sig)).astype(np.float32)
    x = impair(sig, fs, cfo0=-100.0, ramp=4.0, ppm=100.0, pn=0.003,
               seed=11)                    # sweeps ~+140 Hz across bursts

    dm = BurstMskDemodulator(fs, fb)
    fr = RTChannelFramer()
    kinds = []
    for i in range(0, (len(x) // 16000) * 16000, 16000):
        for o in dm.process(x[i:i + 16000]):
            if o["burst"]:
                kinds += [e.kind for e in fr.feed(o["soft_bits"])]
    assert kinds.count("R") >= 12, kinds
