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
