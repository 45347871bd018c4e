#!/usr/bin/env python3
"""Generate the synthetic parity fixture (tests/fixtures/).

Synthesizes a 1200 bps P-channel WAV carrying known ACARS messages, then
decodes it and writes the decoded jsondump lines as expected.jsonl —
after VERIFYING every transmitted message text came back, so the
committed fixture is anchored to TX truth.  Real captures drop in next
to it with expected.jsonl taken from aero-decode/JAERO instead
(ref /root/reference/README.md:33).

Usage: python tools/make_fixture.py [outdir]
"""

from __future__ import annotations

import os
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# single-VFO decode paths cannot run on the tunneled axon TPU backend
# (un-vmapped demod steps hit UNIMPLEMENTED) — parity always runs on CPU
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

MESSAGES = [
    (0x4001AA, "VH-ABC", "H1", "PARITY FIXTURE MESSAGE ONE"),
    (0x4002BB, "N425SK", "AA", "MSG TWO: QUICK BROWN FOX 0123456789"),
    (0x4003CC, "C-FPAR", "B6", "THIRD AND FINAL PARITY MESSAGE"),
]


def make(outdir: str, name: str = "synthetic_1200") -> tuple[str, str]:
    from aero_tpu.models.msk import msk_modulate
    from aero_tpu.protocol.framing import build_p_frames
    from aero_tpu.protocol.crc import append_crc16_bytes
    from aero_tpu.protocol.isu import make_acars_userdata, segment_isu
    from aero_tpu.io.output import to_output_format
    from aero_tpu.runtime.decoder import Decoder, DecoderOptions

    fill = append_crc16_bytes(bytes([0x01] + [0] * 9))
    fields = []
    for aes, reg, label, text in MESSAGES:
        ud = make_acars_userdata("2", reg, "!", label, "A", text)
        sus = [append_crc16_bytes(b) for b in segment_isu(ud, aes, 0x41)]
        while len(sus) % 6:
            sus.append(fill)
        fields += [b"".join(sus[i:i + 6]) for i in range(0, len(sus), 6)]
    bits = build_p_frames(fields, 1200, lead_frames=3)
    audio = msk_modulate(bits, 24000, 1200.0, freq=1000.0)
    rng = np.random.default_rng(0)
    audio = audio + rng.normal(0, 0.01, len(audio)).astype(np.float32)

    os.makedirs(outdir, exist_ok=True)
    wav_path = os.path.join(outdir, f"{name}.wav")
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(24000)
        w.writeframes((np.clip(audio, -1, 1) * 32767).astype("<i2")
                      .tobytes())

    import contextlib
    import io as _io
    dec = Decoder(DecoderOptions(bitrate=1200, station_id="FIXTURE"))
    with contextlib.redirect_stdout(_io.StringIO()):
        dec.run_file(wav_path)
    texts = {item.message for item in dec.items}
    for _, _, _, text in MESSAGES:
        assert text in texts, f"TX message not recovered: {text!r}"

    exp_path = os.path.join(outdir, f"{name}.expected.jsonl")
    with open(exp_path, "w") as f:
        for item in dec.items:
            f.write(to_output_format("jsondump", "FIXTURE", False, item)
                    + "\n")
    return wav_path, exp_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures")
    wav, exp = make(out)
    print(f"wrote {wav} and {exp}")
