#!/usr/bin/env python3
"""Publish audio in the aero wire format over ZMQ: a WAV/raw-PCM file,
stdin, or a LIVE audio capture device.

Equivalent of the reference's PyQt5 audio-publisher test harness
(ref: tools/audio-publisher:76-132), including its device-capture mode
(the reference records a QtMultimedia input at 48 kHz S16LE mono): pass
``dev:<name>`` (e.g. ``dev:default``, ``dev:pulse-monitor-name``) as the
input and the first available capture backend is used — the
``sounddevice`` module, ``arecord`` (ALSA), or ``parec`` (PulseAudio).
Streams so aero-decode (ours or the reference's) can be driven without
an SDR.  Wire format: [topic][uint32le rate][payload]
(ref: tools/audio-publisher:125-129).

Usage:
  python tools/audio_publisher.py capture.wav --topic VFO1 \
      --bind tcp://*:5555 [--realtime]
  python tools/audio_publisher.py dev:default --rate 48000 --topic VFO1
"""

import argparse
import shutil
import struct
import subprocess
import sys
import time
import wave


def capture_stream(device: str, rate: int, chunk_frames: int):
    """Yield s16le mono byte chunks from a live capture device.

    Backends, first available wins: python-sounddevice, arecord (ALSA),
    parec (PulseAudio).  Raises RuntimeError when none is usable so the
    CLI can report exactly what is missing (this harness environment has
    no audio stack; on a workstation any of the three will be present).
    """
    stream = None
    try:
        import sounddevice  # noqa: PLC0415

        # any failure to OPEN the stream (module present but PortAudio
        # has no usable device, bad device name, ...) falls back to the
        # subprocess backends; errors after capture starts propagate
        stream = sounddevice.RawInputStream(
            samplerate=rate, channels=1, dtype="int16",
            device=None if device in ("", "default") else device,
            blocksize=chunk_frames)
        stream.start()
    except Exception:                              # noqa: BLE001
        stream = None
    if stream is not None:
        with stream:
            while True:
                data, _overflowed = stream.read(chunk_frames)
                yield bytes(data)

    if shutil.which("arecord"):
        cmd = ["arecord", "-q", "-f", "S16_LE", "-c", "1", "-r", str(rate),
               "-t", "raw"]
        if device not in ("", "default"):
            cmd += ["-D", device]
    elif shutil.which("parec"):
        cmd = ["parec", "--format=s16le", "--channels=1",
               f"--rate={rate}", "--raw"]
        if device not in ("", "default"):
            cmd += [f"--device={device}"]
    else:
        raise RuntimeError(
            "no audio capture backend: install python-sounddevice, "
            "alsa-utils (arecord), or pulseaudio-utils (parec)")
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE)
    try:
        nbytes = chunk_frames * 2
        while True:
            data = proc.stdout.read(nbytes)
            if not data:
                return
            yield data
    finally:
        proc.terminate()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input", help="WAV file, raw s16le file, or '-' for stdin")
    ap.add_argument("--topic", default="VFO1")
    ap.add_argument("--bind", default="tcp://*:5555")
    ap.add_argument("--rate", type=int, default=48000,
                    help="sample rate for raw/stdin input")
    ap.add_argument("--chunk-ms", type=int, default=100)
    ap.add_argument("--realtime", action="store_true",
                    help="pace output at the sample rate")
    ap.add_argument("--loop", action="store_true")
    ap.add_argument("--legacy-topic-len5", action="store_true")
    ap.add_argument("--record", default=None, metavar="WAV",
                    help="also tee everything published to this WAV file "
                         "(s16le mono) — produces the capture half of a "
                         "parity fixture while the reference decodes the "
                         "live stream (tools/parity_check.py, README)")
    args = ap.parse_args()

    import zmq
    ctx = zmq.Context.instance()
    sock = ctx.socket(zmq.PUB)
    sock.bind(args.bind)
    time.sleep(0.3)

    rec = {"w": None, "rate": None}

    def send(rate, payload):
        t = args.topic.encode()
        if args.legacy_topic_len5:
            t = (t + b"\x00" * 5)[:5]
        sock.send(t, zmq.SNDMORE)
        sock.send(struct.pack("<I", rate), zmq.SNDMORE)
        sock.send(payload)
        if args.record:
            if rec["w"] is None:
                rec["w"] = wave.open(args.record, "wb")
                rec["w"].setnchannels(1)
                rec["w"].setsampwidth(2)
                rec["w"].setframerate(rate)
                rec["rate"] = rate
            rec["w"].writeframes(payload)

    try:
        _pump(args, send)
    finally:
        if rec["w"] is not None:
            rec["w"].close()


def _pump(args, send):
    while True:
        if args.input.startswith("dev:"):
            rate = args.rate
            chunk = int(rate * args.chunk_ms / 1000)
            for data in capture_stream(args.input[4:], rate, chunk):
                send(rate, data)       # capture is inherently real time
            return
        if args.input == "-":
            rate = args.rate
            chunk = int(rate * args.chunk_ms / 1000) * 2
            while True:
                data = sys.stdin.buffer.read(chunk)
                if not data:
                    return
                send(rate, data)
                if args.realtime:
                    time.sleep(args.chunk_ms / 1000)
        elif args.input.endswith(".wav"):
            with wave.open(args.input, "rb") as w:
                rate = w.getframerate()
                chunk = int(rate * args.chunk_ms / 1000)
                while True:
                    data = w.readframes(chunk)
                    if not data:
                        break
                    send(rate, data)
                    if args.realtime:
                        time.sleep(args.chunk_ms / 1000)
        else:
            rate = args.rate
            chunk = int(rate * args.chunk_ms / 1000) * 2
            with open(args.input, "rb") as f:
                while True:
                    data = f.read(chunk)
                    if not data:
                        break
                    send(rate, data)
                    if args.realtime:
                        time.sleep(args.chunk_ms / 1000)
        if not args.loop:
            return


if __name__ == "__main__":
    main()
