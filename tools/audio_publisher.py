#!/usr/bin/env python3
"""Publish a WAV/raw-PCM file (or stdin) in the aero wire format over ZMQ.

Equivalent of the reference's PyQt5 audio-publisher test harness
(ref: tools/audio-publisher:76-132) without the Qt audio-device capture:
streams recorded audio so aero-decode (ours or the reference's) can be
driven without an SDR.  Wire format: [topic][uint32le rate][payload]
(ref: tools/audio-publisher:125-129).

Usage:
  python tools/audio_publisher.py capture.wav --topic VFO1 \
      --bind tcp://*:5555 [--realtime]
"""

import argparse
import struct
import sys
import time
import wave


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
    args = ap.parse_args()

    import zmq
    ctx = zmq.Context.instance()
    sock = ctx.socket(zmq.PUB)
    sock.bind(args.bind)
    time.sleep(0.3)

    def send(rate, payload):
        t = args.topic.encode()
        if args.legacy_topic_len5:
            t = (t + b"\x00" * 5)[:5]
        sock.send(t, zmq.SNDMORE)
        sock.send(struct.pack("<I", rate), zmq.SNDMORE)
        sock.send(payload)

    while True:
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
