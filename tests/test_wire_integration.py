"""Process-boundary integration: publisher -> ZMQ -> decoder runtime."""

import threading
import time

import numpy as np
import pytest


def test_zmq_publisher_to_decoder():
    zmq = pytest.importorskip("zmq")
    from aero_tpu.io.zmq_transport import ZmqPublisher
    from aero_tpu.runtime.decoder import Decoder, DecoderOptions
    from aero_tpu.models.msk import msk_modulate
    from aero_tpu.protocol.framing import build_p_frames
    from aero_tpu.protocol.crc import append_crc16_bytes
    from aero_tpu.protocol.isu import make_acars_userdata, segment_isu

    ud = make_acars_userdata("2", "N5ZMQ", "!", "H1", "A", "VIA THE WIRE")
    sus = [append_crc16_bytes(b) for b in segment_isu(ud, 0x654321, 0x41)]
    fill = append_crc16_bytes(bytes([0x01] + [0] * 9))
    while len(sus) % 6:
        sus.append(fill)
    fields = [b"".join(sus[i:i + 6]) for i in range(0, len(sus), 6)]
    audio = msk_modulate(build_p_frames(fields, 1200, lead_frames=4),
                         24000, 1200, freq=1000.0)
    pcm = np.clip(np.concatenate([audio, np.zeros(48000, np.float32)])
                  * 32767, -32767, 32767).astype("<i2").tobytes()

    url = "tcp://127.0.0.1:59692"
    dec = Decoder(DecoderOptions(bitrate=1200, no_signal_exit=False))

    done = threading.Event()

    def publish():
        # ZMQ PUB drops frames sent before the SUB is connected, and under a
        # loaded machine the subscribe can land late — so keep replaying the
        # stream (the demod re-locks each pass) until the decode succeeds.
        pub = ZmqPublisher(url, bind=True, legacy_topic_len5=True)
        time.sleep(0.5)
        chunk = 4800 * 2
        for _ in range(12):
            for i in range(0, len(pcm), chunk):
                pub.publish("VFO1", 24000, pcm[i:i + chunk])
            if done.wait(timeout=1.0):
                break
        pub.close()

    t = threading.Thread(target=publish)
    t.start()

    from aero_tpu.io.zmq_transport import ZmqSubscriber
    sub = ZmqSubscriber(url, "VFO1")
    deadline = time.time() + 60
    while time.time() < deadline and not dec.items:
        msg = sub.recv(timeout_ms=200)
        if msg is None:
            if not t.is_alive():
                break
            continue
        _, rate, payload = msg
        dec.feed_audio(payload, rate)
    done.set()
    t.join(timeout=15)
    sub.close()

    assert dec.items, "no ACARS decoded over the wire"
    assert dec.items[0].message == "VIA THE WIRE"
