"""Async forwarder egress (VERDICT r2 item 5): a stalled sink must never
block the decode loop; overflow drops oldest + counts.
Ref: /root/reference/decode/decode.cpp:368-416 (condvar forwarder thread).
"""

import socket
import threading
import time

from aero_tpu.io.forwarder import (AsyncForwardQueue, ForwardTarget,
                                   parse_forwarder)
from aero_tpu.protocol.isu import ACARSItem, ISUItem


def _item(text):
    return ACARSItem(isuitem=ISUItem(AESID=0x123456, GESID=0x41),
                     MODE=ord("2"), TAK=ord("!"), LABEL=b"H1", BI=ord("A"),
                     PLANEREG=b".N1TEST", valid=True, hastext=True,
                     message=text)


class _StalledTarget:
    """send() blocks like a TCP target whose peer never reads."""

    def __init__(self):
        self.spec = parse_forwarder("jsondump=tcp://127.0.0.1:9")
        self.sent = 0

    def send(self, line):
        time.sleep(0.05)
        self.sent += 1
        return True

    def close(self):
        pass


def test_stalled_sink_never_blocks_submit():
    t = _StalledTarget()
    q = AsyncForwardQueue([t], maxsize=16)
    t0 = time.perf_counter()
    for i in range(200):
        q.submit("STA", False, _item(f"MSG {i}"))
    dt = time.perf_counter() - t0
    assert dt < 0.5, f"submit blocked for {dt:.2f}s"
    # 200 items at 20/s into a 16-slot queue: most dropped, oldest first
    assert q.dropped > 100
    assert len(q) <= 16
    q.close()
    assert t.sent + q.dropped + len(q) >= 200 - 1


def test_queue_drains_and_delivers_over_real_tcp():
    received = []
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def reader():
        conn, _ = srv.accept()
        buf = b""
        while b"\n" not in buf or buf.count(b"\n") < 3:
            d = conn.recv(4096)
            if not d:
                break
            buf += d
        received.extend(buf.decode().strip().split("\n"))
        conn.close()

    th = threading.Thread(target=reader, daemon=True)
    th.start()
    tgt = ForwardTarget(parse_forwarder(f"jsondump=tcp://127.0.0.1:{port}"))
    q = AsyncForwardQueue([tgt])
    for i in range(3):
        q.submit("STA", False, _item(f"OVER TCP {i}"))
    assert q.flush(5.0)
    th.join(5.0)
    q.close()
    srv.close()
    assert len(received) == 3
    assert all("OVER TCP" in r for r in received)
    assert q.dropped == 0


def test_decoder_wires_async_queue():
    from aero_tpu.runtime.decoder import Decoder, DecoderOptions
    d = Decoder(DecoderOptions(bitrate=1200,
                               forwarders=["text=udp://127.0.0.1:45678"]))
    assert d.fwd_queue is not None
    d.handle_acars(_item("VIA DECODER"))
    assert d.fwd_queue.flush(5.0)
    d.close()
    assert d.fwd_queue is None


def test_poison_item_does_not_kill_egress():
    """One item whose send raises must not terminate the worker thread:
    later items still go out and the failure is counted."""
    class _Flaky:
        def __init__(self):
            self.spec = parse_forwarder("jsondump=tcp://127.0.0.1:9")
            self.sent = []

        def send(self, line):
            if "POISON" in line:
                raise TypeError("unserializable payload")
            self.sent.append(line)
            return True

        def close(self):
            pass

    t = _Flaky()
    q = AsyncForwardQueue([t], maxsize=16)
    q.submit("ST", False, _item("BEFORE"))
    q.submit("ST", False, _item("POISON"))
    q.submit("ST", False, _item("AFTER"))
    assert q.flush(10.0)
    assert q.errors == 1
    assert any("BEFORE" in s for s in t.sent)
    assert any("AFTER" in s for s in t.sent)
    assert q.sent == 2
    q.close()


def test_one_failing_target_does_not_suppress_others():
    """Per-target format/send isolation (ADVICE r3): an exception raised
    while sending to one target must not prevent delivery to — or
    accounting for — the other targets of the same item."""

    class _Bad:
        def __init__(self):
            self.spec = parse_forwarder("text=tcp://127.0.0.1:9")

        def send(self, line):
            raise TypeError("formatter blew up for this target")

        def close(self):
            pass

    class _Good:
        def __init__(self):
            self.spec = parse_forwarder("jsondump=tcp://127.0.0.1:9")
            self.sent = []

        def send(self, line):
            self.sent.append(line)
            return True

        def close(self):
            pass

    bad, good = _Bad(), _Good()
    q = AsyncForwardQueue([bad, good])
    q.submit("ST", False, _item("MIXED TARGETS"))
    assert q.flush(10.0)
    assert q.errors == 1          # the bad target, exactly once
    assert q.sent == 1            # the item still counts as delivered
    assert any("MIXED TARGETS" in s for s in good.sent)
    q.close()


def test_close_latch_stops_inflight_retry():
    """close() landing while send() is mid-retry must not reopen a socket
    (ADVICE r3: re-check `closed` inside the retry loop)."""
    t = ForwardTarget(parse_forwarder("jsondump=tcp://127.0.0.1:9"))
    connects = []
    orig = t._connect

    def tracking_connect():
        connects.append(1)
        t.close()             # close lands between attempt 1 and attempt 2
        raise OSError("refused")

    t._connect = tracking_connect
    assert t.send("hello") is False
    assert len(connects) == 1     # attempt 2 saw closed and bailed
