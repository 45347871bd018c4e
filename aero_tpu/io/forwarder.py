"""TCP/UDP forwarders for decoded frames.

Behavioral equivalent of ForwardTarget (ref: decode/forwarder.cpp):
``FMT=URL`` spec parsing (tcp/udp only, :136-184), plain sockets with one
reconnect-and-retry (:109-134), newline-terminated frames
(ref: decode.cpp:408).
"""

from __future__ import annotations

import socket
from dataclasses import dataclass
from urllib.parse import urlparse

FORMATS = ("jaero", "jsondump", "text")


@dataclass
class ForwardSpec:
    fmt: str
    scheme: str
    host: str
    port: int


def parse_forwarder(spec: str) -> ForwardSpec:
    """Parse 'FMT=URL' (e.g. 'jsondump=tcp://feed.example.org:5571')."""
    fmt, _, url = spec.partition("=")
    fmt = fmt.strip().lower()
    if fmt not in FORMATS:
        raise ValueError(f"unknown forward format {fmt!r} (use {FORMATS})")
    u = urlparse(url.strip())
    if u.scheme not in ("tcp", "udp"):
        raise ValueError(f"unsupported scheme {u.scheme!r} (tcp/udp only)")
    if not u.hostname or not u.port:
        raise ValueError(f"bad forward URL {url!r}")
    return ForwardSpec(fmt, u.scheme, u.hostname, u.port)


class ForwardTarget:
    def __init__(self, spec: ForwardSpec):
        self.spec = spec
        self.sock: socket.socket | None = None

    def _connect(self):
        infos = socket.getaddrinfo(
            self.spec.host, self.spec.port,
            type=(socket.SOCK_STREAM if self.spec.scheme == "tcp"
                  else socket.SOCK_DGRAM))
        family, stype, proto, _, addr = infos[0]
        s = socket.socket(family, stype, proto)
        s.settimeout(5.0)
        s.connect(addr)
        self.sock = s

    def send(self, line: str) -> bool:
        """Send one newline-terminated frame; reconnect and retry once
        (ref: forwarder.cpp:109-134)."""
        data = (line + "\n").encode()
        for attempt in range(2):
            try:
                if self.sock is None:
                    self._connect()
                self.sock.sendall(data)
                return True
            except OSError:
                try:
                    if self.sock:
                        self.sock.close()
                except OSError:
                    pass
                self.sock = None
        return False

    def close(self):
        if self.sock:
            try:
                self.sock.close()
            except OSError:
                pass
            self.sock = None
