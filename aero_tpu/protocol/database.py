"""Aircraft-registration database lookup (stub, like the reference).

The reference deliberately stubbed JAERO's aircraft DB out
(ref: decode/databasetext.cpp:42-61 — request() always answers "not found";
its README TODO says "Cut out plane registration database code").  The
schema enum is retained (ref: decode/databasetext.h:36-44) and the hook is
still called before the final ACARS emission so a real DB can be dropped in.
"""

from __future__ import annotations

from typing import Callable

DATABASE_SCHEMA = (
    "ICAO24", "Registration", "Manufacturer", "ICAOTypeCode", "Type",
    "RegisteredOwners",
)


class DataBaseTextUser:
    """Async-lookalike lookup; the stub answers immediately and empty."""

    def __init__(self, on_result: Callable | None = None):
        self.on_result = on_result or (lambda ok, ref, result: None)
        self._refcount = 0
        self._userdata = {}

    def request(self, dirname: str, aes_hex: str, userdata=None) -> int:
        self._refcount += 1
        ref = self._refcount
        self._userdata[ref] = userdata
        # stub: immediately report not-found (ref: databasetext.cpp:42-61)
        self.on_result(False, ref, [])
        return ref

    def get_userdata(self, ref: int):
        return self._userdata.pop(ref, None)
