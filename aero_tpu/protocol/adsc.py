"""ADS-C (FANS-1/A Automatic Dependent Surveillance - Contract) decoding.

The reference forwards ADS-C payloads to libacars
(`la_acars_decode_apps`, ref: decode/decode.cpp:50-58).  aero-tpu decodes
them natively.  Wire picture (ARINC 622 ATS envelope, see acars_apps):

    /<ground addr>.ADS.<air reg><hex payload><4 hex CRC chars>

The binary payload is a concatenation of tagged groups (DO-258A).  Each
group is a 1-byte tag followed by a fixed-size body; field widths and
LSBs below follow DO-258A as implemented by libacars' adsc decoder:

  latitude / longitude   21-bit two's complement, LSB 180/2^20 deg
  altitude               16-bit two's complement, LSB 4 ft
  timestamp              15 bits, LSB 0.125 s (seconds within the hour)
  figure of merit        redundancy(1) accuracy(3) tcas(1) + 2 spare
  true track / heading   12 bits, LSB 360/4096 deg
  ground speed           13 bits, LSB 0.5 kt
  mach                   13 bits, LSB 0.0005
  vertical rate          12-bit two's complement, LSB 16 ft/min
  wind speed             9 bits, LSB 0.5 kt
  wind direction         9 bits, LSB 360/512 deg
  temperature            12-bit two's complement, LSB 0.25 deg C
  flight id              8 x 6-bit ICAO chars

Unknown or partially-understood groups degrade to a hex dump instead of
failing the whole message; the decoder never raises on malformed input.
Synthetic encoders for every decoded group live alongside so the format
is round-trip tested (tests/test_acars_apps.py) — the reference has no
oracle for this layer either (its only oracle is a live satellite).
"""

from __future__ import annotations

from .bitio import BitReader, BitWriter

LAT_LSB = 180.0 / (1 << 20)
TRACK_LSB = 360.0 / 4096.0
WINDDIR_LSB = 360.0 / 512.0

# downlink group tags (air -> ground, seen on the R/T burst channels)
DOWNLINK_TAGS = {
    3: "ack",
    4: "nak",
    5: "noncompliance_notification",
    6: "cancel_emergency_mode",
    7: "basic_report",
    9: "emergency_basic_report",
    10: "lateral_deviation_change_event",
    12: "flight_id",
    13: "predicted_route",
    14: "earth_ref",
    15: "air_ref",
    16: "meteo",
    17: "airframe_id",
    18: "vertical_rate_change_event",
    19: "altitude_range_change_event",
    20: "waypoint_change_event",
    22: "intermediate_projected_intent",
    23: "fixed_projected_intent",
}

# uplink group tags (ground -> air contract requests, seen on P channel)
UPLINK_TAGS = {
    1: "cancel_all_contracts",
    2: "cancel_contract",
    7: "periodic_contract_request",
    8: "event_contract_request",
    9: "emergency_periodic_contract_request",
    10: "cancel_emergency_mode",
}

ACCURACY = {
    0: "no FOM available",
    1: "<30 nm",
    2: "<15 nm",
    3: "<8 nm",
    4: "<4 nm",
    5: "<1 nm",
    6: "<0.25 nm",
    7: "<0.05 nm",
}


def _sixbit_chars(r: BitReader, n: int) -> str:
    """ICAO 6-bit character set: 1..26 -> A..Z, 0x20..0x3F -> itself."""
    out = []
    for _ in range(n):
        v = r.read(6)
        out.append(chr(v + 0x40) if v < 0x20 else chr(v))
    return "".join(out).strip()


def _basic_report(r: BitReader) -> dict:
    lat = r.read_signed(21) * LAT_LSB
    lon = r.read_signed(21) * LAT_LSB
    alt = r.read_signed(16) * 4
    ts = r.read(15) * 0.125
    red = r.read(1)
    acc = r.read(3)
    tcas = r.read(1)
    r.skip(2)
    return {
        "lat": round(lat, 7), "lon": round(lon, 7), "alt_ft": alt,
        "timestamp_s": ts,
        "nav_redundancy_ok": bool(red),
        "accuracy": ACCURACY[acc],
        "tcas_operational": bool(tcas),
    }


def _flight_id(r: BitReader) -> dict:
    return {"flight_id": _sixbit_chars(r, 8)}


def _earth_ref(r: BitReader) -> dict:
    trk = r.read(12) * TRACK_LSB
    gs = r.read(13) * 0.5
    vr = r.read_signed(12) * 16
    r.skip(3)
    return {"true_track_deg": round(trk, 2), "gs_kt": gs,
            "vert_rate_fpm": vr}


def _air_ref(r: BitReader) -> dict:
    hdg = r.read(12) * TRACK_LSB
    mach = r.read(13) * 0.0005
    vr = r.read_signed(12) * 16
    r.skip(3)
    return {"true_heading_deg": round(hdg, 2), "mach": round(mach, 4),
            "vert_rate_fpm": vr}


def _meteo(r: BitReader) -> dict:
    ws = r.read(9) * 0.5
    wd = r.read(9) * WINDDIR_LSB
    temp = r.read_signed(12) * 0.25
    r.skip(2)
    return {"wind_speed_kt": ws, "wind_dir_deg": round(wd, 2),
            "temp_c": temp}


def _airframe_id(r: BitReader) -> dict:
    return {"icao_hex": f"{r.read(24):06X}"}


def _predicted_route(r: BitReader) -> dict:
    nxt = {
        "lat": round(r.read_signed(21) * LAT_LSB, 7),
        "lon": round(r.read_signed(21) * LAT_LSB, 7),
        "alt_ft": r.read_signed(16) * 4,
        "eta_s": r.read(14),
    }
    nxt1 = {
        "lat": round(r.read_signed(21) * LAT_LSB, 7),
        "lon": round(r.read_signed(21) * LAT_LSB, 7),
        "alt_ft": r.read_signed(16) * 4,
    }
    r.skip(6)
    return {"next_waypoint": nxt, "next_plus_one": nxt1}


def _fixed_intent(r: BitReader) -> dict:
    out = {
        "lat": round(r.read_signed(21) * LAT_LSB, 7),
        "lon": round(r.read_signed(21) * LAT_LSB, 7),
        "alt_ft": r.read_signed(16) * 4,
    }
    r.skip(6)
    return out


def _intermediate_intent(r: BitReader) -> dict:
    """Sequence of {distance, track, altitude} points, 6 bytes each,
    running to the end of the group payload (the group is last-in-message
    by convention)."""
    pts = []
    while r.bits_left >= 48:
        pts.append({
            "distance_nm": r.read(16) * 0.125,
            "track_deg": round(r.read(12) * TRACK_LSB, 2),
            "alt_ft": r.read_signed(16) * 4,
        })
        r.skip(4)
    return {"points": pts}


# tag -> (body size in bytes, parser).  None size = variable (to end).
_DOWNLINK_PARSERS = {
    3: (1, lambda r: {"contract_request_num": r.read(8)}),
    4: (2, lambda r: {"contract_request_num": r.read(8),
                      "reason": r.read(8)}),
    6: (0, lambda r: {}),
    7: (10, _basic_report),
    9: (10, _basic_report),
    10: (10, _basic_report),
    12: (6, _flight_id),
    13: (17, _predicted_route),
    14: (5, _earth_ref),
    15: (5, _air_ref),
    16: (4, _meteo),
    17: (3, _airframe_id),
    18: (10, _basic_report),
    19: (10, _basic_report),
    20: (10, _basic_report),
    22: (None, _intermediate_intent),
    23: (8, _fixed_intent),
}

_UPLINK_PARSERS = {
    1: (0, lambda r: {}),
    2: (1, lambda r: {"contract_num": r.read(8)}),
    10: (0, lambda r: {}),
}


def decode(payload: bytes, downlink: bool = True) -> dict:
    """Decode an ADS-C binary payload (CRC already stripped by the ARINC
    622 envelope layer) into {"adsc": {"groups": [...], ...}}."""
    tags = DOWNLINK_TAGS if downlink else UPLINK_TAGS
    parsers = _DOWNLINK_PARSERS if downlink else _UPLINK_PARSERS
    groups = []
    err = False
    buf = memoryview(payload)
    i = 0
    while i < len(buf):
        tag = buf[i]
        i += 1
        name = tags.get(tag, f"tag_{tag}")
        size, fn = parsers.get(tag, (None, None))
        if fn is None:
            # unknown group: geometry unknowable, dump the rest
            groups.append({"group": name, "tag": tag,
                           "raw_hex": bytes(buf[i:]).hex().upper()})
            err = tag not in tags
            break
        body = bytes(buf[i:]) if size is None else bytes(buf[i:i + size])
        if size is not None and len(body) < size:
            groups.append({"group": name, "tag": tag, "truncated": True,
                           "raw_hex": body.hex().upper()})
            err = True
            break
        try:
            fields = fn(BitReader(body))
        except EOFError:
            groups.append({"group": name, "tag": tag, "truncated": True,
                           "raw_hex": body.hex().upper()})
            err = True
            break
        groups.append({"group": name, "tag": tag, **fields})
        i += len(body) if size is None else size
    out: dict = {"groups": groups}
    if err:
        out["decode_error"] = True
    return {"adsc": out}


# ---------------------------------------------------------------- encoders
# Synthetic builders used by the round-trip tests (and by anyone who wants
# to exercise a ground station end-to-end without an aircraft).

def encode_basic_report(lat: float, lon: float, alt_ft: int,
                        timestamp_s: float, redundancy=True, accuracy=7,
                        tcas=True, tag: int = 7) -> bytes:
    w = BitWriter()
    w.write(tag, 8)
    w.write_signed(round(lat / LAT_LSB), 21)
    w.write_signed(round(lon / LAT_LSB), 21)
    w.write_signed(alt_ft // 4, 16)
    w.write(round(timestamp_s / 0.125), 15)
    w.write(int(redundancy), 1)
    w.write(accuracy, 3)
    w.write(int(tcas), 1)
    w.write(0, 2)
    return w.to_bytes()


def encode_flight_id(flight: str) -> bytes:
    w = BitWriter()
    w.write(12, 8)
    s = flight.upper().ljust(8)[:8]
    for ch in s:
        v = ord(ch)
        w.write(v - 0x40 if 0x41 <= v <= 0x5A else v & 0x3F, 6)
    return w.to_bytes()


def encode_earth_ref(track_deg: float, gs_kt: float,
                     vert_rate_fpm: int) -> bytes:
    w = BitWriter()
    w.write(14, 8)
    w.write(round(track_deg / TRACK_LSB) % 4096, 12)
    w.write(round(gs_kt / 0.5), 13)
    w.write_signed(vert_rate_fpm // 16, 12)
    w.write(0, 3)
    return w.to_bytes()


def encode_air_ref(heading_deg: float, mach: float,
                   vert_rate_fpm: int) -> bytes:
    w = BitWriter()
    w.write(15, 8)
    w.write(round(heading_deg / TRACK_LSB) % 4096, 12)
    w.write(round(mach / 0.0005), 13)
    w.write_signed(vert_rate_fpm // 16, 12)
    w.write(0, 3)
    return w.to_bytes()


def encode_meteo(wind_speed_kt: float, wind_dir_deg: float,
                 temp_c: float) -> bytes:
    w = BitWriter()
    w.write(16, 8)
    w.write(round(wind_speed_kt / 0.5), 9)
    w.write(round(wind_dir_deg / WINDDIR_LSB) % 512, 9)
    w.write_signed(round(temp_c / 0.25), 12)
    w.write(0, 2)
    return w.to_bytes()


def encode_airframe_id(icao_hex: str) -> bytes:
    w = BitWriter()
    w.write(17, 8)
    w.write(int(icao_hex, 16), 24)
    return w.to_bytes()


def encode_predicted_route(next_wp: dict, next_plus_one: dict) -> bytes:
    w = BitWriter()
    w.write(13, 8)
    w.write_signed(round(next_wp["lat"] / LAT_LSB), 21)
    w.write_signed(round(next_wp["lon"] / LAT_LSB), 21)
    w.write_signed(next_wp["alt_ft"] // 4, 16)
    w.write(next_wp["eta_s"], 14)
    w.write_signed(round(next_plus_one["lat"] / LAT_LSB), 21)
    w.write_signed(round(next_plus_one["lon"] / LAT_LSB), 21)
    w.write_signed(next_plus_one["alt_ft"] // 4, 16)
    w.write(0, 6)
    return w.to_bytes()


def encode_ack(contract_request_num: int) -> bytes:
    return bytes([3, contract_request_num & 0xFF])
