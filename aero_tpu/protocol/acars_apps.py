"""ACARS application-layer decoding (libacars-equivalent subset).

The reference shells out to libacars-2: it strips the sublabel/MFI for
uplinks (la_acars_extract_sublabel_and_mfi, ref: decode/decode.cpp:33-45)
and merges `la_acars_decode_apps`' JSON tree into ``ACARSItem.parsed``
(ref: decode.cpp:50-58), which the jsondump output embeds.

This module implements the commonly-seen subset natively:

- sublabel / MFI extraction ("#<sublabel><MFI>..." uplink prefixes)
- ARINC 622 ATS envelope detection (CPDLC "/<ground>.AT1...", ADS-C
  ".ADS...", AFN "/<ground>.AFN...") with CRC check of the hex tail
- Media Advisory (label SA) decode
- OOOI event labels (QA..QD etc.)

Unknown applications pass through untouched — exactly what the reference
does when libacars has no decoder.
"""

from __future__ import annotations

import re

# label -> OOOI event (subset of the conventional assignments)
_OOOI = {"QA": "out", "QB": "off", "QC": "on", "QD": "in"}

_ARINC622_IMIS = ("AT1", "CR1", "CC1", "DR1", "AFN", "ADS", "DIS")


def extract_sublabel_mfi(label: str, text: str):
    """Uplink messages may carry '#<2-char sublabel><2-char MFI>' at the
    start of the text (ref libacars semantics used at decode.cpp:33-45).

    Returns (sublabel, mfi, remaining_text)."""
    m = re.match(r"^#([0-9A-Z]{2})([0-9A-Z]{2})?", text or "")
    if not m:
        return "", "", text
    sublabel = m.group(1)
    mfi = m.group(2) or ""
    return sublabel, mfi, text[m.end():]


def _crc16_arinc(data: bytes) -> int:
    """CRC-16/CCITT-reversed as used by ARINC 622 ATS messages."""
    crc = 0xFFFF
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ 0x8408 if crc & 1 else crc >> 1
    return crc ^ 0xFFFF


def decode_arinc622(text: str) -> dict | None:
    """Detect an ARINC 622 ATS envelope: '/<addr>.<IMI><payload>[crc4hex]'.

    Returns {"arinc622": {...}} or None.
    """
    m = re.match(r"^/([A-Z0-9]{4,7})\.([A-Z0-9]{2,3})(.*)$", text or "",
                 re.DOTALL)
    if not m:
        return None
    gnd, imi, rest = m.groups()
    if imi not in _ARINC622_IMIS:
        return None
    out = {"gs_addr": gnd, "imi": imi}
    if len(rest) >= 4 and re.fullmatch(r".*[0-9A-F]{4}", rest[-4:] or ""):
        body, crc_hex = rest[:-4], rest[-4:]
        calc = _crc16_arinc((gnd + "." + imi + body).encode("latin-1"))
        out["crc_ok"] = f"{calc:04X}" == crc_hex
        out["payload_hex"] = body.encode("latin-1", "replace").hex().upper()
    else:
        out["payload"] = rest
    app = {"AT1": "cpdlc", "CR1": "cpdlc", "CC1": "cpdlc", "DR1": "cpdlc",
           "AFN": "afn", "ADS": "ads-c", "DIS": "ads-c"}.get(imi, "unknown")
    return {"arinc622": out, "app": app}


def decode_media_advisory(text: str) -> dict | None:
    """Label SA media advisory: '0<E|L>V<version..>/<links>' style."""
    m = re.match(r"^(\d)([EL])([0-9A-Z])(\d{6})([VSHGCM2XIA]+)", text or "")
    if not m:
        return None
    ver, el, link, t, links = m.groups()
    return {"media_advisory": {
        "version": ver,
        "state": "established" if el == "E" else "lost",
        "current_link": link,
        "time": f"{t[0:2]}:{t[2:4]}:{t[4:6]}",
        "available_links": list(links),
    }}


def decode_apps(label: str, text: str, downlink: bool) -> dict:
    """Returns a dict to merge into ACARSItem.parsed (may be empty)."""
    parsed: dict = {}
    body = text or ""
    if not downlink:
        sublabel, mfi, body = extract_sublabel_mfi(label, body)
        if sublabel:
            parsed["sublabel"] = sublabel
        if mfi:
            parsed["mfi"] = mfi
    if label in _OOOI:
        parsed["oooi_event"] = _OOOI[label]
    if label == "SA":
        adv = decode_media_advisory(body)
        if adv:
            parsed.update(adv)
    a622 = decode_arinc622(body)
    if a622:
        parsed.update(a622)
    return parsed


def enrich(item) -> None:
    """Populate item.parsed in place (the forwarder-thread hook,
    ref decode.cpp:368-416 calls libacarsDecode per item)."""
    if item.nonacars or not item.message:
        return
    label = item.LABEL.decode("latin-1") if isinstance(item.LABEL, bytes) \
        else str(item.LABEL)
    parsed = decode_apps(label, item.message, item.downlink)
    if parsed:
        item.parsed.update(parsed)
