#!/usr/bin/env python3
"""Compare two jsondump/jaero streams message-by-message.

The parity test the reference's README TODO never implemented
("compare messages between JAERO and aero-decode ... we aren't losing any
data", ref README.md:33).  Reads two files of JSON lines, matches messages
on (AES, GES, label, text) and reports coverage both ways.

Usage: python tools/frame_diff.py ours.jsonl theirs.jsonl
"""

import json
import sys


def _key(line: str):
    """Normalized match key for one output line, either format.

    jsondump nests aes/ges under isu.src/isu.dst by link direction
    (ref: decode/output.cpp:38-107); the jaero flat format carries
    AESID/GESID/LABEL/REG but NO message text (ref: output.cpp:107-127).
    Both normalize to (aes, ges, label, reg, text) with text=None when
    the format cannot express it — comparisons drop the text field when
    either side lacks it (see ``keys_comparable``).
    """
    try:
        j = json.loads(line)
    except json.JSONDecodeError:
        return None

    def norm_reg(r):
        return (r or "").lstrip(".").upper()

    if "isu" in j:                      # jsondump
        isu = j["isu"]
        acars = isu.get("acars", {})
        aes = ges = ""
        for side in ("src", "dst"):
            ent = isu.get(side, {})
            if "Aircraft" in ent.get("type", ""):
                aes = ent.get("addr", "")
            else:
                ges = ent.get("addr", "")
        return (aes.upper(), ges.upper(), acars.get("label", ""),
                norm_reg(acars.get("reg", "")),
                acars.get("msg_text", ""))
    if "AESID" in j:                    # jaero flat format
        return (str(j.get("AESID", "")).upper(),
                str(j.get("GESID", "")).upper(),
                j.get("LABEL", ""), norm_reg(j.get("REG", "")), None)
    return None


def keys_comparable(keys_a, keys_b):
    """Reduce two key sets to a mutually-comparable form: when either
    side has any text-less (jaero) key, drop text from both."""
    flat = any(k[-1] is None for k in keys_a) or \
        any(k[-1] is None for k in keys_b)
    if flat:
        return {k[:-1] for k in keys_a}, {k[:-1] for k in keys_b}
    return set(keys_a), set(keys_b)


def load(path):
    out = []
    with open(path) as f:
        for line in f:
            k = _key(line.strip())
            if k:
                out.append(k)
    return out


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    a = load(sys.argv[1])
    b = load(sys.argv[2])
    sa, sb = keys_comparable(a, b)
    both = sa & sb
    print(f"{sys.argv[1]}: {len(a)} messages ({len(sa)} unique)")
    print(f"{sys.argv[2]}: {len(b)} messages ({len(sb)} unique)")
    pa = 100.0 * len(both) / max(1, len(sb))
    pb = 100.0 * len(both) / max(1, len(sa))
    print(f"coverage: {len(both)} common; "
          f"{pa:.1f}% of {sys.argv[2]} present in {sys.argv[1]}; "
          f"{pb:.1f}% vice versa")
    for k in sorted(sb - sa)[:20]:
        print("  missing from ours:", k)
    for k in sorted(sa - sb)[:20]:
        print("  extra in ours:", k)
    return 0 if sb <= sa else 1


if __name__ == "__main__":
    sys.exit(main())
