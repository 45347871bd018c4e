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
    try:
        j = json.loads(line)
    except json.JSONDecodeError:
        return None
    if "isu" in j:                      # jsondump
        acars = j["isu"].get("acars", {})
        src = j["isu"].get("src", {}).get("addr", "")
        dst = j["isu"].get("dst", {}).get("addr", "")
        return (src, dst, acars.get("label", ""), acars.get("reg", ""),
                acars.get("msg_text", ""))
    if "AESID" in j:                    # jaero format
        return (j.get("AESID", ""), j.get("GESID", ""), j.get("LABEL", ""),
                j.get("REG", ""), "")
    return None


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
    sa, sb = set(a), set(b)
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
