"""Fixture-driven frame-parity harness (VERDICT r2 item 8; BASELINE's
>= 95% ACARS parity metric).  The shipped synthetic fixture must hit
100%; any real capture fixtures dropped into tests/fixtures/ are picked
up automatically and held to >= 95%."""

import glob
import json
import os

import pytest

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


def _fixtures():
    out = []
    for exp in sorted(glob.glob(os.path.join(FIXDIR, "*.expected.jsonl"))):
        base = exp[: -len(".expected.jsonl")]
        for ext in (".wav", ".cf32", ".raw"):
            if os.path.exists(base + ext):
                out.append((base + ext, exp))
                break
    return out


def _rate_of(path):
    """Bitrate from a fixture name like foo_10500.wav (default 1200)."""
    import re
    m = re.search(r"_(600|1200|8400|10500)\.", os.path.basename(path))
    return int(m.group(1)) if m else 1200


def _run_parity(capture, expected):
    from tools.parity_check import decode_capture, parity
    ini = os.path.splitext(capture)[0] + ".ini"
    ours = decode_capture(capture, bitrate=_rate_of(capture),
                          ini=ini if os.path.exists(ini) else None)
    return parity(ours, expected)


@pytest.mark.parametrize("rate", [1200, 10500])
def test_synthetic_fixture_full_parity(rate):
    cap = os.path.join(FIXDIR, f"synthetic_{rate}.wav")
    exp = os.path.join(FIXDIR, f"synthetic_{rate}.expected.jsonl")
    assert os.path.exists(cap), "run tools/make_fixture.py"
    rep = _run_parity(cap, exp)
    assert rep["parity_pct"] == 100.0, rep
    assert rep["expected"] >= 3


@pytest.mark.parametrize("capture,expected", [
    pytest.param(c, e, id=os.path.basename(c)) for c, e in _fixtures()
    if "synthetic_" not in c
] or [pytest.param(None, None, id="no-real-captures",
                   marks=pytest.mark.skip(
                       reason="no real capture fixtures present — drop "
                              "capture+expected.jsonl into tests/fixtures/ "
                              "(see fixtures/README.md)"))])
def test_real_capture_parity(capture, expected):
    rep = _run_parity(capture, expected)
    assert rep["parity_pct"] >= 95.0, json.dumps(rep)
