"""SoapySDR ingest adapter tests via an injected fake backend (no
hardware in CI; the adapter mirrors publish/publisher.cpp:27-38,234-283)."""

import types

import numpy as np


class _FakeStreamResult:
    def __init__(self, ret):
        self.ret = ret


class _FakeDevice:
    def __init__(self, device_str):
        self.device_str = device_str
        self.calls = []
        self.settings = {}
        self.blocks = []
        self.reads = 0

    def __getattr__(self, name):
        if name.startswith("set") or name in ("activateStream",
                                              "deactivateStream",
                                              "closeStream"):
            def rec(*a, **k):
                self.calls.append((name, a))
            return rec
        raise AttributeError(name)

    def writeSetting(self, key, val):
        self.settings[key] = val

    def setupStream(self, rx, fmt, chans, args):
        self.stream_args = args
        return "stream"

    def readStream(self, stream, bufs, n, timeoutUs=0):
        if self.reads >= len(self.blocks):
            return _FakeStreamResult(-1)
        blk = self.blocks[self.reads]
        bufs[0][:len(blk)] = blk
        self.reads += 1
        return _FakeStreamResult(len(blk))


def _fake_module():
    m = types.SimpleNamespace()
    m.SOAPY_SDR_RX = 1
    m.SOAPY_SDR_CF32 = "CF32"
    m.devices = []

    def Device(s):
        d = _FakeDevice(s)
        m.devices.append(d)
        return d

    m.Device = Device
    return m


def test_soapy_reader_configures_like_reference():
    from aero_tpu.io import sdr
    fake = _fake_module()
    sdr.set_backend(fake)
    try:
        rdr = sdr.SoapyReader("driver=rtlsdr", fs=1536000,
                              center_freq=1545100000, buflen_complex=1024,
                              enable_biast=True, enable_dcc=True)
        dev = fake.devices[0]
        names = [c[0] for c in dev.calls]
        # gain mode, gain 496, freq, rate, dc-offset (publisher.cpp:33-37)
        assert names[:5] == ["setGainMode", "setGain", "setFrequency",
                             "setSampleRate", "setDCOffsetMode"]
        assert dev.calls[1][1][2] == 496.0
        assert dev.calls[2][1][2] == 1545100000.0
        assert dev.settings["biastee"] == "true"
        assert dev.stream_args == {"buffers": "24", "bufflen": "2048"}

        dev.blocks = [np.full(1024, 1 + 1j, np.complex64),
                      np.full(512, 2 - 2j, np.complex64)]
        got = list(rdr)
        assert len(got) == 2
        assert got[0].shape == (1024,)
        assert got[1].shape == (512,)
        np.testing.assert_array_equal(got[1],
                                      np.full(512, 2 - 2j, np.complex64))
        rdr.close()
        assert dev.settings["biastee"] == "false"   # publisher.cpp:49
    finally:
        sdr.set_backend(None)
        sdr._backend = None


def test_publish_main_device_without_binding_errors_cleanly(tmp_path):
    import subprocess
    import sys
    import os
    ini = tmp_path / "s.ini"
    ini.write_text("""
sample_rate=288000
center_frequency=1545000000
main_vfos/size=1
main_vfos/1/frequency=1545000000
main_vfos/1/bandwidth=144000
vfos/size=0
""")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo)
    r = subprocess.run(
        [sys.executable, "-m", "aero_tpu.runtime.publish_main",
         "-c", str(ini), "-d", "driver=rtlsdr", "--platform", "cpu"],
        capture_output=True, text=True, env=env, cwd=repo, timeout=120)
    assert r.returncode == 2
    assert "SoapySDR" in r.stderr
