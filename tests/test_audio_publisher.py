"""Audio-publisher tool: live-capture backend selection and chunking.

The reference harness records an audio device (PyQt5 QAudioInput,
ref tools/audio-publisher:76-132); our tool's ``dev:`` input does the
same through sounddevice/arecord/parec.  This environment has no audio
stack, so the subprocess backend is exercised with a fake recorder
process and the no-backend error path is checked for a clear message.
"""

import importlib.util
import io
import os
import sys

import pytest

_TOOL = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "audio_publisher.py")
spec = importlib.util.spec_from_file_location("audio_publisher", _TOOL)
ap = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ap)


class _FakeProc:
    def __init__(self, data):
        self.stdout = io.BytesIO(data)
        self.terminated = False

    def terminate(self):
        self.terminated = True


def test_capture_stream_subprocess_chunks(monkeypatch):
    pcm = bytes(range(256)) * 75                 # 19200 B = 9600 frames
    captured_cmd = {}

    def fake_popen(cmd, stdout=None):
        captured_cmd["cmd"] = cmd
        return _FakeProc(pcm)

    monkeypatch.setattr(ap.shutil, "which",
                        lambda name: "/usr/bin/arecord"
                        if name == "arecord" else None)
    monkeypatch.setattr(ap.subprocess, "Popen", fake_popen)

    chunks = list(ap.capture_stream("hw:1,0", 48000, 4800))
    assert b"".join(chunks) == pcm
    assert all(len(c) == 9600 for c in chunks)
    cmd = captured_cmd["cmd"]
    assert cmd[0] == "arecord" and "-D" in cmd and "hw:1,0" in cmd
    assert "48000" in cmd


def test_capture_stream_default_device_omits_selector(monkeypatch):
    captured_cmd = {}
    monkeypatch.setattr(ap.shutil, "which",
                        lambda name: "/usr/bin/parec"
                        if name == "parec" else None)
    monkeypatch.setattr(ap.subprocess, "Popen",
                        lambda cmd, stdout=None: (
                            captured_cmd.update(cmd=cmd), _FakeProc(b""))[1])
    list(ap.capture_stream("default", 12000, 1200))
    cmd = captured_cmd["cmd"]
    assert cmd[0] == "parec" and not any("--device" in c for c in cmd)
    assert "--rate=12000" in cmd


def test_capture_stream_no_backend_errors(monkeypatch):
    if "sounddevice" in sys.modules:
        pytest.skip("sounddevice installed; backend exists")
    monkeypatch.setattr(ap.shutil, "which", lambda name: None)
    with pytest.raises(RuntimeError, match="no audio capture backend"):
        next(ap.capture_stream("default", 48000, 4800))


def test_record_tee_writes_wav(tmp_path):
    """--record tees everything published to a WAV (the capture half of
    a parity fixture; README recipe)."""
    import subprocess
    import wave as wavemod
    import numpy as np

    wav_in = tmp_path / "in.wav"
    rec = tmp_path / "rec.wav"
    pcm = (np.sin(2 * np.pi * 1000 * np.arange(4800) / 48000)
           * 20000).astype("<i2")
    with wavemod.open(str(wav_in), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(48000)
        w.writeframes(pcm.tobytes())

    r = subprocess.run(
        [sys.executable, _TOOL, str(wav_in),
         "--bind", "tcp://127.0.0.1:0", "--record", str(rec)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    with wavemod.open(str(rec), "rb") as w:
        assert w.getframerate() == 48000
        got = np.frombuffer(w.readframes(w.getnframes()), "<i2")
    assert np.array_equal(got, pcm)
