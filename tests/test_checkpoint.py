"""Checkpoint/resume (runtime/checkpoint.py): a stream split at a block
boundary across a save/load must decode identically to the uninterrupted
run — device carries, deframer locks, trellis history and reassembly
buffers all survive the restart.  (The reference has no checkpointing at
all, SURVEY.md §5.)"""

import numpy as np
import pytest

from aero_tpu.channelizer import load_ini
from aero_tpu.runtime.fused_station import FusedStation


B = 3
VFOS = "".join(
    f"{i+1}\\frequency={1545002000 + i*19000}\n{i+1}\\data_rate=1200\n"
    f"{i+1}\\topic=V{i}\n{i+1}\\gain=100\n" for i in range(B))
INI = (f"[General]\nsample_rate=1536000\ncenter_frequency=1545000000\n"
       f"[vfos]\nsize={B}\n" + VFOS)


def _wideband():
    """A two-message MSK 1200 P-channel signal on V1's frequency."""
    from scipy.signal import firwin, lfilter
    from aero_tpu.models.msk import msk_modulate
    from aero_tpu.protocol.framing import build_p_frames
    from aero_tpu.protocol.crc import append_crc16_bytes
    from aero_tpu.protocol.isu import make_acars_userdata, segment_isu

    fields = []
    for text in ("BEFORE RESTART", "AFTER RESTART"):
        ud = make_acars_userdata("2", "VH-CKP", "!", "AA", "M", text)
        sus = [append_crc16_bytes(b) for b in segment_isu(ud, 0x654321, 0x41)]
        fill = append_crc16_bytes(bytes([0x01] + [0] * 9))
        while len(sus) % 6:
            sus.append(fill)
        fields += [b"".join(sus[i:i + 6]) for i in range(0, len(sus), 6)]
    bits = build_p_frames(fields, 1200, lead_frames=6)
    audio = np.asarray(msk_modulate(bits, 24000, 1200, freq=1000.0))
    up = np.zeros(len(audio) * 64, np.float32)
    up[::64] = audio * 64
    bb = lfilter(firwin(511, 1.0 / 64), 1.0, up).astype(np.float32)
    delta = (1545002000 + 1 * 19000) - 1545000000
    t = np.arange(len(bb)) / 1536000.0
    return (bb * np.exp(2j * np.pi * delta * t)).astype(np.complex64)


def test_checkpoint_resume_bit_identical(tmp_path):
    cfg = load_ini(INI, is_text=True)
    wide = _wideband()

    # uninterrupted reference run
    msgs_ref = []
    st = FusedStation(cfg, on_acars=lambda v, it: msgs_ref.append(
        (v, it.message)))
    w = np.concatenate([wide, np.zeros(2 * st.block_len, np.complex64)])
    n = (len(w) // st.block_len) * st.block_len
    blocks = [w[i:i + st.block_len] for i in range(0, n, st.block_len)]
    for b in blocks:
        st.process(b)
    st.flush()
    assert ("V1", "BEFORE RESTART") in msgs_ref
    assert ("V1", "AFTER RESTART") in msgs_ref

    # split run: checkpoint mid-stream (after the first message decodes,
    # while the deframer is locked mid-frame), restore into a NEW station
    split = len(blocks) // 2
    msgs_a = []
    st_a = FusedStation(cfg, on_acars=lambda v, it: msgs_a.append(
        (v, it.message)))
    for b in blocks[:split]:
        st_a.process(b)
    ckpt = str(tmp_path / "station.ckpt.npz")
    st_a.save_checkpoint(ckpt)

    msgs_b = []
    st_b = FusedStation(cfg, on_acars=lambda v, it: msgs_b.append(
        (v, it.message)))
    st_b.load_checkpoint(ckpt)
    assert st_b.stats.su_ok == st_a.stats.su_ok
    for b in blocks[split:]:
        st_b.process(b)
    st_b.flush()

    assert msgs_a + msgs_b == msgs_ref
    assert st_b.stats.su_ok == st.stats.su_ok
    assert st_b.stats.frames == st.stats.frames


def test_checkpoint_rejects_wrong_config(tmp_path):
    cfg = load_ini(INI, is_text=True)
    st = FusedStation(cfg)
    ckpt = str(tmp_path / "c.npz")
    st.save_checkpoint(ckpt)

    other_vfos = "".join(
        f"{i+1}\\frequency={1545002000 + i*19000}\n{i+1}\\data_rate=1200\n"
        f"{i+1}\\topic=W{i}\n{i+1}\\gain=100\n" for i in range(2))
    other = load_ini(
        f"[General]\nsample_rate=1536000\ncenter_frequency=1545000000\n"
        f"[vfos]\nsize=2\n{other_vfos}", is_text=True)
    st2 = FusedStation(other)
    with pytest.raises(ValueError):
        st2.load_checkpoint(ckpt)


def test_classic_station_checkpoint_resume(tmp_path):
    """The classic (tree-channelizer + VfoBank) Station is resumable too:
    a mid-stream save/load into a fresh process continues identically —
    channelizer filter carries, bank demod states, audio accumulators,
    hunter positions and deframer state all survive."""
    from aero_tpu.runtime.station import Station

    cfg = load_ini(INI, is_text=True)
    wide = _wideband()
    B_blk = cfg.buflen_complex
    w = np.concatenate([wide, np.zeros(4 * B_blk, np.complex64)])
    n = (len(w) // B_blk) * B_blk
    blocks = [w[i:i + B_blk] for i in range(0, n, B_blk)]

    msgs_ref = []
    st = Station(cfg, on_acars=lambda v, it: msgs_ref.append(
        (v, it.message)))
    for b in blocks:
        st.process(b)
    assert ("V1", "BEFORE RESTART") in msgs_ref
    assert ("V1", "AFTER RESTART") in msgs_ref

    split = len(blocks) // 2
    msgs_a = []
    st_a = Station(cfg, on_acars=lambda v, it: msgs_a.append(
        (v, it.message)))
    for b in blocks[:split]:
        st_a.process(b)
    ckpt = str(tmp_path / "classic.ckpt.npz")
    st_a.save_checkpoint(ckpt)

    msgs_b = []
    st_b = Station(cfg, on_acars=lambda v, it: msgs_b.append(
        (v, it.message)))
    st_b.load_checkpoint(ckpt)
    assert st_b.stats.su_ok == st_a.stats.su_ok
    assert st_b.hunters["V1"].freq_center == st_a.hunters["V1"].freq_center
    for b in blocks[split:]:
        st_b.process(b)

    assert msgs_a + msgs_b == msgs_ref
    assert st_b.stats.su_ok == st.stats.su_ok
    assert st_b.stats.frames == st.stats.frames

    # a fused checkpoint will not load into a classic station
    stf = FusedStation(cfg)
    fused_ckpt = str(tmp_path / "fused.ckpt.npz")
    stf.save_checkpoint(fused_ckpt)
    with pytest.raises(ValueError, match="classic"):
        Station(cfg).load_checkpoint(fused_ckpt)


def test_checkpoint_exact_path_atomic_and_residual(tmp_path):
    """Three durability properties (advisor findings, round 4):
    1. `--checkpoint station.ckpt` (no .npz suffix) saves to EXACTLY that
       name, so the startup os.path.exists resume check finds it.
    2. Saves are atomic: no .tmp litter, and a pre-existing good
       checkpoint is replaced, never truncated in place.
    3. The caller's partial-block residual round-trips, so a resumed
       stream is sample-contiguous with the capture."""
    import os
    from aero_tpu.runtime.checkpoint import load_residual

    cfg = load_ini(INI, is_text=True)
    st = FusedStation(cfg)
    bare = str(tmp_path / "station.ckpt")        # no .npz
    resid = (np.arange(7, dtype=np.float32)
             + 1j * np.arange(7, dtype=np.float32)).astype(np.complex64)
    st.save_checkpoint(bare, residual=resid)
    assert os.path.exists(bare)                  # exact name, not bare+.npz
    assert not os.path.exists(bare + ".npz")
    assert not os.path.exists(bare + ".tmp")     # temp file replaced away

    np.testing.assert_array_equal(load_residual(bare), resid)
    # a checkpoint saved without a residual reports an empty one
    st.save_checkpoint(bare)
    assert len(load_residual(bare)) == 0

    st2 = FusedStation(cfg)
    st2.load_checkpoint(bare)                    # loads from the bare name


def test_station_cli_survives_corrupt_checkpoint(tmp_path):
    """A truncated checkpoint (crash mid-write on an old version, disk
    full, ...) must not crash-loop the station: the CLI warns and starts
    fresh instead of raising at startup."""
    import os
    import subprocess
    import sys

    ini = tmp_path / "st.ini"
    ini.write_text("sample_rate=288000\ncenter_frequency=1545100000\n"
                   "[vfos]\nsize=1\n1\\frequency=1545100000\n"
                   "1\\data_rate=1200\n1\\topic=VFO1\n")
    ckpt = tmp_path / "bad.ckpt"
    ckpt.write_bytes(b"PK\x03\x04 this is not a checkpoint")
    iq = tmp_path / "z.cf32"
    np.zeros(144000, np.complex64).tofile(iq)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "aero_tpu.runtime.station_main",
         "-c", str(ini), "--iq-file", str(iq), "--platform", "cpu",
         "--checkpoint", str(ckpt)],
        capture_output=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env)
    err = out.stderr.decode()
    assert out.returncode == 0, err[-2000:]
    assert "checkpoint_load_failed" in err
    assert "final_stats" in err
    # and the shutdown save replaced the corrupt file with a good one
    with np.load(str(ckpt), allow_pickle=False) as z:
        assert "meta_version" in z.files
