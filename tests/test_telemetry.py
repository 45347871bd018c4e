"""Observability parity: scatter points + spectrum snapshots (the
reference's ScatterPoints/Plottables GUI signals, mskdemodulator.h:122-135
and SURVEY.md §5 — emitted but unconnected in its headless build)."""

import numpy as np

from aero_tpu.models.msk import MskDemodulator, msk_modulate


def test_msk_scatter_and_spectrum():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 6000).astype(np.uint8)
    audio = msk_modulate(bits, 24000.0, 1200.0, freq=1000.0)
    audio = audio + rng.normal(0, 0.01, len(audio)).astype(np.float32)
    dm = MskDemodulator(24000.0, 1200.0)
    outs = dm.process(audio)
    locked = [o for o in outs if o["signal"]]
    assert locked, "no lock on clean signal"
    sc = locked[-1]["scatter"]
    assert sc.shape == (dm.cfg.block_len // (2 * dm.cfg.sps), 2)
    # locked constellation points sit near +-4/3 on both arms (the soft
    # map scales by 0.75)
    err = np.abs(np.abs(sc) * 0.75 - 1.0)
    assert np.median(err) < 0.25

    freqs, db = dm.spectrum(nbins=128)
    assert freqs.shape == (128,) and db.shape == (128,)
    # the squared-signal tone pair sits at +-fb/4 in display (signal)
    # frequency for a centered carrier; with 128 pooled bins of the
    # 8192-bin spectrum each bin spans ~94 Hz
    top2 = freqs[np.argsort(db)[-2:]]
    assert sorted(np.sign(top2)) == [-1, 1]
    assert all(abs(abs(f) - 1200 / 4) < 120 for f in top2)
    # axis spans +-fs/4 (squared-signal domain halved)
    assert abs(freqs[0] + 24000 / 4) < 200 and abs(freqs[-1] - 24000 / 4) < 200


def test_fused_station_vfo_spectrum():
    """On-demand per-VFO spectrum from the device-resident state."""
    import jax  # noqa: F401  (session platform already configured)
    from aero_tpu.channelizer import load_ini
    from aero_tpu.runtime.fused_station import FusedStation

    ini = ("[General]\nsample_rate=1536000\ncenter_frequency=1545000000\n"
           "[vfos]\nsize=2\n"
           "1\\frequency=1545021000\n1\\data_rate=1200\n1\\topic=A\n"
           "2\\frequency=1545040000\n2\\data_rate=1200\n2\\topic=B\n")
    st = FusedStation(load_ini(ini, is_text=True), ingest_dtype="int16",
                      hunt=False)
    rng = np.random.default_rng(0)
    # a pure carrier 400 Hz above VFO A's audio center
    n = np.arange(st.block_len)
    delta = 21000.0
    wb = (0.05 * np.exp(2j * np.pi * (delta + 400.0) / 1536000.0 * n)
          ).astype(np.complex64)
    wb += (rng.normal(0, 0.001, st.block_len)
           + 1j * rng.normal(0, 0.001, st.block_len)).astype(np.complex64)
    for _ in range(3):
        st.process(st.quantize(wb))
    st.flush()
    out = st.vfo_spectrum("A", nbins=256)
    assert out is not None
    freqs, db = out
    assert freqs.shape == (256,) and db.shape == (256,)
    # a pure carrier squares to a single tone at 2*offset -> display
    # peak at the carrier's offset from the current tune, within the
    # demod's audio band
    peak = float(freqs[int(np.argmax(db))])
    assert abs(peak) < 3000.0
    assert st.vfo_spectrum("NOPE") is None
