"""Shared host wrapper for window-based burst demodulators.

Phase-1 detection (dense power envelope vs carried noise floor) runs over a
sample ring buffer; each complete gate run becomes one fixed-size window
passed to the modulation-specific jitted window demodulator, which returns
per-strobe soft values + an activity mask.  The wrapper serializes them into
the marked int16 soft stream protocol/rt_framing consumes.
"""

from __future__ import annotations

import numpy as np


class BurstWindowDemodulator:
    def __init__(self, cfg, window_fn):
        self.cfg = cfg
        self._window_fn = window_fn
        self._ring = np.zeros(0, np.float32)
        self._noise_floor = 0.0

    @property
    def state(self):                   # runtime/decoder compatibility
        return None

    def _smooth_len(self) -> int:
        return 8 * getattr(self.cfg, "sps", 20)

    def process(self, samples: np.ndarray):
        from aero_tpu.models.burst_msk import _envelope

        cfg = self.cfg
        samples = np.asarray(samples, np.float32)
        self._ring = np.concatenate([self._ring, samples])
        outs = []

        env = np.asarray(_envelope(self._ring, self._smooth_len()))
        q25 = float(np.percentile(env, 25.0)) if len(env) else 0.0
        if self._noise_floor <= 0:
            self._noise_floor = max(q25, 1e-12)
        else:
            self._noise_floor = 0.9 * self._noise_floor + 0.1 * min(
                q25, 4 * self._noise_floor)
        gate = env > (cfg.gate_ratio * self._noise_floor)

        pad = self._smooth_len() // 2
        W = cfg.window_len
        d = np.diff(np.concatenate([[0], gate.astype(np.int8), [0]]))
        starts = np.flatnonzero(d == 1)
        ends = np.flatnonzero(d == -1)
        runs = list(zip(starts, ends))
        if runs and runs[-1][1] >= len(gate) - 1:
            s, e = runs[-1]
            if e - s < W:        # still open: wait unless it fills a window
                runs.pop()

        consumed = 0
        min_run = 2 * self._smooth_len()
        for s, e in runs:
            if e - s < min_run:
                continue
            w0 = max(0, s - pad)
            win = self._ring[w0: w0 + W]
            gwin = gate[w0: w0 + W]
            if len(win) < W:
                win = np.pad(win, (0, W - len(win)))
                gwin = np.pad(gwin, (0, W - len(gwin)))
            out = self._window_fn(win, gwin.astype(np.float32), self.cfg)
            soft = np.asarray(out["soft"])
            active = np.asarray(out["active"])
            stream = []
            started = False
            for k in range(soft.shape[0]):
                if active[k]:
                    if not started:
                        stream.append(-1)
                        started = True
                    stream.extend(int(v) for v in soft[k])
            outs.append({
                "soft_bits": np.asarray(stream, np.int16),
                "burst": True,
                "signal": True,
                "freq": cfg.freq_center + float(out["freq_offset"]),
                "tone_quality": float(out["tone_quality"]),
            })
            consumed = max(consumed, min(e + pad, len(self._ring)))

        keep_from = max(consumed, len(self._ring) - (W + 2 * pad))
        if keep_from > 0:
            self._ring = self._ring[keep_from:]
        if not outs:
            outs.append({
                "soft_bits": np.zeros(0, np.int16),
                "burst": False, "signal": False,
                "freq": cfg.freq_center, "tone_quality": 0.0,
            })
        return outs
