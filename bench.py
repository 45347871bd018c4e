"""Benchmark: multi-VFO MSK demod throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference runs one demodulator per CPU core at ~1x real time
(decode/decode.h:42; SURVEY.md §6), i.e. 0.024 MSamples/s per 24 kHz VFO.
``vs_baseline`` is our aggregate demod throughput divided by that — the
number of real-time 24 kHz VFO equivalents sustained per chip.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from aero_tpu.models.msk import make_config, msk_init, msk_step, msk_modulate

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    fs, fb = 24000.0, 1200.0
    cfg = make_config(fs, fb)

    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, size=4000).astype(np.uint8)
    one = msk_modulate(bits, fs, fb, freq=1000.0)[: cfg.block_len]
    samples = jnp.asarray(np.tile(one, (B, 1)), jnp.float32)

    states = jax.vmap(lambda _: msk_init(cfg))(jnp.arange(B))

    @jax.jit
    def step(states, samples):
        return jax.vmap(lambda s, x: msk_step(s, x, cfg))(states, samples)

    # compile + warmup
    states, out = step(states, samples)
    jax.block_until_ready(out)

    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        states, out = step(states, samples)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    samples_per_s = B * cfg.block_len * n_iter / dt
    msps = samples_per_s / 1e6
    vs_baseline = samples_per_s / fs  # real-time 24k-VFO equivalents/chip

    print(json.dumps({
        "metric": "msk_demod_throughput",
        "value": round(msps, 3),
        "unit": "MSamples/s/chip",
        "vs_baseline": round(vs_baseline, 1),
    }))


if __name__ == "__main__":
    main()
