"""Checkpoint/resume for streaming stations.

The reference has no checkpointing (SURVEY.md §5 'Checkpoint/resume:
none'): restarting it loses lock and whatever frames were in flight, and
it re-acquires from the air in seconds.  A TPU station serving hundreds
of VFOs carries real state worth keeping — per-VFO PFB and demodulator
carries on the device, deframer locks and trellis history, ISU/ACARS
reassembly in progress — so aero-tpu makes the whole pipeline resumable:

    st.save_checkpoint("station.ckpt.npz")     # drains in-flight work
    ...
    st2 = FusedStation(same_cfg, ...)          # fresh process
    st2.load_checkpoint("station.ckpt.npz")
    st2.process(next_block)                    # continues bit-identically

One .npz holds the flattened device pytree (fetched to host numpy), each
deframer's scalar/array state, and the pickled reassembly buffers.  The
treedef itself is NOT serialized: the loading station re-derives it from
its own freshly-initialized state, so a checkpoint only loads into a
station with the same VFO configuration (checked).

Resume equivalence is proven in tests/test_checkpoint.py: a stream split
at an arbitrary block boundary across a save/load produces the same
ACARS messages as the uninterrupted run.
"""

from __future__ import annotations

import pickle

import numpy as np
import jax


FORMAT_VERSION = 1


def _framer_state(f) -> dict:
    return {
        "buf": f.buf.copy(),
        "locked": np.bool_(f.locked),
        "frame_index": np.int64(f.frame_index),
        "dcd_count": np.int64(f.dcd_count),
        "dcd": np.bool_(f.dcd),
        "arm_flip": f._arm_flip.copy(),
        "vit_carry": f.viterbi._carry.copy(),
    }


def _restore_framer(f, d: dict):
    f.buf = np.asarray(d["buf"], np.float32)
    f.locked = bool(d["locked"])
    f.frame_index = int(d["frame_index"])
    f.dcd_count = int(d["dcd_count"])
    f.dcd = bool(d["dcd"])
    f._arm_flip = np.asarray(d["arm_flip"], bool)
    f.viterbi._carry = np.asarray(d["vit_carry"], np.float32)


def save_station_checkpoint(st, path: str):
    """Write a FusedStation checkpoint.  Drains pending/in-flight blocks
    first so host bookkeeping is consistent with the device state."""
    st.flush()
    leaves = jax.tree_util.tree_leaves(st._state)
    blobs = {f"dev_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    host = {
        "version": FORMAT_VERSION,
        "n_dev_leaves": len(leaves),
        "topics": sorted(st.framers),
        "framers": {t: _framer_state(st.framers[t]) for t in st.framers},
        # reassembly buffers are plain data objects (no callbacks)
        "reasm": {t: pickle.dumps((d.isudata, d.parser.defrag))
                  for t, d in st.dispatchers.items()},
        "stats": vars(st.stats).copy(),
    }
    np.savez_compressed(path, host=np.frombuffer(pickle.dumps(host),
                                                 np.uint8), **blobs)


def load_station_checkpoint(st, path: str):
    """Load a checkpoint written by ``save_station_checkpoint`` into a
    station built with the same VFO configuration."""
    with np.load(path, allow_pickle=False) as z:
        host = pickle.loads(z["host"].tobytes())
        if host["version"] != FORMAT_VERSION:
            raise ValueError(f"checkpoint version {host['version']} != "
                             f"{FORMAT_VERSION}")
        if host["topics"] != sorted(st.framers):
            raise ValueError("checkpoint VFO topics do not match station "
                             "configuration")
        leaves, treedef = jax.tree_util.tree_flatten(st._state)
        if host["n_dev_leaves"] != len(leaves):
            raise ValueError("checkpoint device state does not match "
                             "station configuration")
        new_leaves = []
        for i, cur in enumerate(leaves):
            arr = z[f"dev_{i}"]
            if arr.shape != cur.shape or arr.dtype != cur.dtype:
                raise ValueError(f"device leaf {i}: checkpoint "
                                 f"{arr.shape}/{arr.dtype} != station "
                                 f"{cur.shape}/{cur.dtype}")
            new_leaves.append(arr)
    st._state = jax.tree_util.tree_unflatten(treedef, [
        jax.numpy.asarray(a) for a in new_leaves])
    for t, d in host["framers"].items():
        _restore_framer(st.framers[t], d)
    for t, blob in host["reasm"].items():
        isudata, defrag = pickle.loads(blob)
        st.dispatchers[t].isudata = isudata
        st.dispatchers[t].parser.defrag = defrag
    for k, v in host["stats"].items():
        setattr(st.stats, k, v)
