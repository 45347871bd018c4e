"""Pallas TPU kernel for the K=7 rate-1/2 Viterbi add-compare-select sweep.

The ACS recursion is strictly sequential in time, so XLA's lax.scan version
launches T tiny dependent steps.  This kernel keeps the path metrics for a
whole batch of streams resident in VMEM scratch across a sequential grid
over time chunks, writing survivor decisions out chunk by chunk.

The K=7 trellis has butterfly structure: predecessors of next-state ns are
(ns>>1) and (ns>>1)+32, so the "gather" of previous path metrics is just a
repeat of the lower/upper state halves — no lane-crossing gathers at all:

    pm_pred0 = repeat(pm[:, :32], 2)    # pm[:, ns>>1]
    pm_pred1 = repeat(pm[:, 32:], 2)    # pm[:, (ns>>1)+32]

Branch metrics enter precomputed as [T, B, 4] (one per expected dibit);
selection per next-state uses static one-hot matrices (a [B,4]x[4,64]
matmul on the MXU).

Traceback (a per-stream pointer chase) stays in a lax.scan outside — it is
O(T) scalar work per stream, negligible next to the ACS sweep.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from aero_tpu.protocol.viterbi import _tables, NSTATES


@functools.lru_cache(maxsize=None)
def _pattern_onehots():
    """[4, 64] one-hot selection matrices for the two predecessor branches."""
    _, pattern = _tables()
    oh = []
    for j in (0, 1):
        m = np.zeros((4, NSTATES), np.float32)
        m[pattern[:, j], np.arange(NSTATES)] = 1.0
        oh.append(m)
    return oh[0], oh[1]


@functools.lru_cache(maxsize=None)
def _pred_onehots():
    """[64, 64] one-hot expansion matrices: pm @ M_j = pm[pred_j(ns)]."""
    pred, _ = _tables()
    ms = []
    for j in (0, 1):
        m = np.zeros((NSTATES, NSTATES), np.float32)
        m[pred[:, j], np.arange(NSTATES)] = 1.0
        ms.append(m)
    return ms[0], ms[1]


def _acs_kernel(bm_ref, sel0_ref, sel1_ref, prd0_ref, prd1_ref, surv_ref,
                pm_out_ref, pm_ref, *, chunk: int):
    """One grid step: process `chunk` trellis steps for the whole batch.

    bm_ref:     [chunk, B, 4] branch metrics (VMEM)
    surv_ref:   [chunk, B, 64] survivor decisions out (VMEM block)
    pm_out_ref: [B, 64] final path metrics out (written on the last step)
    pm_ref:     [B, 64] path metric scratch, persistent across the grid
    """
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _():
        pm_ref[:, :] = jnp.zeros_like(pm_ref)

    s0 = sel0_ref[:, :]
    s1 = sel1_ref[:, :]
    p0m = prd0_ref[:, :]
    p1m = prd1_ref[:, :]

    def step(t, _):
        pm = pm_ref[:, :]
        bm_t = bm_ref[t]                                   # [B, 4]
        # butterfly predecessor metrics via one-hot matmuls (MXU; the
        # equivalent jnp.repeat lowers to an unsupported Mosaic reshape)
        pm0 = jnp.dot(pm, p0m, preferred_element_type=jnp.float32)
        pm1 = jnp.dot(pm, p1m, preferred_element_type=jnp.float32)
        bm0 = jnp.dot(bm_t, s0, preferred_element_type=jnp.float32)
        bm1 = jnp.dot(bm_t, s1, preferred_element_type=jnp.float32)
        cand0 = pm0 + bm0
        cand1 = pm1 + bm1
        take1 = cand1 < cand0
        pm_new = jnp.where(take1, cand1, cand0)
        pm_new = pm_new - jnp.min(pm_new, axis=1, keepdims=True)
        pm_ref[:, :] = pm_new
        surv_ref[t] = take1.astype(jnp.int8)
        return 0

    lax.fori_loop(0, chunk, step, 0)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        pm_out_ref[:, :] = pm_ref[:, :]


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def viterbi_acs_pallas(bm, chunk: int = 64, interpret: bool = False):
    """bm: [T, B, 4] branch metrics -> (survivors [T, B, 64] int8,
    final path metrics [B, 64]).

    T must be a multiple of ``chunk``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, B, _ = bm.shape
    assert T % chunk == 0
    sel0, sel1 = _pattern_onehots()
    prd0, prd1 = _pred_onehots()

    kernel = functools.partial(_acs_kernel, chunk=chunk)

    surv, pm_final = pl.pallas_call(
        kernel,
        grid=(T // chunk,),
        in_specs=[pl.BlockSpec((chunk, B, 4), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((4, NSTATES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((4, NSTATES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((NSTATES, NSTATES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((NSTATES, NSTATES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((chunk, B, NSTATES), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((B, NSTATES), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((T, B, NSTATES), jnp.int8),
                   jax.ShapeDtypeStruct((B, NSTATES), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((B, NSTATES), jnp.float32)],
        interpret=interpret,
    )(bm.astype(jnp.float32), jnp.asarray(sel0), jnp.asarray(sel1),
      jnp.asarray(prd0), jnp.asarray(prd1))
    return surv, pm_final


def branch_metrics(soft):
    """soft [B, 2T] bytes -> [T, B, 4] metrics (|s-e*255| L1 per dibit)."""
    soft = jnp.asarray(soft, jnp.float32)
    B = soft.shape[0]
    s = soft.reshape(B, -1, 2)
    s0, s1 = s[..., 0], s[..., 1]
    bm = jnp.stack([s0 + s1, s0 + (255.0 - s1),
                    (255.0 - s0) + s1, (255.0 - s0) + (255.0 - s1)], axis=-1)
    return jnp.transpose(bm, (1, 0, 2))


@functools.partial(jax.jit, static_argnames=("chunk", "interpret", "max_b"))
def viterbi_decode_soft_pallas(soft, chunk: int = 64, interpret: bool = False,
                               max_b: int = 128):
    """Batched soft Viterbi with the Pallas ACS sweep.

    soft: [B, 2T] soft bytes; T must be a multiple of ``chunk``
    (pad with neutral 128s to round up).  Returns hard bits [B, T].

    The batch is processed in slices of ``max_b`` so the survivor block
    stays within the scoped-VMEM budget (surv is [T, B, 64] int8).
    """
    pred_np, _ = _tables()
    pred = jnp.asarray(pred_np)

    B = soft.shape[0]
    if B > max_b:
        parts = [viterbi_decode_soft_pallas(soft[i:i + max_b], chunk=chunk,
                                            interpret=interpret, max_b=max_b)
                 for i in range(0, B, max_b)]
        return jnp.concatenate(parts, axis=0)

    bm = branch_metrics(soft)                       # [T, B, 4]
    surv, pm_final = viterbi_acs_pallas(bm, chunk=chunk, interpret=interpret)
    end_state = jnp.argmin(pm_final, axis=1).astype(jnp.int32)

    def traceback(end, surv_b):
        def back(state, s_t):
            bit = (state & 1).astype(jnp.uint8)
            prev = pred[state, s_t[state].astype(jnp.int32)]
            return prev, bit
        _, bits_rev = lax.scan(back, end, surv_b, reverse=True)
        return bits_rev

    bits = jax.vmap(traceback, in_axes=(0, 1))(end_state, surv)
    return bits
