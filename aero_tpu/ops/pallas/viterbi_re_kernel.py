"""Register-exchange Viterbi: no survivor memory, no traceback.

The classic traceback decoder (viterbi_kernel.py) writes [T, B, 64] survivor
decisions to memory and then pointer-chases them sequentially.  The
register-exchange formulation instead carries each state's own decoded
path as a 64-bit word (two uint32 lanes): on every ACS step the winning
predecessor's path word shifts left and takes the new input bit.  After
the paths merge (K=7 merges within ~35 bits; we use a 64-bit delay) the
OLDEST bits of the best state's register are final — so the kernel emits
64 decoded bits per state every 64 steps with zero traceback and zero
survivor storage.

All state lives in VMEM scratch ([B, 64] path metrics + 2x [B, 64] int32
path words); outputs stream one 32-bit emission block per grid step.

STATUS: bit-exact in interpreter mode (see tests) and the design of record
for removing the traceback; however this environment's remote Mosaic
compile service stalls on the kernel (>9 min), so the traceback kernel
(viterbi_kernel.py) remains the production TPU path for now.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from aero_tpu.protocol.viterbi import _tables, NSTATES
from aero_tpu.ops.pallas.viterbi_kernel import (_pattern_onehots,
                                                _pred_onehots, branch_metrics)

DELAY = 64          # emission delay in bits (= one uint32 pair)


def _re_kernel(bm_ref, sel0_ref, sel1_ref, prd0_ref, prd1_ref,
               emit_ref, pm_ref, plo_ref, phi_ref, *, chunk: int):
    """Grid step: ``chunk`` = 32 ACS steps, then emit the HIGH path words —
    bits aged 33..64 steps, safely past the K=7 merge depth (~35).

    bm_ref:   [32, B, 4] branch metrics
    emit_ref: [1, B, 32] int32 block — emission at grid step g covers stream bits
              (g-1)*32 .. (g-1)*32+31 (grid step 0 emits junk: discard)
    pm_ref:   [B, 64] f32 scratch (persistent)
    plo/phi:  [B, 64] int32 path words (newest 32 / older 32 bits)
    """
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _():
        pm_ref[:, :] = jnp.zeros_like(pm_ref)
        plo_ref[:, :] = jnp.zeros_like(plo_ref)
        phi_ref[:, :] = jnp.zeros_like(phi_ref)

    s0 = sel0_ref[:, :]
    s1 = sel1_ref[:, :]
    p0m = prd0_ref[:, :]
    p1m = prd1_ref[:, :]
    # input bit of next-state ns is ns & 1 — a static row
    nsbit = (jax.lax.broadcasted_iota(jnp.int32, (1, NSTATES), 1) & 1)

    def sel_pred(words, take1):
        """Route each predecessor's path word to its successors.

        pred0(ns) = ns>>1, pred1(ns) = (ns>>1)+32: use the same one-hot
        matmuls as the metrics (float32 carries 24-bit exact integers, so
        each uint32 word travels as two 16-bit float halves)."""
        lo16 = (words & 0xFFFF).astype(jnp.float32)
        hi16 = ((words >> 16) & 0xFFFF).astype(jnp.float32)
        lo0 = jnp.dot(lo16, p0m, preferred_element_type=jnp.float32)
        hi0 = jnp.dot(hi16, p0m, preferred_element_type=jnp.float32)
        lo1 = jnp.dot(lo16, p1m, preferred_element_type=jnp.float32)
        hi1 = jnp.dot(hi16, p1m, preferred_element_type=jnp.float32)
        lo = jnp.where(take1, lo1, lo0).astype(jnp.int32)
        hi = jnp.where(take1, hi1, hi0).astype(jnp.int32)
        return lo | (hi << 16)

    def step(t, _):
        pm = pm_ref[:, :]
        bm_t = bm_ref[t]
        pm0 = jnp.dot(pm, p0m, preferred_element_type=jnp.float32)
        pm1 = jnp.dot(pm, p1m, preferred_element_type=jnp.float32)
        cand0 = pm0 + jnp.dot(bm_t, s0, preferred_element_type=jnp.float32)
        cand1 = pm1 + jnp.dot(bm_t, s1, preferred_element_type=jnp.float32)
        take1 = cand1 < cand0
        pm_new = jnp.where(take1, cand1, cand0)
        pm_ref[:, :] = pm_new - jnp.min(pm_new, axis=1, keepdims=True)

        lo = sel_pred(plo_ref[:, :], take1)
        hi = sel_pred(phi_ref[:, :], take1)
        # shift the 64-bit register left by one, insert the new bit
        carry = (lo >> 31) & 1
        phi_ref[:, :] = ((hi << 1) | carry)
        plo_ref[:, :] = ((lo << 1) | nsbit)
        return 0

    lax.fori_loop(0, chunk, step, 0)

    # emit the best state's mature (high) path word: bits t-64 .. t-33
    pm = pm_ref[:, :]
    best = jnp.argmin(pm, axis=1)                        # [B]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, pm.shape, 1)
              == best[:, None]).astype(jnp.float32)
    words = phi_ref[:, :]
    lo16 = (words & 0xFFFF).astype(jnp.float32)
    hi16 = ((words >> 16) & 0xFFFF).astype(jnp.float32)
    lo = jnp.sum(lo16 * onehot, axis=1).astype(jnp.int32)
    hi = jnp.sum(hi16 * onehot, axis=1).astype(jnp.int32)
    bhi = lo | (hi << 16)
    sh = jax.lax.broadcasted_iota(jnp.int32, (1, 32), 1)
    emit_ref[0, :, :] = (bhi[:, None] >> (31 - sh)) & 1


@functools.partial(jax.jit, static_argnames=("interpret", "max_b"))
def viterbi_decode_soft_re(soft, interpret: bool = False, max_b: int = 512):
    """Batched register-exchange soft Viterbi.

    soft: [B, 2T] soft bytes.  Returns hard bits [B, T'] where
    T' = floor(T/64)*64 - DELAY + 64 ... callers should append >= 2*DELAY
    neutral soft bytes; the wrapper trims to the true T bits.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n_soft = soft.shape
    T = n_soft // 2
    if B > max_b:
        parts = [viterbi_decode_soft_re(soft[i:i + max_b],
                                        interpret=interpret, max_b=max_b)
                 for i in range(0, B, max_b)]
        return jnp.concatenate(parts, axis=0)

    # pad so every true bit matures into an emitted high word:
    # grid step g (g>=1) emits bits (g-1)*32 .. (g-1)*32+31
    Tp = (-(-T // 32) + 2) * 32
    pad = Tp - T
    softp = jnp.concatenate(
        [jnp.asarray(soft, jnp.float32),
         jnp.full((B, 2 * pad), 128.0, jnp.float32)], axis=1)
    bm = branch_metrics(softp)                   # [Tp, B, 4]
    sel0, sel1 = _pattern_onehots()
    prd0, prd1 = _pred_onehots()

    kernel = functools.partial(_re_kernel, chunk=32)
    G = Tp // 32
    emits = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((32, B, 4), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((4, NSTATES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((4, NSTATES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((NSTATES, NSTATES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((NSTATES, NSTATES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, B, 32), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, B, 32), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, NSTATES), jnp.float32),
                        pltpu.VMEM((B, NSTATES), jnp.int32),
                        pltpu.VMEM((B, NSTATES), jnp.int32)],
        interpret=interpret,
    )(bm, jnp.asarray(sel0), jnp.asarray(sel1), jnp.asarray(prd0),
      jnp.asarray(prd1))

    # emission at grid step g (>=1) covers bits (g-1)*32 .. (g-1)*32+31
    bits = jnp.transpose(emits[1:], (1, 0, 2)).reshape(B, (G - 1) * 32)
    return bits[:, :T].astype(jnp.uint8)
