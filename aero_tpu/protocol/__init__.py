"""Aero-L protocol codecs and framing.

Pure-function codecs (CRC-16, LFSR scrambler, 64xN block interleaver,
depuncturer, K=7 r=1/2 convolutional code) plus the P/R/T/C-channel framing
state machines.  The Viterbi decoder is the heavy kernel and runs batched in
JAX; the byte-level bookkeeping (SU parsing, ISU/ACARS reassembly) is
host-side numpy/Python, mirroring the reference's split of DSP vs string work.
"""

from aero_tpu.protocol.crc import crc16_bits, crc16_bytes, crc16_check_bits
from aero_tpu.protocol.scrambler import SCRAMBLE_KEYSTREAM, scramble_bits
from aero_tpu.protocol.interleaver import (
    deinterleave_indices,
    interleave_indices,
    deinterleave_msk_burst_indices,
    depuncture_soft,
)
from aero_tpu.protocol.viterbi import (
    conv_encode,
    viterbi_decode_soft,
    viterbi_decode_soft_batch,
    StreamingViterbi,
)
