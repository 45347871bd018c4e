"""Demodulators ("models") and matching modulators.

Each demodulator is a block-synchronous JAX program: a pytree of carried state
plus a jittable ``step(state, samples) -> (state, outputs)``.  The sample-rate
feedback loops of the reference (timing and carrier PLLs) are reformulated as
feedforward block estimators plus a symbol-rate ``lax.scan``, so throughput
comes from dense vectorized work and a VFO batch axis rather than per-sample
control flow.
"""

from aero_tpu.models.coarse_freq import coarse_freq_init, coarse_freq_estimate
from aero_tpu.models.msk import MskDemodulator, msk_modulate
