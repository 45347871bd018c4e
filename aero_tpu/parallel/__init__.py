"""Device meshes and VFO-axis sharding.

The reference runs one OS process per VFO (decode/CMakeLists + ZMQ topics);
here hundreds of VFOs are one batched array axis, sharded over a
``jax.sharding.Mesh`` so a pod slice demodulates them all concurrently.
"""

from aero_tpu.parallel.mesh import make_mesh, shard_over_vfo
from aero_tpu.parallel.vfo_bank import MskVfoBank
