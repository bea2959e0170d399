"""Device-mesh + sharding utilities (the TPU-native distributed layer).

The reference is single-process single-GPU (its dist_util.setup_dist is a
no-op, utils/dist_util.py:29-44); the model is small, so the natural TPU
scaling axis is pure data parallelism over clips: batches are sharded over a
1-D 'data' mesh, parameters are replicated, and XLA inserts the psum for the
gradient reduction when the jitted train step closes over replicated params
with sharded batch inputs.
"""

from rohm_tpu.parallel.mesh import (
    data_parallel_mesh,
    replicated,
    shard_batch,
    shard_spec,
)

__all__ = [
    "data_parallel_mesh",
    "replicated",
    "shard_batch",
    "shard_spec",
]
