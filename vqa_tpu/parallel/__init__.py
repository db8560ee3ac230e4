"""Parallelism layer (SURVEY.md section 2.3, 5.8).

The TPU-native replacement for the reference's single-host nn.DataParallel:
a 1-D (extensible to 2-D) jax.sharding.Mesh with the batch axis sharded over
ICI; gradient reduction is compiler-emitted psum under jit. No NCCL-style
process groups — the XLA partitioner owns all collectives.
"""

from vqa_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
    shard_state,
)
from vqa_tpu.parallel.partition import shard_state_tp, tp_shardings  # noqa: F401
