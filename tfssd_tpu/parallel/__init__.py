"""Parallelism layer: device mesh construction and sharding policy.

The reference has no distributed layer at all (single-process TF2,
SURVEY.md §0/§5); this package is the TPU-native addition: a
`jax.sharding.Mesh` over the slice's chips, batch sharded along the
"data" axis, model state replicated, gradient all-reduce emitted by XLA
over ICI.
"""

from tfssd_tpu.parallel.mesh import (  # noqa: F401
    get_mesh,
    replicate_sharding,
    batch_sharding,
    shard_batch,
    superbatch_sharding,
    replicate,
)
