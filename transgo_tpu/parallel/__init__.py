"""Mesh / sharding scale-out (replaces the reference's Ray actor layer)."""

from transgo_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
)
from transgo_tpu.parallel.sharded import ShardedLearner  # noqa: F401
