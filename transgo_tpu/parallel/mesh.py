"""Device-mesh helpers.

The reference scales by spawning 6 GPU-sharing Ray actor processes
(transgo.py:92-101) and shipping weight dicts through an object store. The
TPU-native design is a ``jax.sharding.Mesh``: the ``data`` axis shards
self-play games and learner batches across chips over ICI; a ``model`` axis
exists (size 1 by default) so tensor-parallel layouts slot in later without
re-plumbing (SURVEY.md section 2.3 — TP/PP have no referent in a ~3M-param
net, the axis is future-proofing).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Tuple[str, ...] = ("data", "model"),
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a mesh over available devices; defaults to all devices on one
    ``data`` axis with a trailing size-1 ``model`` axis."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def batch_partition_spec(mesh: Mesh, tree, axis: str = "data"):
    """Per-leaf PartitionSpec: shard dim 0 over ``axis`` when divisible by
    the axis size, replicate otherwise (PRNG keys, scalars)."""
    size = mesh.shape[axis]

    def spec(x):
        shape = getattr(x, "shape", ())
        if len(shape) >= 1 and shape[0] % size == 0 and shape[0] > 0:
            return P(axis)
        return P()

    return jax.tree_util.tree_map(spec, tree)


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Place a host pytree with its leading dim sharded over ``axis``
    (leaves that don't divide evenly are replicated)."""
    specs = batch_partition_spec(mesh, tree, axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )
