"""Device mesh and sharding helpers (data-parallel policy).

TPU-native design (no reference counterpart — the reference is single
device): a 1-D mesh over all visible chips with axis name "data". The
global batch is sharded over that axis (`P("data")` on the leading dim),
model parameters / optimizer state are replicated (`P()`), and the
per-step gradient mean is an XLA-inserted all-reduce riding ICI. SSD300
is far below one v5e chip's HBM, so data parallelism is the whole
scaling story (SURVEY.md §5 "Distributed communication backend"); the
mesh helper still accepts an explicit device list so a (dp, mp) mesh can
be built for SSD512-scale variants if ever needed.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for batch-leading arrays: split dim 0 over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, opt state, anchors)."""
    return NamedSharding(mesh, P())


def superbatch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (steps, batch, ...) stacked super-batches: the scan
    axis (dim 0) stays whole on every device, the batch axis (dim 1)
    splits over the data axis — each lax.scan iteration then sees a
    normally data-sharded batch."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def shard_batch(mesh: Mesh, batch: Any,
                sharding: Optional[NamedSharding] = None) -> Any:
    """Place a host batch (dict/pytree of arrays) sharded over the data
    axis (or an explicit `sharding`, e.g. superbatch_sharding). Non-array
    leaves (id lists, counts) pass through untouched."""
    if sharding is None:
        sharding = batch_sharding(mesh)

    def put(x):
        if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1:
            return jax.device_put(x, sharding)
        return x

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (model/optimizer state) across the mesh."""
    return jax.device_put(tree, replicate_sharding(mesh))
