"""Sharding policies for inference and training arrays.

Two scalable dimensions exist in this workload (SURVEY.md §2.3 / §5
long-context analog):

- **batch** (``P('data')`` on axis 0): training batches and batched frame
  pairs — the default, used whenever batch >= devices;
- **spatial height** (``P(None, 'data')`` on axis 1): the SP/CP analog for
  this model — at very high resolution with small batch, shard the H axis
  of the NHWC frames across the mesh. XLA's SPMD partitioner inserts the
  halo exchanges the 3x3 convs and 2x2 pools need at shard boundaries;
  nothing in the model changes.

Both are *input* shardings: the jitted programs carry no annotations, so the
same compiled model serves single-chip and multi-chip callers.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import replicated


def batch_spec(axis_name: str = "data") -> P:
    return P(axis_name)


def spatial_spec(axis_name: str = "data") -> P:
    """Shard H of [B, H, W, C]."""
    return P(None, axis_name)


def choose_spec(batch: int, height: int, mesh: Mesh,
                axis_name: str = "data") -> P:
    """Pick batch-sharding when the batch divides evenly, else spatial."""
    n = mesh.devices.size
    if batch % n == 0:
        return batch_spec(axis_name)
    if height % n == 0:
        return spatial_spec(axis_name)
    return P()   # replicate (last resort; still correct)


def put_frames(arr, mesh: Optional[Mesh], spec: Optional[P] = None):
    """Device-put a [B,H,W,C] array with the chosen sharding (or plain
    ``jnp.asarray`` when no mesh is configured)."""
    import jax.numpy as jnp

    if mesh is None:
        return jnp.asarray(arr)
    arr = np.asarray(arr)
    if spec is None:
        spec = choose_spec(arr.shape[0], arr.shape[1], mesh)
    return jax.device_put(arr, NamedSharding(mesh, spec))


def put_replicated(tree, mesh: Optional[Mesh]):
    if mesh is None:
        return tree
    return jax.device_put(tree, replicated(mesh))
