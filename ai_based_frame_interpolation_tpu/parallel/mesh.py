"""Device mesh construction — the SPMD backbone.

The reference is strictly single-device (SURVEY.md §2.3: no torch.distributed
/ NCCL / MPI anywhere; device logic is cuda-vs-cpu selection at
``main.py:80-86``). Here every entry point runs over a ``jax.sharding.Mesh``:

- 1-D ``('data',)`` mesh: batch-sharded data parallelism — the right
  parallelism for a 17M-param UNet (params replicate trivially; gradient
  all-reduce rides ICI via XLA-inserted collectives under jit).
- The mesh is an argument everywhere, so multi-slice (DCN) or added axes
  (tensor-parallel conv channels) are config changes, not rewrites.
- ``jax.distributed.initialize()`` is wired for multi-process launches.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> None:
    """Initialize multi-process JAX when launched under a cluster manager.

    Single-process runs (everything in this repo's tests/benches) skip this.
    Two launch styles work:

    - cluster auto-detection (TPU pods, SLURM, GKE): set only
      ``JAX_COORDINATOR_ADDRESS`` and jax discovers the rest;
    - explicit (the two-process CPU validation in
      ``scripts/multihost_dryrun.py`` and any hand-rolled launcher): also
      set ``JAX_NUM_PROCESSES`` and ``JAX_PROCESS_ID``.
    """
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if nproc is not None and pid is not None:
        jax.distributed.initialize(coordinator_address=addr,
                                   num_processes=int(nproc),
                                   process_id=int(pid))
    else:
        jax.distributed.initialize()


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "data",
              devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D data-parallel mesh over the first ``num_devices`` devices.

    ``num_devices`` of None or -1 means all visible devices.
    """
    devs = list(devices if devices is not None else jax.devices())
    if num_devices is not None and num_devices > 0:
        if num_devices > len(devs):
            raise ValueError(
                f"requested {num_devices} devices, only {len(devs)} visible")
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params, scalars)."""
    return NamedSharding(mesh, P())


def pad_batch_to_devices(batch_size: int, mesh: Mesh) -> int:
    """Smallest batch >= batch_size divisible by the mesh's device count."""
    n = mesh.devices.size
    return ((batch_size + n - 1) // n) * n
