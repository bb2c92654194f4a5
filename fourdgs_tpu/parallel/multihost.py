"""Multi-host (DCN) helpers: distributed init + per-host input pipeline.

The reference is single-process (SURVEY §2.2); here each host process
feeds its own shard of the global camera batch (the analogue of the
reference's per-process DataLoader workers, `train.py:80`) and the jitted
sharded step from `parallel.mesh` runs unchanged — gradients ride ICI
within a slice and DCN across hosts, inserted by XLA from the shardings.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed bootstrap (no-op when single-process / TPU pods
    auto-configure)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def global_mesh() -> Mesh:
    """1-D data mesh over every device of every host."""
    return Mesh(np.asarray(jax.devices()), (DATA_AXIS,))


def process_batch_indices(global_indices: Sequence[int]) -> list:
    """This process's slice of a global camera-index batch. Every process
    must pass the SAME global list (use a seed-synchronized sampler)."""
    n_proc = jax.process_count()
    pid = jax.process_index()
    per = len(global_indices) // n_proc
    return list(global_indices[pid * per: (pid + 1) * per])


def shard_host_local_batch(mesh: Mesh, local_arrays):
    """Assemble per-host local batch arrays into one global jax.Array
    sharded over the data axis (leading dim = global batch)."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(
            sharding, np.asarray(a)),
        local_arrays)
