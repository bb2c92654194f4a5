"""Device-mesh data parallelism for the camera/timestep batch.

The reference is strictly single-GPU — its "batch" is a sequential
gradient-accumulation loop (`train.py:104-163`) and there is no
distribution layer at all (SURVEY §2.2/§5.8). Here the batch axis is a
first-class mesh axis:

  * gaussian cloud state (params, Adam, stats): REPLICATED — the cloud is
    (P, ~60 floats), tens of MB, cheap to mirror, and every camera needs
    every gaussian.
  * camera batch (matrices, gt images, masks, intrinsics): SHARDED over
    the "data" axis.
  * loss = mean over the batch → XLA inserts the gradient all-reduce
    (psum over ICI) automatically from the sharding annotations; the
    per-point densification statistics come out replicated the same way.

Multi-host: each process feeds its local shard of the global camera batch
(jax.make_array_from_process_local_data); the same jit works unchanged.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.step import StepConfig, build_step_fn
from ..ops.preprocess import CameraArrays, RenderOptions

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh):
    """Sharding for leading-batch-axis arrays."""
    return NamedSharding(mesh, P(DATA_AXIS))


def make_sharded_train_step(
    opts: RenderOptions,
    cfg: StepConfig,
    mesh: Mesh,
    *,
    capacity: int,
    max_per_tile: int,
    chunk: int = 32,
    batch_size: int = 1,
    backend: str = "xla",
    strips: int = 1,
    dummy_cap: int | None = None,
):
    """Jit the train step over `mesh` with the camera(-strip) batch sharded
    on the data axis and all cloud state replicated. Requires
    batch_size*strips to be a multiple of the mesh size.

    With strips > 1 each camera renders as `strips` horizontal strips
    (one large frame spreads over devices, SURVEY §5.8's pixel sharding);
    gt/alpha stay full frames and are replicated — the strip images
    all-gather (a few MB over ICI) for the full-frame loss, which keeps
    the training math identical to the single-device step."""
    n_dev = mesh.devices.size
    if (batch_size * strips) % n_dev != 0:
        raise ValueError(
            f"batch_size*strips {batch_size * strips} not divisible by "
            f"mesh size {n_dev}")

    step_fn = build_step_fn(
        opts, cfg, capacity=capacity, max_per_tile=max_per_tile,
        chunk=chunk, batch_size=batch_size, backend=backend, strips=strips,
        dummy_cap=dummy_cap)

    rep = replicate(mesh)
    bat = shard_batch(mesh)
    cam_shard = CameraArrays(*([bat] * len(CameraArrays._fields)))
    frame = bat if strips == 1 else rep    # gt/alpha lead with B, not B*n

    in_shardings = (
        rep,          # gauss state
        rep,          # env state (or None)
        rep,          # step
        cam_shard,    # cameras (leading B*strips)
        frame,        # gt images (leading B)
        frame,        # alpha masks (leading B)
        bat,          # intrinsics (leading B*strips)
        rep,          # bg
    )
    out_shardings = (rep, rep, rep)
    return jax.jit(step_fn, in_shardings=in_shardings,
                   out_shardings=out_shardings)
