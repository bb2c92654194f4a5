"""Multi-host helpers (parallel/multihost.py): per-process batch-index
math and host-local -> global sharded array assembly. Runs single-process
on the virtual 8-device CPU mesh; multi-process behavior is exercised by
monkeypatching jax.process_count/process_index (the index math is pure)."""

import jax
import jax.numpy as jnp
import numpy as np

from fourdgs_tpu.parallel import multihost
from fourdgs_tpu.parallel.mesh import DATA_AXIS


def test_process_batch_indices_partitions(monkeypatch):
    glob = list(range(12))
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    parts = []
    for pid in range(4):
        monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
        parts.append(multihost.process_batch_indices(glob))
    # Every process gets a disjoint, order-preserving, equal-size slice
    # covering the global batch.
    assert all(len(p) == 3 for p in parts)
    assert [i for p in parts for i in p] == glob


def test_process_batch_indices_single_process():
    glob = [5, 2, 9]
    assert multihost.process_batch_indices(glob) == glob


def test_global_mesh_covers_all_devices():
    mesh = multihost.global_mesh()
    assert mesh.axis_names == (DATA_AXIS,)
    assert mesh.devices.size == len(jax.devices())


def test_shard_host_local_batch_roundtrip(rng):
    """Single-process: the host-local batch IS the global batch; the
    assembled jax.Array must be sharded over the data axis and equal the
    input."""
    mesh = multihost.global_mesh()
    n = mesh.devices.size
    local = {"gt": rng.random((n, 4, 4, 3)).astype(np.float32),
             "intr": rng.random((n, 4)).astype(np.float32)}
    out = multihost.shard_host_local_batch(mesh, local)
    for k in local:
        assert out[k].shape == local[k].shape
        np.testing.assert_allclose(np.asarray(out[k]), local[k])
        shard_specs = out[k].sharding.spec
        assert shard_specs[0] == DATA_AXIS
        # one shard per device along the leading axis
        assert len(out[k].addressable_shards) == n
