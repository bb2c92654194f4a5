"""Multi-host helpers (parallel/multihost.py): per-process batch-index
math and host-local -> global sharded array assembly. Runs single-process
on the virtual 8-device CPU mesh; multi-process behavior is exercised two
ways: monkeypatched jax.process_count/process_index for the pure index
math, and a REAL 2-process jax.distributed run (gloo CPU collectives)
via tests/multihost_worker.py subprocesses."""

import os
import socket
import subprocess
import sys

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


def test_two_process_distributed_input_pipeline():
    """Launch TWO real processes (4 virtual CPU devices each) that form
    one 8-device jax.distributed mesh and run the full multi-host input
    path: disjoint batch slicing -> make_array_from_process_local_data ->
    a jitted cross-process mean (XLA-inserted gloo collective). The
    axon TPU plugin is stripped from PYTHONPATH: the workers are CPU-only
    and the plugin's backend probe would reach for the TPU tunnel."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = repo
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", f"localhost:{port}", "4"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER{i} OK" in out, out
