"""Worker for the real 2-process jax.distributed test (no test_ prefix:
launched by tests/test_multihost.py as a subprocess, one per "host").

Each process owns 4 virtual CPU devices; together they form one 8-device
global data mesh. The worker checks the full multi-host input path:
process-disjoint batch slicing -> host-local array assembly into a
globally-sharded jax.Array -> a jitted cross-process reduction (the DCN
collective XLA inserts from the sharding), and prints the result for the
parent to verify.
"""

import os
import sys

proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
coord = sys.argv[3]
local_dev = int(sys.argv[4])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={local_dev}")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

jax.config.update("jax_cpu_collectives_implementation", "gloo")

from fourdgs_tpu.parallel import multihost  # noqa: E402


def main():
    multihost.initialize(coordinator_address=coord,
                         num_processes=num_procs, process_id=proc_id)
    assert jax.process_count() == num_procs
    assert len(jax.devices()) == num_procs * local_dev

    mesh = multihost.global_mesh()
    assert mesh.devices.size == num_procs * local_dev

    # Seed-synchronized global sampler -> disjoint per-process slices.
    global_batch = list(range(num_procs * local_dev))
    mine = multihost.process_batch_indices(global_batch)
    assert len(mine) == local_dev
    assert mine == global_batch[proc_id * local_dev:(proc_id + 1) * local_dev]

    # Host-local batch shard -> global sharded array. Values encode the
    # global index so the reduction below proves every host's data landed.
    local = {"gt": np.asarray(mine, np.float32)[:, None, None]
             * np.ones((local_dev, 2, 3), np.float32)}
    glob = multihost.shard_host_local_batch(mesh, local)
    assert glob["gt"].shape == (num_procs * local_dev, 2, 3)

    # Jitted cross-process reduction over the sharded batch axis: XLA
    # inserts the inter-process collective from the sharding alone.
    out_sharding = NamedSharding(mesh, P())

    @jax.jit
    def global_mean(x):
        return jax.lax.with_sharding_constraint(jnp.mean(x), out_sharding)

    got = float(global_mean(glob["gt"]))
    want = float(np.mean(global_batch))
    assert abs(got - want) < 1e-6, (got, want)
    print(f"WORKER{proc_id} OK mean={got}", flush=True)


if __name__ == "__main__":
    main()
