"""Checkpointing: the full training state as a pickled numpy pytree.

Parity with the reference `capture()/restore()` round-trip
(`scene/gaussian_model.py:99-177`, `train.py:50-52, 220-228`): params,
Adam moments, densification accumulators, active count, env map, step.
The NamedTuple pytrees are converted to host numpy before pickling so
checkpoints are device-independent.
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from ..models.envmap import EnvMapState
from ..models.gaussians import GaussianState


def save_checkpoint(path: str, gauss: GaussianState,
                    env: EnvMapState | None, step: int, extra=None,
                    io_pool=None):
    """Atomic checkpoint save. With `io_pool` (an Executor), the
    device->host fetch happens synchronously (cheap, overlaps the async
    dispatch queue) but pickling + disk IO — seconds for a densified
    multi-100MB cloud — run in the background; returns the Future (orbax
    async-checkpoint pattern). Atomicity via tmp + os.replace either way."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "gauss": jax.tree.map(np.asarray, gauss),
        "env": None if env is None else jax.tree.map(np.asarray, env),
        "step": int(step),
        "extra": extra or {},
    }

    def write():
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f, protocol=4)
        os.replace(tmp, path)

    if io_pool is not None:
        return io_pool.submit(write)
    write()
    return None


def load_checkpoint(path: str):
    """Returns (GaussianState, EnvMapState | None, step, extra)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    to_dev = lambda t: jax.tree.map(jnp.asarray, t)
    gauss: GaussianState = to_dev(payload["gauss"])
    env = None if payload["env"] is None else to_dev(payload["env"])
    return gauss, env, payload["step"], payload.get("extra", {})
