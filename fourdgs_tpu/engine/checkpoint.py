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
                    env: EnvMapState | None, step: int, extra=None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "gauss": jax.tree.map(np.asarray, gauss),
        "env": None if env is None else jax.tree.map(np.asarray, env),
        "step": int(step),
        "extra": extra or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=4)
    os.replace(tmp, path)


def load_checkpoint(path: str):
    """Returns (GaussianState, EnvMapState | None, step, extra)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    to_dev = lambda t: jax.tree.map(jnp.asarray, t)
    gauss: GaussianState = to_dev(payload["gauss"])
    env = None if payload["env"] is None else to_dev(payload["env"])
    return gauss, env, payload["step"], payload.get("extra", {})
