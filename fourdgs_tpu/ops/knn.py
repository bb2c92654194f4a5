"""Nearest-neighbor ops, replacing the reference CUDA extensions:

  * `mean_dist2_to_3nn` — scale initialization (reference `simple-knn`
    `distCUDA2`, used once at init, `gaussian_model.py:274`). Host-side
    numpy (init is a cold path); exact for small N, Morton-windowed for
    large N (same box-pruned candidate idea as `simple_knn.cu:147-183`,
    but as a sort + sliding window instead of AABB trees).
  * `knn` — k-nearest-neighbors used by the rigid loss every step
    (reference pointops2 `knnquery`, `utils/general_utils.py:170-184`).
    On-device JAX: exact O(N²) for small N; Morton-window approximate
    for large N (candidates from a sorted-curve neighborhood). The rigid
    loss weights fall off as exp(−100·d²) so window-approximate neighbors
    match the exact loss closely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _morton3(q: np.ndarray) -> np.ndarray:
    """(N, 3) uint32 10-bit coords → 30-bit Morton codes (numpy)."""
    def spread(x):
        x = x.astype(np.uint64)
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x
    return (spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1))
            | (spread(q[:, 2]) << np.uint64(2)))


def _morton_order(points: np.ndarray) -> np.ndarray:
    lo = points.min(0)
    hi = points.max(0)
    q = ((points - lo) / np.maximum(hi - lo, 1e-12) * 1023).astype(np.uint32)
    return np.argsort(_morton3(np.clip(q, 0, 1023)), kind="stable")


def mean_dist2_to_3nn(points: np.ndarray, window: int = 48,
                      exact_below: int = 4096) -> np.ndarray:
    """(N,) mean squared distance to the 3 nearest neighbors (numpy host)."""
    pts = np.asarray(points, np.float32)
    n = pts.shape[0]
    if n <= 4:
        return np.full((n,), 1e-4, np.float32)
    if n <= exact_below:
        d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        d2.sort(axis=1)
        return d2[:, :3].mean(axis=1)

    order = _morton_order(pts)
    sorted_pts = pts[order]
    # Candidates: +/- window along the Morton curve.
    offs = np.arange(-window, window + 1)
    offs = offs[offs != 0]
    idx = np.arange(n)[:, None] + offs[None, :]
    idx = np.clip(idx, 0, n - 1)
    d2 = ((sorted_pts[:, None, :] - sorted_pts[idx]) ** 2).sum(-1)
    d2[idx == np.arange(n)[:, None]] = np.inf
    d2.sort(axis=1)
    out = np.empty(n, np.float32)
    out[order] = d2[:, :3].mean(axis=1)
    return out


def _spread_bits_jnp(x):
    x = x.astype(jnp.uint32)
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def morton_codes(points: jax.Array) -> jax.Array:
    """On-device 30-bit Morton codes for (N, 3) points."""
    lo = jnp.min(points, axis=0)
    hi = jnp.max(points, axis=0)
    q = ((points - lo) / jnp.maximum(hi - lo, 1e-12) * 1023.0)
    q = jnp.clip(q, 0, 1023).astype(jnp.uint32)
    return (_spread_bits_jnp(q[:, 0])
            | (_spread_bits_jnp(q[:, 1]) << 1)
            | (_spread_bits_jnp(q[:, 2]) << 2))


@functools.partial(jax.jit, static_argnames=("k", "window", "exact"))
def knn(points: jax.Array, k: int = 20, window: int = 64,
        exact: bool = False, valid: jax.Array | None = None):
    """k nearest neighbors of each point among `points`.

    Returns (idx (N, k) int32, dist2 (N, k) float32), nearest-first,
    excluding self. `valid` masks padding rows (they are neither queried
    sensibly nor returned as neighbors).
    """
    n = points.shape[0]
    big = jnp.float32(jnp.inf)
    if exact or n <= 2048:
        d2 = jnp.sum((points[:, None, :] - points[None, :, :]) ** 2, -1)
        d2 = d2 + jnp.eye(n, dtype=d2.dtype) * big
        if valid is not None:
            d2 = jnp.where(valid[None, :], d2, big)
        neg, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32), -neg

    code = morton_codes(points)
    if valid is not None:
        code = jnp.where(valid, code, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(code)
    inv = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    sp = points[order]
    offs = jnp.concatenate([jnp.arange(-window, 0), jnp.arange(1, window + 1)])
    cand = jnp.clip(jnp.arange(n)[:, None] + offs[None, :], 0, n - 1)
    # Per-coordinate 1-D gathers: a row-gather producing (N*W, 3) would be
    # laid out with the minor dim padded to 128 lanes (42x memory blowup —
    # 16 GB at N=256k, W=128 on TPU).
    d2 = jnp.zeros(cand.shape, points.dtype)
    for c in range(3):
        col = sp[:, c]
        d2 = d2 + (col[:, None] - col[cand]) ** 2
    d2 = jnp.where(cand == jnp.arange(n)[:, None], big, d2)
    if valid is not None:
        sorted_valid = valid[order]
        d2 = jnp.where(sorted_valid[cand], d2, big)
    neg, j = jax.lax.top_k(-d2, k)
    idx_sorted = jnp.take_along_axis(cand, j, axis=1)
    # Map back to original indexing.
    idx = jnp.zeros((n, k), jnp.int32).at[inv].set(order[idx_sorted])
    dist2 = jnp.zeros((n, k)).at[inv].set(-neg)
    return idx, dist2
