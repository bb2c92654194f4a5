#!/usr/bin/env python
"""Diagnose the delta-fill stage (~3.5 ms inside binning): scatter cost
vs cumsum cost vs alternatives. Isolated probes — only for picking
candidates; land decisions happen on the composed bench."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from fourdgs_tpu.ops import binning

P = 100_000
CAP = 720_896
ITERS = 32
SALT = (time.time_ns() % 997) * 1e-7

rng = np.random.default_rng(0)
tt = rng.integers(0, 12, P).astype(np.int32)
tt[rng.random(P) < 0.3] = 0                       # 30% zero-tile
offsets = np.cumsum(tt).astype(np.int32)
begin_np = (offsets - tt).astype(np.int32)
begin = jnp.asarray(begin_np)
ttj = jnp.asarray(tt)
f1 = jnp.asarray(rng.integers(0, 1 << 22, P), jnp.int32)
f2 = jnp.asarray(rng.integers(0, 1 << 20, P), jnp.int32)
f3 = jnp.asarray(rng.integers(0, P, P), jnp.int32)
f4 = jnp.arange(P, dtype=jnp.int32)
FIELDS = [f1, f2, f3, f4]


def timed(name, fn, *args):
    out = fn(jnp.float32(SALT), *args)
    _ = float(jax.tree.leaves(out)[0].ravel()[0])
    best = float("inf")
    for r in range(3):
        eps = jnp.float32((r + 1) * 1e-5 + SALT)
        t0 = time.perf_counter()
        out = fn(eps, *args)
        _ = float(jax.tree.leaves(out)[0].ravel()[0])
        best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
    print(f"{name:44s} {best:8.3f} ms/iter")


def scan(fn):
    @jax.jit
    def run(eps):
        def body(c, i):
            return c + fn(i.astype(jnp.float32) * 1e-3 + eps), 0
        return jax.lax.scan(body, 0.0, jnp.arange(ITERS))
    return run


def consume(*xs):
    return sum(jnp.sum(x.astype(jnp.float32)[::997]) * 1e-20 for x in xs)


def scatter_colliding(eps):
    e = (eps * 1e9).astype(jnp.int32) % 7
    rows = []
    for f in FIELDS:
        f = f + e
        d = jnp.concatenate([f[:1], f[1:] - f[:-1]])
        rows.append(jnp.zeros((CAP,), jnp.int32).at[begin].add(
            d, mode="drop"))
    return consume(*rows)


def scatter_unique(eps):
    e = (eps * 1e9).astype(jnp.int32) % 7
    live = ttj > 0
    iota = jnp.arange(P, dtype=jnp.int32)
    prev = jnp.concatenate([
        jnp.full((1,), -1, jnp.int32),
        jax.lax.cummax(jnp.where(live, iota, -1))[:-1]])
    idx = jnp.where(live, begin, CAP)
    rows = []
    for f in FIELDS:
        f = f + e
        fprev = jnp.where(prev >= 0, f[jnp.maximum(prev, 0)], 0)
        rows.append(jnp.zeros((CAP,), jnp.int32).at[idx].add(
            f - fprev, mode="drop", unique_indices=True))
    return consume(*rows)


def scatter_unique_set(eps):
    e = (eps * 1e9).astype(jnp.int32) % 7
    live = ttj > 0
    iota = jnp.arange(P, dtype=jnp.int32)
    prev = jnp.concatenate([
        jnp.full((1,), -1, jnp.int32),
        jax.lax.cummax(jnp.where(live, iota, -1))[:-1]])
    idx = jnp.where(live, begin, CAP)
    rows = []
    for f in FIELDS:
        f = f + e
        fprev = jnp.where(prev >= 0, f[jnp.maximum(prev, 0)], 0)
        rows.append(jnp.zeros((CAP,), jnp.int32).at[idx].set(
            f - fprev, mode="drop", unique_indices=True))
    return consume(*rows)


def cumsum_only(eps):
    e = (eps * 1e9).astype(jnp.int32) % 7
    stackd = jnp.stack([jnp.zeros((CAP,), jnp.int32) + e
                        for _ in range(4)]).astype(jnp.float32)
    return consume(binning._cumsum_lanes(stackd))


def scatter_then_cumsum(eps):
    e = (eps * 1e9).astype(jnp.int32) % 7
    rows = []
    for f in FIELDS:
        f = f + e
        d = jnp.concatenate([f[:1], f[1:] - f[:-1]])
        rows.append(jnp.zeros((CAP,), jnp.int32).at[begin].add(
            d, mode="drop"))
    return consume(binning._cumsum_lanes(
        jnp.stack(rows).astype(jnp.float32)))


def one_scatter_colliding(eps):
    e = (eps * 1e9).astype(jnp.int32) % 7
    f = FIELDS[0] + e
    d = jnp.concatenate([f[:1], f[1:] - f[:-1]])
    return consume(jnp.zeros((CAP,), jnp.int32).at[begin].add(
        d, mode="drop"))


timed("A 4 colliding delta scatters", scan(scatter_colliding))
timed("A1 1 colliding delta scatter", scan(one_scatter_colliding))
timed("B 4 unique scatters (+gathers)", scan(scatter_unique))
timed("B2 4 unique SET scatters (+gathers)", scan(scatter_unique_set))
timed("C cumsum_lanes only", scan(cumsum_only))
timed("D colliding scatters + cumsum", scan(scatter_then_cumsum))


def scatter_batched(eps):
    """All 4 delta fields as sublanes of ONE scatter into (4, CAP)."""
    e = (eps * 1e9).astype(jnp.int32) % 7
    ds = []
    for f in FIELDS:
        f = f + e
        ds.append(jnp.concatenate([f[:1], f[1:] - f[:-1]]))
    vals = jnp.stack(ds)                       # (4, P)
    arr = jnp.zeros((4, CAP), jnp.int32).at[:, begin].add(
        vals, mode="drop")
    return consume(arr)


timed("E one batched (4,CAP) scatter", scan(scatter_batched))
