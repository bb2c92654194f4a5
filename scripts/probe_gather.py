#!/usr/bin/env python
"""Probe DyNeRF-scale gather anomalies: (1) row-gather cost vs source
table size (instance build pays 6.4 ns/row at a 300k table vs 1.8 at
100k); (2) the reduce's boundary lane-gather variants."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

ITERS = 16
SALT = (time.time_ns() % 997) * 1e-7
R = 1_916_032          # DyNeRF steady-state Rp
CAPN = 1_507_328       # DyNeRF steady-state capacity
P = 300_000

rng = np.random.default_rng(0)


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
    print(f"{name:48s} {best:8.3f} ms/iter")


def scan(fn, *consts):
    @jax.jit
    def run(eps):
        def body(c, i):
            return c + fn(i.astype(jnp.float32) * 1e-3 + eps, *consts), 0
        return jax.lax.scan(body, 0.0, jnp.arange(ITERS))
    return run


def consume(*xs):
    return sum(jnp.sum(x.astype(jnp.float32)[..., ::997]) * 1e-20
               for x in xs)


# ---- 1. row gather vs table size -----------------------------------
ids_small = jnp.asarray(rng.integers(0, 100_000, R), jnp.int32)
ids_big = jnp.asarray(rng.integers(0, P, R), jnp.int32)
tab_small = jnp.asarray(rng.normal(size=(100_001, 16)), jnp.float32)
tab_big = jnp.asarray(rng.normal(size=(P + 1, 16)), jnp.float32)
ids_sorted = jnp.sort(ids_big)


def rowgather(eps, tab, ids):
    t = tab + eps
    return consume(t[ids])


timed(f"G1 {R} rows from 100k x16 table", scan(rowgather, tab_small,
                                               ids_small))
timed(f"G2 {R} rows from 300k x16 table", scan(rowgather, tab_big,
                                               ids_big))
timed(f"G3 same, SORTED ids", scan(rowgather, tab_big, ids_sorted))

tab_big8 = jnp.asarray(rng.normal(size=(P + 1, 8)), jnp.float32)
timed(f"G4 {R} rows from 300k x8 table", scan(rowgather, tab_big8,
                                              ids_big))

# ---- 2. reduce boundary gather variants ----------------------------
C = 10
csum = jnp.asarray(rng.normal(size=(C, CAPN + 1)), jnp.float32)
pos = jnp.sort(jnp.asarray(rng.integers(0, CAPN, P + 1), jnp.int32))


def lane_gather(eps):
    cz = csum + eps
    return consume(cz[:, pos])


def flat_gather(eps):
    cz = (csum + eps).reshape(-1)
    idx = (jnp.arange(C, dtype=jnp.int32)[:, None] * (CAPN + 1)
           + pos[None, :])
    return consume(cz[idx.reshape(-1)])


def perchan_gather(eps):
    cz = csum + eps
    return consume(*[cz[c][pos] for c in range(C)])


timed("R1 (10,cap)[:, pos] lane gather", scan(lane_gather))
timed("R2 flat 1-D gather (10*(P+1))", scan(flat_gather))
timed("R3 10 per-channel 1-D gathers", scan(perchan_gather))
