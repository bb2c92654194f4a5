#!/usr/bin/env python
"""Probe: HBM layout cost of (P, M, 3) arrays vs 2D packings."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

P = 100_000
ITERS = 16


def timed(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:38s} {dt:8.3f} ms/iter")


def scan_sum(x):
    @jax.jit
    def run(x):
        def body(c, i):
            return c + jnp.sum(x * (1.0 + c * 1e-20)), 0
        return jax.lax.scan(body, 0.0, jnp.arange(ITERS))
    return run, (x,)


def main():
    rng = np.random.default_rng(0)
    sh3 = jnp.asarray(rng.normal(0, 0.2, (P, 48, 3)), jnp.float32)
    sh2 = jnp.asarray(rng.normal(0, 0.2, (P, 144)), jnp.float32)
    shT = jnp.asarray(rng.normal(0, 0.2, (3, P, 48)), jnp.float32)
    big = jnp.asarray(rng.normal(0, 0.2, (P, 48, 128)), jnp.float32)

    for name, x in [("(P,48,3) sum", sh3), ("(P,144) sum", sh2),
                    ("(3,P,48) sum", shT), ("(P,48,128) sum", big)]:
        fn, args = scan_sum(x)
        timed(name, fn, *args)

    stats = jax.devices()[0].memory_stats()
    if stats:
        print({k: v for k, v in stats.items() if "bytes_in_use" in k})

    # einsum from the 2D layout: basis (P,48) x sh2 (P,144) -> (P,3)
    basis = jnp.asarray(rng.normal(0, 1, (P, 48)), jnp.float32)

    @jax.jit
    def eval2d(basis, sh2):
        def body(c, i):
            b = basis + c * 1e-20
            rgb = jnp.stack([jnp.sum(b * sh2[:, k::3], axis=-1)
                             for k in range(3)], axis=-1)
            return c + jnp.sum(rgb) * 1e-20, 0
        return jax.lax.scan(body, 0.0, jnp.arange(ITERS))
    timed("eval sh from (P,144) strided", eval2d, basis, sh2)

    @jax.jit
    def eval2dr(basis, sh2):
        def body(c, i):
            b = basis + c * 1e-20
            s = sh2.reshape(P, 48, 3)
            rgb = jnp.einsum("pm,pmc->pc", b, s)
            return c + jnp.sum(rgb) * 1e-20, 0
        return jax.lax.scan(body, 0.0, jnp.arange(ITERS))
    timed("eval sh reshape->einsum", eval2dr, basis, sh2)


if __name__ == "__main__":
    main()
