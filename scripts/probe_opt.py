#!/usr/bin/env python
"""A/B micro-probes for round-3 perf work (real TPU, bench shapes).

Timing pattern (the only reliable one on the serialized tunnel, where
block_until_ready resolves before device completion): ONE jit containing a
lax.scan whose carry feeds each iteration's inputs (defeats hoisting and
caching), synced by a host float() fetch. Per-iter = total / ITERS.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

P = 100_000
RP = 1_106_432          # bench aligned capacity (786432 + 2500*128)
CAP = 786_432
ITERS = 16


def timed(name, make_body, *args):
    """make_body(c, *args) -> (new_c_contrib, tiny_probe). Run scan."""
    @jax.jit
    def run(*a):
        def body(c, i):
            out = make_body(c, *a)
            return out * 1e-20 + c * 0.5, 0
        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
        return c

    float(run(*args))                       # compile+warm (host sync)
    t0 = time.perf_counter()
    float(run(*args))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:46s} {dt:8.3f} ms/iter")


def main():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(P + 1, 16)), jnp.float32)
    gid = jnp.asarray(rng.integers(0, P + 1, RP), jnp.int32)

    def pert_ids(c, ids, hi):
        # index perturbation that depends on the carry (cheap, unhoistable)
        return jnp.minimum(ids + (c > 1e30).astype(jnp.int32), hi)

    # A) current: row gather + .T (field-major out, like _build_inst_data)
    def inst_cur(c, src, gid):
        rows = src[pert_ids(c, gid, P)]          # (Rp, 16)
        fm = rows.T                              # (16, Rp)
        return jnp.sum(fm[:, ::4096])
    timed("inst: row gather + .T (current)", inst_cur, src, gid)

    # B) grouped gather (8 ids/row) -> compact -> field-major transpose
    def inst_grp(c, src, gid):
        ids8 = pert_ids(c, gid, P).reshape(RP // 8, 8)
        g8 = src[ids8]                           # (Rp/8, 8, 16)
        flat = g8.reshape(RP // 8, 128)
        fm = (flat.reshape(RP // 8, 8, 16).transpose(2, 0, 1)
              .reshape(16, RP))
        return jnp.sum(fm[:, ::4096])
    timed("inst: grouped gather + transpose", inst_grp, src, gid)

    # B2) grouped gather, flat consumer (lower bound, no transpose)
    def inst_grp_flat(c, src, gid):
        ids8 = pert_ids(c, gid, P).reshape(RP // 8, 8)
        flat = src[ids8].reshape(RP // 8, 128)
        return jnp.sum(flat[::512])
    timed("inst: grouped gather flat (bound)", inst_grp_flat, src, gid)

    # C) binning packed gather (P,8) rows at R=786k + columnar use
    src8 = jnp.asarray(rng.normal(size=(P, 8)), jnp.float32)
    gidr = jnp.asarray(rng.integers(0, P, CAP), jnp.int32)

    def bpack_cur(c, src8, gidr):
        g = src8[pert_ids(c, gidr, P - 1)]       # (R, 8)
        v = (g[:, 0] + g[:, 1] * 2.0 + g[:, 2] * g[:, 3] + g[:, 4])
        return jnp.sum(v[::512])
    timed("bin: (R,8) row gather + columnar use", bpack_cur, src8, gidr)

    def bpack_grp(c, src8, gidr):
        ids16 = pert_ids(c, gidr, P - 1).reshape(CAP // 16, 16)
        flat = src8[ids16].reshape(CAP // 16, 128)
        cols = (flat.reshape(CAP // 16, 16, 8).transpose(2, 0, 1)
                .reshape(8, CAP))
        v = cols[0] + cols[1] * 2.0 + cols[2] * cols[3] + cols[4]
        return jnp.sum(v[::512])
    timed("bin: grouped gather + transpose + use", bpack_grp, src8, gidr)

    # D) binning sort variants
    tiles = jnp.asarray(rng.integers(0, 2501, RP), jnp.int32)
    depth = jnp.asarray(rng.normal(size=RP), jnp.float32)
    gids = jnp.asarray(rng.integers(0, P + 1, RP), jnp.int32)
    slot = jnp.asarray(rng.permutation(RP).astype(np.int32))

    def pert_f(c, x):
        return x + (c > 1e30).astype(jnp.float32)

    def sort_stable(c, t, d, g, s):
        o = jax.lax.sort((t, pert_f(c, d), g, s), num_keys=2,
                         is_stable=True)
        return jnp.sum(o[1][::4096])
    timed("bin sort: 2-key stable (current)", sort_stable,
          tiles, depth, gids, slot)

    def sort_3key(c, t, d, g, s):
        o = jax.lax.sort((t, pert_f(c, d), s, g), num_keys=3,
                         is_stable=False)
        return jnp.sum(o[1][::4096])
    timed("bin sort: 3-key unique unstable", sort_3key,
          tiles, depth, gids, slot)

    def sort_nogid(c, t, d, s):
        o = jax.lax.sort((t, pert_f(c, d), s), num_keys=3,
                         is_stable=False)
        return jnp.sum(o[1][::4096])
    timed("bin sort: 3-key, no gid payload", sort_nogid,
          tiles, depth, slot)

    # E) grad-reduce sort variants
    pl = [jnp.asarray(
        rng.integers(0, 2**32, RP, dtype=np.uint64).astype(np.uint32))
        for _ in range(5)]

    def pert_u(c, x):
        return x + (c > 1e30).astype(jnp.uint32)

    def rsort_cur(c, s, p0, p1, p2, p3, p4):
        o = jax.lax.sort((s, pert_u(c, p0), p1, p2, p3, p4), num_keys=1)
        return jnp.sum(o[1][::4096].astype(jnp.float32))
    timed("reduce sort: key + 5 u32 (current)", rsort_cur, slot, *pl)

    def rsort4(c, s, p0, p1, p2, p3):
        o = jax.lax.sort((s, pert_u(c, p0), p1, p2, p3), num_keys=1)
        return jnp.sum(o[1][::4096].astype(jnp.float32))
    timed("reduce sort: key + 4 u32", rsort4, slot, *pl[:4])

    # F) cumsum (10, CAP) XLA vs matmul-chunked
    gr = jnp.asarray(rng.normal(size=(10, CAP)), jnp.float32)

    def cums_xla(c, gr):
        cs = jnp.cumsum(gr + c * 1e-30, axis=1)
        return jnp.sum(cs[:, ::4096])
    timed("cumsum (10,786k) XLA", cums_xla, gr)

    def cums_mm(c, gr):
        x = (gr + c * 1e-30).reshape(10, CAP // 128, 128)
        r = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        tri = (r <= cidx).astype(jnp.float32)
        intra = jax.lax.dot_general(
            x, tri, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)       # (10, B, 128)
        block_tot = intra[:, :, -1]                    # (10, B)
        carry = jnp.cumsum(block_tot, axis=1) - block_tot
        cs = intra + carry[:, :, None]
        return jnp.sum(cs.reshape(10, CAP)[:, ::4096])
    timed("cumsum (10,786k) matmul-chunked", cums_mm, gr)


if __name__ == "__main__":
    main()
