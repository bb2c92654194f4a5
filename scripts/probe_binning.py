#!/usr/bin/env python
"""Sub-stage timing inside bin_gaussians_aligned at bench shape, plus
candidate rewrites (single-key stencil sort, dummy-free main sort with
post-sort aligned reconstruction)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from bench import build_inputs
from fourdgs_tpu.ops import binning, pallas_blend
from fourdgs_tpu.ops import preprocess as pre
from fourdgs_tpu.ops.preprocess import RenderOptions

ITERS = 32
REPS = 3
H = W = 800
CAPACITY = 3 * 2 ** 18
OPTS = RenderOptions(height=H, width=W, gaussian_dim=4, rot_4d=True,
                     time_duration=1.0)
K = pallas_blend.CHUNK


def timed(name, fn, *args):
    out = jax.block_until_ready(fn(jnp.float32(0.0), *args))
    best = float("inf")
    for r in range(REPS):
        eps = jnp.float32((r + 1) * 1e-7)
        t0 = time.perf_counter()
        out = fn(eps, *args)
        _ = float(jax.tree.leaves(out)[0].ravel()[0])  # fetch: block_until_ready
        # alone can return before device completion on this plugin
        best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
    print(f"{name:40s} {best:8.2f} ms/iter")
    return out


def scan(fn):
    @jax.jit
    def run(eps, *args):
        def body(c, i):
            return fn(c * 1e-6 + eps, *args), 0
        return jax.lax.scan(body, 0.0, jnp.arange(ITERS))
    return run


def main():
    scene, cam, tgt = build_inputs(h=H, w=W)
    camarr = pre.CameraArrays(**cam) if isinstance(cam, dict) else cam
    proc = jax.jit(lambda s: pre.preprocess(**s, camera=camarr,
                                            opts=OPTS))(scene)
    p = proc.tiles_touched.shape[0]
    num_tiles = OPTS.num_tiles
    tiles_x, tiles_y = OPTS.tiles_x, OPTS.tiles_y
    rp = binning.aligned_capacity(CAPACITY, num_tiles, K)
    print(f"P={p} capacity={CAPACITY} rp={rp} tiles={num_tiles}")

    # Perturbation: nudging depth perturbs sort keys; nudging rect is
    # integer so instead rebuild tiles_touched from it each iter via a
    # float add that XLA can't hoist.
    def jproc(e):
        return proc._replace(depth=proc.depth + e)

    def consume(x):
        return jnp.sum(x.astype(jnp.float32)[::4096]) * 1e-20

    # full aligned binning
    def full(e):
        ab = binning.bin_gaussians_aligned(jproc(e), OPTS, CAPACITY, K)
        return (consume(ab.row_id)  # (historical: + slot)
                + consume(ab.tile_start) + consume(ab.tile_count))
    timed("full bin_gaussians_aligned", scan(full))

    # owner map: marks scatter + cumsum over capacity
    def owner_map(e):
        tt = proc.tiles_touched
        offsets = jnp.cumsum(tt, dtype=jnp.int32)
        begin = offsets - tt
        begin = begin + (e * 0).astype(jnp.int32)
        marks = jnp.zeros((CAPACITY,), jnp.int32).at[begin].add(
            1, mode="drop")
        owner = jnp.cumsum(marks) - 1
        return consume(owner) + consume(offsets)
    timed("owner map (marks+cumsum)", scan(owner_map))

    # packed row gather (R, 8)
    offsets0 = jnp.cumsum(proc.tiles_touched, dtype=jnp.int32)
    begin0 = offsets0 - proc.tiles_touched
    marks0 = jnp.zeros((CAPACITY,), jnp.int32).at[begin0].add(1, mode="drop")
    owner0 = jnp.clip(jnp.cumsum(marks0) - 1, 0, p - 1)

    def row_gather(e):
        packed = jnp.stack([
            proc.rect[:, 0].astype(jnp.float32) + e,
            proc.rect[:, 1].astype(jnp.float32),
            jnp.maximum(proc.rect[:, 2] - proc.rect[:, 0], 1).astype(
                jnp.float32),
            begin0.astype(jnp.float32),
            proc.depth,
            jnp.zeros((p,), jnp.float32),
            jnp.zeros((p,), jnp.float32),
            jnp.zeros((p,), jnp.float32)], axis=1)
        g = packed[owner0]
        return consume(g)
    timed("packed row gather (R,8)", scan(row_gather))

    # stencil histogram, current 2-col sort
    def stencil2(e):
        included = (proc.tiles_touched > 0).astype(jnp.int32)
        gx0, gy0 = proc.rect[:, 0], proc.rect[:, 1]
        gx1, gy1 = proc.rect[:, 2], proc.rect[:, 3]
        gw = tiles_x + 1
        cells = jnp.concatenate([
            gy0 * gw + gx0, gy0 * gw + gx1, gy1 * gw + gx0, gy1 * gw + gx1])
        cells = cells + (e * 0).astype(jnp.int32)
        signs = jnp.concatenate([included, -included, -included, included])
        ncells = (tiles_y + 1) * gw
        cells_s, signs_s = jax.lax.sort((cells, signs), num_keys=1)
        csum_s = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(signs_s)])
        bounds = jnp.searchsorted(
            cells_s, jnp.arange(ncells + 1, dtype=jnp.int32), side="left")
        diff = csum_s[bounds[1:]] - csum_s[bounds[:-1]]
        counts2d = jnp.cumsum(jnp.cumsum(
            diff.reshape(tiles_y + 1, gw), axis=0), axis=1)
        return consume(counts2d)
    timed("stencil histogram (2-col sort)", scan(stencil2))

    # stencil histogram, packed single-key sort: key = cell*2 + (sign>0)
    def stencil1(e):
        included = proc.tiles_touched > 0
        gx0, gy0 = proc.rect[:, 0], proc.rect[:, 1]
        gx1, gy1 = proc.rect[:, 2], proc.rect[:, 3]
        gw = tiles_x + 1
        ncells = (tiles_y + 1) * gw
        cells = jnp.concatenate([
            gy0 * gw + gx0, gy0 * gw + gx1, gy1 * gw + gx0, gy1 * gw + gx1])
        pos = jnp.concatenate([included, ~included, ~included, included])
        # excluded entries -> sentinel cell ncells (sign 0 not stored)
        live = jnp.concatenate([included] * 4)
        key = jnp.where(live, cells * 2 + pos.astype(jnp.int32),
                        2 * ncells)
        key = key + (e * 0).astype(jnp.int32)
        key_s = jax.lax.sort(key)
        # prefix count of +1s minus -1s per cell boundary:
        # count of keys < 2*c+0 gives total entries before cell c; we
        # need signed sum: signed cumsum = (#pos - #neg) among first i.
        sgn_s = jnp.where(key_s >= 2 * ncells, 0,
                          jnp.where(key_s % 2 == 1, 1, -1))
        csum_s = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(sgn_s)])
        bounds = jnp.searchsorted(
            key_s, jnp.arange(ncells + 1, dtype=jnp.int32) * 2,
            side="left")
        diff = csum_s[bounds[1:]] - csum_s[bounds[:-1]]
        counts2d = jnp.cumsum(jnp.cumsum(
            diff.reshape(tiles_y + 1, gw), axis=0), axis=1)
        return consume(counts2d)
    timed("stencil histogram (1-col sort)", scan(stencil1))

    # main sort, current: 4 ops x rp rows, 3 keys
    tile0 = jnp.where(jnp.arange(CAPACITY) < offsets0[-1],
                      owner0 % num_tiles, num_tiles).astype(jnp.int32)
    depth0 = jnp.where(jnp.arange(CAPACITY) < offsets0[-1],
                       proc.depth[owner0], jnp.inf)
    n_dummy = rp - CAPACITY
    all_tile = jnp.concatenate(
        [tile0, jnp.full((n_dummy,), num_tiles, jnp.int32)])
    all_depth = jnp.concatenate(
        [depth0, jnp.full((n_dummy,), jnp.inf, jnp.float32)])
    all_gid = jnp.concatenate(
        [owner0, jnp.full((n_dummy,), p, jnp.int32)])
    all_slot = jnp.arange(rp, dtype=jnp.int32)

    def sort4(e):
        _, _, s, g = jax.lax.sort(
            (all_tile, all_depth + e, all_slot, all_gid), num_keys=3,
            is_stable=False)
        return consume(s) + consume(g)
    timed("main sort 4ops x 1.1M (cur)", scan(sort4))

    def sort3_live(e):
        _, _, s = jax.lax.sort(
            (tile0, depth0 + e, jnp.arange(CAPACITY, dtype=jnp.int32)),
            num_keys=3, is_stable=False)
        return consume(s)
    timed("main sort 3ops x 786k (live)", scan(sort3_live))

    def sort3_live_recon(e):
        _, _, s = jax.lax.sort(
            (tile0, depth0 + e, jnp.arange(CAPACITY, dtype=jnp.int32)),
            num_keys=3, is_stable=False)
        gid_c = owner0[s]                       # gid via gather
        # aligned reconstruction: tile-of-aligned-position via marks +
        # cumsum over rp, then gather compact rows.
        counts = jnp.ones((num_tiles,), jnp.int32) * (
            CAPACITY // num_tiles)              # stand-in counts
        pad = (-counts) % K
        sums = jnp.cumsum(counts + pad)
        aligned_off = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                       sums[:-1]])
        cstart = jnp.cumsum(counts) - counts
        tmarks = jnp.zeros((rp,), jnp.int32).at[aligned_off].add(
            1, mode="drop")
        tile_of = jnp.cumsum(tmarks) - 1
        src = (jnp.arange(rp, dtype=jnp.int32)
               - aligned_off[tile_of] + cstart[tile_of])
        live = (jnp.arange(rp, dtype=jnp.int32) - aligned_off[tile_of]
                < counts[tile_of])
        src = jnp.where(live, jnp.minimum(src, CAPACITY - 1), 0)
        g2 = jnp.where(live, gid_c[src], p)
        s2 = jnp.where(live, s[src], CAPACITY)
        return consume(g2) + consume(s2)
    timed("main sort 3x786k + recon", scan(sort3_live_recon))


if __name__ == "__main__":
    main()
