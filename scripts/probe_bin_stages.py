#!/usr/bin/env python
"""Cumulative-prefix bisect INSIDE bin_gaussians_aligned (rank path) at
bench budgets: which sub-stage owns the ~6.7 ms."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

from bench import build_inputs
from fourdgs_tpu.ops import binning, pallas_blend
from fourdgs_tpu.ops import preprocess as pre
from fourdgs_tpu.ops.preprocess import RenderOptions

ITERS = 32
REPS = 3
if "--dynerf" in sys.argv:
    P, H, W = 300_000, 1014, 1352
    CAPACITY0 = 2 ** 21
    TDUR, SCALE_MU = 10.0, -4.9
    ITERS = 16
else:
    P, H, W = 100_000, 800, 800
    CAPACITY0 = 3 * 2 ** 18
    TDUR, SCALE_MU = 1.0, -4.2
OPTS = RenderOptions(height=H, width=W, gaussian_dim=4, rot_4d=True,
                     time_duration=TDUR)
SALT = (time.time_ns() % 997) * 1e-7


def timed(name, fn, *args):
    out = fn(jnp.float32(SALT), *args)
    _ = float(jax.tree.leaves(out)[0].ravel()[0])
    best = float("inf")
    for r in range(REPS):
        eps = jnp.float32((r + 1) * 1e-5 + SALT)
        t0 = time.perf_counter()
        out = fn(eps, *args)
        _ = float(jax.tree.leaves(out)[0].ravel()[0])
        best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
    print(f"{name:40s} {best:8.2f} ms/iter")
    return out


def scan(fn):
    @jax.jit
    def run(eps, s):
        def body(c, i):
            return c + fn(s, i.astype(jnp.float32) * 1e-5 + eps), 0
        return jax.lax.scan(body, 0.0, jnp.arange(ITERS))
    return run


def main():
    scene, cam, tgt = build_inputs(p=P, h=H, w=W, scale_mu=SCALE_MU)
    camarr = pre.CameraArrays(**cam) if isinstance(cam, dict) else cam

    @jax.jit
    def probe0(s):
        proc = pre.preprocess(**s, camera=camarr, opts=OPTS)
        ab = binning.bin_gaussians_aligned(
            jax.lax.stop_gradient(proc), OPTS, CAPACITY0,
            pallas_blend.CHUNK)
        return ab.num_rendered, ab.total_len
    nr0, tl0 = (int(x) for x in probe0(scene))
    capacity = min(CAPACITY0, -(-int(nr0 * 1.2) // 65536) * 65536)
    ndum = max(128, -(-int((tl0 - nr0) * 1.3) // 128) * 128)
    print(f"budgets: capacity={capacity} dummy={ndum}")
    k = pallas_blend.CHUNK
    span = 1 << max(1, int(P + 1).bit_length())

    def stage_pre(s, eps):
        return pre.preprocess(
            **{**s, "means3d": s["means3d"] + eps}, camera=camarr, opts=OPTS)

    def consume(*xs):
        return sum(jnp.sum(x.astype(jnp.float32)[::997]) * 1e-20
                   for x in xs)

    # -- sub-stage prefixes of _bin_aligned_rank ------------------------
    def upto_prologue(s, eps):
        proc = stage_pre(s, eps)
        offsets, num_rendered, last_full, num_eff = \
            binning._instance_prologue(proc, capacity)
        return consume(offsets) + num_rendered * 1e-20

    def upto_rank(s, eps):
        proc = stage_pre(s, eps)
        offsets, num_rendered, last_full, num_eff = \
            binning._instance_prologue(proc, capacity)
        iota_p = jnp.arange(P, dtype=jnp.int32)
        _, gauss_of_rank = jax.lax.sort((proc.depth, iota_p), num_keys=2)
        rank = jnp.zeros((P,), jnp.int32).at[gauss_of_rank].set(
            iota_p, unique_indices=True)
        return consume(offsets, rank)

    def fills_of(proc, offsets, last_full, num_eff):
        iota_p = jnp.arange(P, dtype=jnp.int32)
        _, gauss_of_rank = jax.lax.sort((proc.depth, iota_p), num_keys=2)
        rank = jnp.zeros((P,), jnp.int32).at[gauss_of_rank].set(
            iota_p, unique_indices=True)
        begin = offsets - proc.tiles_touched
        xyw = (proc.rect[:, 0] + proc.rect[:, 1] * 256
               + jnp.maximum(proc.rect[:, 2] - proc.rect[:, 0], 1) * 65536)
        fields = [xyw, begin, rank, iota_p]
        rows = []
        for f in fields:
            d = jnp.concatenate([f[:1], f[1:] - f[:-1]])
            rows.append(jnp.zeros((capacity,), jnp.int32).at[begin].add(
                d, mode="drop"))
        return binning._cumsum_lanes(jnp.stack(rows).astype(jnp.float32))

    def upto_fills(s, eps):
        proc = stage_pre(s, eps)
        offsets, num_rendered, last_full, num_eff = \
            binning._instance_prologue(proc, capacity)
        filled = fills_of(proc, offsets, last_full, num_eff)
        return consume(filled)

    def decode_of(filled, num_eff):
        slots = jnp.arange(capacity, dtype=jnp.int32)
        w_f = jnp.floor(filled[0] * (1.0 / 65536.0))
        rem = filled[0] - w_f * 65536.0
        y0f = jnp.floor(rem * (1.0 / 256.0))
        x0 = (rem - y0f * 256.0).astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)
        width = w_f.astype(jnp.int32)
        begin_f = filled[1].astype(jnp.int32)
        local = slots - begin_f
        row = (local.astype(jnp.float32) * (1.0 / w_f)).astype(jnp.int32)
        row = jnp.where((row + 1) * width <= local, row + 1, row)
        row = jnp.where(row * width > local, row - 1, row)
        tile = (y0 + row) * OPTS.tiles_x + x0 + (local - row * width)
        valid = slots < num_eff
        key = jnp.where(
            valid,
            tile.astype(jnp.uint32) * jnp.uint32(span)
            + filled[2].astype(jnp.uint32),
            jnp.uint32(0xFFFFFFFF))
        gid = jnp.where(valid, filled[3].astype(jnp.int32), P)
        return key, gid

    def upto_decode(s, eps):
        proc = stage_pre(s, eps)
        offsets, num_rendered, last_full, num_eff = \
            binning._instance_prologue(proc, capacity)
        filled = fills_of(proc, offsets, last_full, num_eff)
        key, gid = decode_of(filled, num_eff)
        return consume(key, gid)

    def upto_hist(s, eps):
        proc = stage_pre(s, eps)
        offsets, num_rendered, last_full, num_eff = \
            binning._instance_prologue(proc, capacity)
        filled = fills_of(proc, offsets, last_full, num_eff)
        key, gid = decode_of(filled, num_eff)
        counts = binning._rect_histogram(proc, OPTS, last_full)
        return consume(key, gid, counts)

    def upto_sort(s, eps):
        proc = stage_pre(s, eps)
        offsets, num_rendered, last_full, num_eff = \
            binning._instance_prologue(proc, capacity)
        filled = fills_of(proc, offsets, last_full, num_eff)
        key, gid = decode_of(filled, num_eff)
        counts = binning._rect_histogram(proc, OPTS, last_full)
        pad = (-counts) % k
        owner, live_d, total_pad = binning._dummy_owner(
            pad, ndum, OPTS.num_tiles)
        dummy_key = jnp.where(
            live_d,
            owner.astype(jnp.uint32) * jnp.uint32(span)
            + jnp.uint32(span - 1),
            jnp.uint32(0xFFFFFFFF))
        all_key = jnp.concatenate([key, dummy_key])
        all_gid = jnp.concatenate([gid, jnp.full((ndum,), P, jnp.int32)])
        _, gid_s = jax.lax.sort(
            (all_key, all_gid), num_keys=1, is_stable=False)
        return consume(gid_s, counts)

    def upto_full(s, eps):
        proc = stage_pre(s, eps)
        ab = binning.bin_gaussians_aligned(
            jax.lax.stop_gradient(proc), OPTS, capacity, k,
            dummy_cap=ndum)
        return consume(*[x for x in jax.tree.leaves(ab) if x.ndim > 0])

    timed("0 pre only", scan(lambda s, e: consume(
        *[x for x in jax.tree.leaves(stage_pre(s, e)) if x.ndim > 0])),
        scene)
    timed("1 + prologue (offsets/searchsorted)", scan(upto_prologue), scene)
    timed("2 + depth-rank sort", scan(upto_rank), scene)
    timed("3 + delta fills cumsum", scan(upto_fills), scene)
    timed("4 + slot decode (VPU)", scan(upto_decode), scene)
    timed("5 + rect histogram", scan(upto_hist), scene)
    timed("6 + main sort", scan(upto_sort), scene)
    timed("7 full bin_gaussians_aligned", scan(upto_full), scene)


if __name__ == "__main__":
    main()
