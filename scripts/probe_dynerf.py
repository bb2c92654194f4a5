#!/usr/bin/env python
"""Fine-grained composed-prefix bisect of the two DyNeRF-shape anomalies
(instance build 17.8 ms, grad-reduce non-sort 19.5 ms — vs 1.7/1.5 at the
DNeRF shape at only 2.7x capacity). Same scan/salt methodology as
scripts/bisect_fwd.py."""
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

ITERS = 16
REPS = 3
if "--dnerf" in sys.argv:
    P, H, W = 100_000, 800, 800
    CAPACITY = 3 * 2 ** 18
    TDUR, SCALE_MU = 1.0, -4.2
else:
    P, H, W = 300_000, 1014, 1352
    CAPACITY = 2 ** 21
    TDUR, SCALE_MU = 10.0, -4.9
OPTS = RenderOptions(height=H, width=W, gaussian_dim=4, rot_4d=True,
                     time_duration=TDUR)
SALT = (time.time_ns() % 997) * 1e-7
ROW, CHUNK = pallas_blend.ROW, pallas_blend.CHUNK


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
    print(f"{name:44s} {best:8.2f} ms/iter")
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

    def stage_pre(s, eps):
        return pre.preprocess(
            **{**s, "means3d": s["means3d"] + eps}, camera=camarr, opts=OPTS)

    def parts(s, eps):
        proc = stage_pre(s, eps)
        abins = binning.bin_gaussians_aligned(
            jax.lax.stop_gradient(proc), OPTS, CAPACITY, CHUNK)
        return proc, abins

    def consume(tree):
        return sum(jnp.sum(x.astype(jnp.float32)[::1000]) * 1e-20
                   for x in jax.tree.leaves(tree)
                   if hasattr(x, "ndim") and x.ndim > 0)

    def upto_bin(s, eps):
        proc, abins = parts(s, eps)
        return consume(proc) + consume(abins)

    def src_of(proc):
        p = proc.xy.shape[0]
        feat = jnp.concatenate(
            [proc.rgb, proc.depth[:, None], proc.flow], axis=-1)
        return jnp.concatenate([
            proc.xy, proc.conic, proc.opacity[:, None], feat,
            jnp.zeros((p, ROW - 12), jnp.float32)], axis=1)

    def upto_srcperm(s, eps):
        proc, abins = parts(s, eps)
        src = src_of(proc)[abins.source_perm]
        return consume(proc) + consume(abins) + jnp.sum(src[::997]) * 1e-20

    def upto_rowgather(s, eps):
        proc, abins = parts(s, eps)
        p = proc.xy.shape[0]
        src = jnp.concatenate([src_of(proc)[abins.source_perm],
                               jnp.zeros((1, ROW), jnp.float32)], axis=0)
        ids = jnp.concatenate([jnp.minimum(abins.row_id, p),
                               jnp.full((CHUNK,), p, jnp.int32)])
        rows = src[ids]
        return (consume(proc) + consume(abins)
                + jnp.sum(rows[::997]) * 1e-20)

    def upto_inst(s, eps):
        proc, abins = parts(s, eps)
        feat = jnp.concatenate(
            [proc.rgb, proc.depth[:, None], proc.flow], axis=-1)
        inst = pallas_blend._build_inst_data(
            proc.xy, proc.conic, proc.opacity, feat, abins)
        return (consume(proc) + consume(abins)
                + jnp.sum(inst[:, ::997]) * 1e-20)

    # ---- grad-reduce decomposition (synthetic entry grads: the real
    # ones need the bwd kernel; stage deltas below are vs upto_bin) ----
    def eg_of(abins, rp, eps):
        base = (jnp.arange(rp, dtype=jnp.uint32) % 251).astype(jnp.uint32)
        return jnp.stack([base + jnp.uint32(i) for i in range(5)]) + (
            eps * 0).astype(jnp.uint32)

    def upto_reduce_sort(s, eps):
        proc, abins = parts(s, eps)
        rp = abins.row_id.shape[0]
        eg = eg_of(abins, rp, eps)
        live = jnp.arange(rp, dtype=jnp.int32) < abins.total_len
        packed = [jnp.where(live, eg[i], jnp.uint32(0)) for i in range(5)]
        srt = jax.lax.sort((abins.row_id.astype(jnp.uint32),)
                           + tuple(packed), num_keys=1, is_stable=False)
        return (consume(proc) + consume(abins)
                + sum(jnp.sum(x[::997].astype(jnp.float32)) * 1e-20
                      for x in srt[1:]))

    def upto_reduce_cumsum(s, eps):
        proc, abins = parts(s, eps)
        rp = abins.row_id.shape[0]
        eg = eg_of(abins, rp, eps)
        live = jnp.arange(rp, dtype=jnp.int32) < abins.total_len
        packed = [jnp.where(live, eg[i], jnp.uint32(0)) for i in range(5)]
        srt = jax.lax.sort((abins.row_id.astype(jnp.uint32),)
                           + tuple(packed), num_keys=1, is_stable=False)
        rows = []
        for i, v in enumerate(srt[1:]):
            v = v[:CAPACITY]
            rows.append(jax.lax.bitcast_convert_type(
                (v >> 16).astype(jnp.uint16), jnp.bfloat16))
            rows.append(jax.lax.bitcast_convert_type(
                v.astype(jnp.uint16), jnp.bfloat16))
        stacked = jnp.stack([r.astype(jnp.float32) for r in rows], axis=0)
        csum = binning._cumsum_lanes(stacked)
        return (consume(proc) + consume(abins)
                + jnp.sum(csum[:, ::997]) * 1e-20)

    def upto_reduce_full(s, eps):
        proc, abins = parts(s, eps)
        rp = abins.row_id.shape[0]
        eg = eg_of(abins, rp, eps)
        pg = binning.aligned_entry_grads_to_gaussian_grads(
            eg, abins, capacity=CAPACITY, fast=True, identity_out_perm=True)
        return (consume(proc) + consume(abins)
                + jnp.sum(pg[::997]) * 1e-20)

    timed("0 pre+bin", scan(upto_bin), scene)
    timed("1 + src permute", scan(upto_srcperm), scene)
    timed("2 + row gather", scan(upto_rowgather), scene)
    timed("3 + transpose (full inst)", scan(upto_inst), scene)
    timed("R1 pre+bin + reduce sort", scan(upto_reduce_sort), scene)
    timed("R2 pre+bin + sort+unpack+cumsum", scan(upto_reduce_cumsum), scene)
    timed("R3 pre+bin + full reduce", scan(upto_reduce_full), scene)

    abins = jax.jit(lambda s: parts(s, jnp.float32(0.0))[1])(scene)
    print("Rp:", abins.row_id.shape[0], "capacity:", CAPACITY,
          "tiles:", OPTS.num_tiles,
          "num_rendered:", int(abins.num_rendered),
          "total_len:", int(abins.total_len))


if __name__ == "__main__":
    main()
