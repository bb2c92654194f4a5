#!/usr/bin/env python
"""Composed-prefix bisect of the inference (render) path at bench
budgets: pre -> bin(grad=False) -> packed inst build -> infer kernel ->
image assembly. Usage: [--dynerf]"""
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
from fourdgs_tpu.render import render

ITERS = 32
REPS = 3
if "--dynerf" in sys.argv:
    P, H, W = 300_000, 1014, 1352
    CAPACITY = 2 ** 21
    TDUR, SCALE_MU = 10.0, -4.9
    ITERS = 16
else:
    P, H, W = 100_000, 800, 800
    CAPACITY = 3 * 2 ** 18
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
    global CAPACITY
    scene, cam, tgt = build_inputs(p=P, h=H, w=W, scale_mu=SCALE_MU)
    camarr = pre.CameraArrays(**cam) if isinstance(cam, dict) else cam
    bg = jnp.zeros(3, jnp.float32)

    @jax.jit
    def probe(s):
        proc = pre.preprocess(**s, camera=camarr, opts=OPTS)
        ab = binning.bin_gaussians_aligned(
            jax.lax.stop_gradient(proc), OPTS, CAPACITY,
            pallas_blend.CHUNK, grad=False)
        return ab.num_rendered, ab.total_len
    nr0, tl0 = (int(x) for x in probe(scene))
    CAPACITY = min(CAPACITY, -(-int(nr0 * 1.2) // 65536) * 65536)
    dummy = max(128, -(-int((tl0 - nr0) * 1.3) // 128) * 128)
    print(f"budgets: capacity={CAPACITY} dummy={dummy}")

    def consume(*xs):
        return sum(jnp.sum(x.astype(jnp.float32)[..., ::997]) * 1e-20
                   for x in xs)

    def stage_pre(s, eps):
        cam2 = camarr._replace(timestamp=camarr.timestamp + eps)
        return pre.preprocess(**s, camera=cam2, opts=OPTS)

    def parts(s, eps):
        proc = stage_pre(s, eps)
        abins = binning.bin_gaussians_aligned(
            proc, OPTS, CAPACITY, pallas_blend.CHUNK, dummy_cap=dummy,
            grad=False)
        return proc, abins

    def upto_pre(s, eps):
        proc = stage_pre(s, eps)
        return consume(*[x for x in jax.tree.leaves(proc)
                         if x.ndim > 0])

    def upto_bin(s, eps):
        proc, abins = parts(s, eps)
        return (consume(proc.xy, proc.conic, proc.opacity, proc.rgb)
                + consume(abins.row_id, abins.source_perm,
                          abins.tile_start, abins.tile_count))

    def upto_inst(s, eps):
        proc, abins = parts(s, eps)
        feat_rgbd = jnp.concatenate(
            [proc.rgb, proc.depth[:, None]], axis=-1)
        inst = pallas_blend._build_inst_data_infer(
            proc.xy, proc.conic, proc.opacity, feat_rgbd, abins)
        return consume(proc.xy) + jnp.sum(
            inst[:, ::997].astype(jnp.float32)) * 1e-20

    def upto_full(s, eps):
        cam2 = camarr._replace(timestamp=camarr.timestamp + eps)
        out = render(**s, camera=cam2, bg=bg, opts=OPTS,
                     capacity=CAPACITY, max_per_tile=4096, chunk=32,
                     backend="pallas", infer=True, dummy_cap=dummy)
        return (jnp.mean(out.color) + jnp.mean(out.depth)
                + jnp.mean(out.alpha))

    timed("1 pre", scan(upto_pre), scene)
    timed("2 pre+bin (nograd)", scan(upto_bin), scene)
    timed("3 + packed inst build", scan(upto_inst), scene)
    timed("4 full render (infer)", scan(upto_full), scene)


if __name__ == "__main__":
    main()
