#!/usr/bin/env python
"""Bisect the backward pass at bench shape: cumulative suffixes of the
gradient pipeline under one jit (scan, salted varied inputs, fetched
outputs)."""
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
from fourdgs_tpu.utils.losses import photometric_loss

ITERS = 32
REPS = 3
if "--dynerf" in sys.argv:  # flame_salmon-class shape, mirrors bench.py
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
    print(f"{name:38s} {best:8.2f} ms/iter")
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

    # Same steady-state budget probe as bench.py.
    @jax.jit
    def probe(s):
        proc = pre.preprocess(**s, camera=camarr, opts=OPTS)
        ab = binning.bin_gaussians_aligned(
            jax.lax.stop_gradient(proc), OPTS, CAPACITY,
            pallas_blend.CHUNK)
        return ab.num_rendered, ab.total_len
    nr0, tl0 = (int(x) for x in probe(scene))
    CAPACITY = min(CAPACITY, -(-int(nr0 * 1.2) // 65536) * 65536)
    dummy = max(128, -(-int((tl0 - nr0) * 1.3) // 128) * 128)
    print(f"budgets: capacity={CAPACITY} dummy={dummy}")
    pcfg = pallas_blend.PallasBlendConfig(
        height=H, width=W, tiles_x=OPTS.tiles_x, tiles_y=OPTS.tiles_y,
        fast_grad_reduce=True, bwd_dot_terms=(2, 2), packed_grads=True)

    def fwd_parts(s, eps):
        proc = pre.preprocess(
            **{**s, "means3d": s["means3d"] + eps}, camera=camarr,
            opts=OPTS)
        abins = binning.bin_gaussians_aligned(
            jax.lax.stop_gradient(proc), OPTS, CAPACITY,
            pallas_blend.CHUNK, dummy_cap=dummy)
        feat = jnp.concatenate(
            [proc.rgb, proc.depth[:, None], proc.flow], axis=-1)
        inst = pallas_blend._build_inst_data(
            proc.xy, proc.conic, proc.opacity, feat, abins)
        accum, t_final, ncon, raw = pallas_blend.blend_forward_pallas(
            pcfg, inst, abins.tile_start, abins.tile_count)
        return inst, abins, raw, accum

    def upto_fwd(s, eps):
        inst, abins, raw, accum = fwd_parts(s, eps)
        return jnp.mean(accum) + jnp.mean(raw[:, 6, :])

    def upto_bwdk(s, eps):
        inst, abins, raw, accum = fwd_parts(s, eps)
        dcot = jnp.concatenate([
            jnp.full((OPTS.num_tiles, 7, 256), 0.5, jnp.float32) + eps,
            jnp.zeros((OPTS.num_tiles, 1, 256), jnp.float32)], axis=1)
        eg = pallas_blend.blend_backward_pallas(
            pcfg, inst, abins.tile_start, abins.tile_count, raw, dcot)
        return (upto_fwd(s, eps) * 0.0
                + jnp.mean(eg[:, ::997].astype(jnp.float32)))

    def upto_reduce_sort(s, eps):
        # C1: only the reduce's multi-payload sort (cumsum/segments DCEd).
        inst, abins, raw, accum = fwd_parts(s, eps)
        dcot = jnp.concatenate([
            jnp.full((OPTS.num_tiles, 7, 256), 0.5, jnp.float32) + eps,
            jnp.zeros((OPTS.num_tiles, 1, 256), jnp.float32)], axis=1)
        eg = pallas_blend.blend_backward_pallas(
            pcfg, inst, abins.tile_start, abins.tile_count, raw, dcot)
        rp = eg.shape[1]
        live = jnp.arange(rp, dtype=jnp.int32) < abins.total_len
        packed = [jnp.where(live, eg[i], jnp.uint32(0)) for i in range(5)]
        srt = jax.lax.sort(
            (abins.row_id.astype(jnp.uint32),) + tuple(packed),
            num_keys=1, is_stable=False)
        return sum(jnp.sum(x[::4096].astype(jnp.float32)) * 1e-20
                   for x in srt[1:])

    def upto_reduce(s, eps):
        inst, abins, raw, accum = fwd_parts(s, eps)
        dcot = jnp.concatenate([
            jnp.full((OPTS.num_tiles, 7, 256), 0.5, jnp.float32) + eps,
            jnp.zeros((OPTS.num_tiles, 1, 256), jnp.float32)], axis=1)
        eg = pallas_blend.blend_backward_pallas(
            pcfg, inst, abins.tile_start, abins.tile_count, raw, dcot)
        pg = binning.aligned_entry_grads_to_gaussian_grads(
            eg[:5], abins, capacity=CAPACITY, fast=True)
        return jnp.mean(pg)

    def full_grad(s, eps):
        diff_keys = ("means3d", "t", "scales", "scales_t", "rotations",
                     "rotations_r", "opacity", "sh")
        diff = {k: s[k] for k in diff_keys}
        aux = {k: s[k] for k in s if k not in diff_keys}

        def loss_fn(d):
            out = render(**{**d, "means3d": d["means3d"] + eps}, **aux,
                         camera=camarr, bg=bg, opts=OPTS,
                         capacity=CAPACITY, max_per_tile=4096, chunk=32,
                         backend="pallas", fast_grad_reduce=True,
                         dummy_cap=dummy)
            loss, _, _ = photometric_loss(out.color, tgt, fast=True)
            return loss

        loss, g = jax.value_and_grad(loss_fn)(diff)
        return loss + sum(jnp.mean(x) for x in jax.tree.leaves(g))

    timed("A fwd (pre+bin+inst+fwdk)", scan(upto_fwd), scene)
    timed("B A + bwd kernel", scan(upto_bwdk), scene)
    timed("C1 B + reduce sort only", scan(upto_reduce_sort), scene)
    timed("C B + grad reduce", scan(upto_reduce), scene)
    timed("D full value_and_grad + loss", scan(full_grad), scene)


if __name__ == "__main__":
    main()
