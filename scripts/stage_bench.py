#!/usr/bin/env python
"""Per-stage timing of the render pipeline at bench shape (one chip).

Each stage runs inside ONE jitted lax.scan over `ITERS` data-dependent
iterations (per-iter input perturbation → no cross-call result caching,
amortized tunnel dispatch). Prints ms/iter per stage.

Usage: python scripts/stage_bench.py [stage ...]
  stages: pre bin inst fwdk full bwd reduce  (default: all)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

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
H = W = 800
CAPACITY = 3 * 2 ** 18
OPTS = RenderOptions(height=H, width=W, gaussian_dim=4, rot_4d=True,
                     time_duration=1.0)


SALT = (time.time_ns() % 997) * 1e-7  # the tunnel result-cache is
# persistent ACROSS PROCESSES, keyed on (program, inputs) — identical
# historical calls are replayed in ~0 ms; salt every timing input.


def timed(name, fn, *args):
    """min-of-REPS timing with a per-rep input perturbation: the tunnel
    serves REPEAT-IDENTICAL jitted calls from a result cache (measured:
    0.00 ms for real work), so every rep must be a distinct call."""
    out = jax.block_until_ready(fn(jnp.float32(SALT), *args))  # compile
    best = float("inf")
    for r in range(REPS):
        eps = jnp.float32((r + 1) * 1e-7 + SALT)
        t0 = time.perf_counter()
        out = fn(eps, *args)
        _ = float(jax.tree.leaves(out)[0].ravel()[0])  # fetch: block_until_ready
        # alone can return before device completion on this plugin
        best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
    print(f"{name:28s} {best:8.2f} ms/iter")
    return out


def main():
    stages = set(sys.argv[1:]) or {"pre", "bin", "inst", "fwdk", "loss",
                                   "full", "bwd", "reduce"}
    scene, cam, tgt = build_inputs(h=H, w=W)
    camarr = pre.CameraArrays(**cam) if isinstance(cam, dict) else cam
    bg = jnp.zeros(3, jnp.float32)

    diff_keys = ("means3d", "t", "scales", "scales_t", "rotations",
                 "rotations_r", "opacity", "sh")
    diff = {k: scene[k] for k in diff_keys}
    aux = {k: scene[k] for k in scene if k not in diff_keys}

    # ---- stage: preprocess fwd ----
    if "pre" in stages:
        @jax.jit
        def run_pre(eps, scene):
            def body(c, i):
                proc = pre.preprocess(
                    **{**scene, "means3d": scene["means3d"] + (c * 1e-6 + eps)},
                    camera=camarr, opts=OPTS)
                return jnp.sum(proc.depth) * 1e-20, proc.radius.sum()
            return jax.lax.scan(body, 0.0, jnp.arange(ITERS))
        timed("preprocess fwd", run_pre, scene)

    proc0 = jax.jit(lambda s: pre.preprocess(**s, camera=camarr,
                                             opts=OPTS))(scene)
    proc0 = jax.block_until_ready(proc0)

    # ---- stage: aligned binning ----
    if "bin" in stages:
        @jax.jit
        def run_bin(eps, proc):
            def body(c, i):
                p2 = proc._replace(depth=proc.depth + (c * 1e-6 + eps))
                ab = binning.bin_gaussians_aligned(
                    p2, OPTS, CAPACITY, pallas_blend.CHUNK)
                return jnp.float32(ab.num_rendered) * 1e-20, ab.max_per_tile
            return jax.lax.scan(body, 0.0, jnp.arange(ITERS))
        timed("binning (aligned)", run_bin, proc0)

    abins0 = jax.jit(lambda p: binning.bin_gaussians_aligned(
        p, OPTS, CAPACITY, pallas_blend.CHUNK))(proc0)
    abins0 = jax.block_until_ready(abins0)
    feat0 = jnp.concatenate(
        [proc0.rgb, proc0.depth[:, None], proc0.flow], axis=-1)

    # ---- stage: instance build ----
    if "inst" in stages:
        @jax.jit
        def run_inst(eps, proc, abins, feat):
            def body(c, i):
                inst = pallas_blend._build_inst_data(
                    proc.xy + (c * 1e-6 + eps), proc.conic, proc.opacity, feat,
                    abins)
                return jnp.sum(inst[0, ::4096]) * 1e-20, inst[0, 0]
            return jax.lax.scan(body, 0.0, jnp.arange(ITERS))
        timed("instance build", run_inst, proc0, abins0, feat0)

    pcfg = pallas_blend.PallasBlendConfig(
        height=H, width=W, tiles_x=OPTS.tiles_x, tiles_y=OPTS.tiles_y)
    inst0 = jax.jit(pallas_blend._build_inst_data)(
        proc0.xy, proc0.conic, proc0.opacity, feat0, abins0)
    inst0 = jax.block_until_ready(inst0)

    # ---- stage: forward kernel ----
    if "fwdk" in stages:
        @jax.jit
        def run_fwdk(eps, inst, abins):
            def body(c, i):
                accum, t_final, ncon, _ = pallas_blend.blend_forward_pallas(
                    pcfg, inst.at[5].mul(1.0 + c * 1e-7 + eps),
                    abins.tile_start, abins.tile_count)
                return jnp.sum(t_final[::16, ::16]) * 1e-20, accum[0, 0, 0]
            return jax.lax.scan(body, 0.0, jnp.arange(ITERS))
        timed("forward kernel", run_fwdk, inst0, abins0)

    # ---- stage: backward kernel ----
    if "bwd" in stages:
        _, _, _, raw = jax.block_until_ready(
            jax.jit(pallas_blend.blend_forward_pallas, static_argnums=0)(
                pcfg, inst0, abins0.tile_start, abins0.tile_count))
        dcot = jnp.concatenate([
            jnp.ones((OPTS.num_tiles, 7, 256), jnp.float32),
            jnp.zeros((OPTS.num_tiles, 1, 256), jnp.float32)], axis=1)

        @jax.jit
        def run_bwdk(eps, inst, abins, raw, dcot):
            def body(c, i):
                eg = pallas_blend.blend_backward_pallas(
                    pcfg, inst.at[5].mul(1.0 + c * 1e-7 + eps),
                    abins.tile_start, abins.tile_count, raw, dcot)
                return jnp.sum(eg[0, ::4096]) * 1e-20, eg[0, 0]
            return jax.lax.scan(body, 0.0, jnp.arange(ITERS))
        timed("backward kernel", run_bwdk, inst0, abins0, raw, dcot)

        # ---- stage: grad reduce ----
        if "reduce" in stages:
            eg0 = jax.block_until_ready(jax.jit(
                pallas_blend.blend_backward_pallas, static_argnums=0)(
                    pcfg, inst0, abins0.tile_start, abins0.tile_count,
                    raw, dcot))

            cap = CAPACITY

            @jax.jit
            def run_reduce(eps, eg, abins):
                def body(c, i):
                    pg = binning.aligned_entry_grads_to_gaussian_grads(
                        eg[:10] + (c * 1e-9 + eps), abins, capacity=cap, fast=True)
                    return jnp.sum(pg[::512, 0]).astype(jnp.float32) * 1e-20, pg[0, 0]
                return jax.lax.scan(body, 0.0, jnp.arange(ITERS))
            timed("grad reduce (sort bf16)", run_reduce, eg0, abins0)

    # ---- stage: photometric loss alone (SSIM + L1 on images) ----
    if "loss" in stages:
        img0 = jnp.zeros((H, W, 3), jnp.float32)

        @jax.jit
        def run_loss(eps, img, tgt):
            def body(c, i):
                l, g = jax.value_and_grad(
                    lambda im: photometric_loss(im + (c * 1e-6 + eps), tgt)[0])(img)
                return l * 1e-20, g[0, 0, 0]
            return jax.lax.scan(body, 0.0, jnp.arange(ITERS))
        timed("photometric loss f+b", run_loss, img0, tgt)

    # ---- stage: full fwd / fwd+bwd ----
    if "full" in stages:
        def loss_fn(diff, aux, eps):
            out = render(**{**diff, "means3d": diff["means3d"] + eps},
                         **aux, camera=camarr, bg=bg, opts=OPTS,
                         capacity=CAPACITY, max_per_tile=4096, chunk=32,
                         backend="pallas", fast_grad_reduce=True)
            loss, _, _ = photometric_loss(out.color, tgt)
            return loss

        @jax.jit
        def run_fullf(eps, diff, aux):
            def body(c, i):
                loss = loss_fn(diff, aux, c * 1e-6 + eps)
                return loss * 1e-20, loss
            return jax.lax.scan(body, 0.0, jnp.arange(ITERS))
        timed("full forward", run_fullf, diff, aux)

        @jax.jit
        def run_fullfb(eps, diff, aux):
            def body(c, i):
                loss, g = jax.value_and_grad(
                    lambda d: loss_fn(d, aux, c * 1e-6 + eps))(diff)
                return loss * 1e-20, g["opacity"][0]
            return jax.lax.scan(body, 0.0, jnp.arange(ITERS))
        timed("full fwd+bwd", run_fullfb, diff, aux)


if __name__ == "__main__":
    main()
