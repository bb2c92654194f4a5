#!/usr/bin/env python
"""Bisect the composed forward pass: cumulative stage prefixes under one
jit (scan, varied inputs) to locate time that only appears when stages
are composed (stage-in-isolation sums ~12 ms but the full forward is
~20 ms at bench shape)."""
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


SALT = (time.time_ns() % 997) * 1e-7  # the tunnel result-cache is
# persistent ACROSS PROCESSES, keyed on (program, inputs) — identical
# historical calls are replayed in ~0 ms; salt every timing input.


def timed(name, fn, *args):
    out = jax.block_until_ready(fn(jnp.float32(SALT), *args))
    best = float("inf")
    for r in range(REPS):
        eps = jnp.float32((r + 1) * 1e-7 + SALT)
        t0 = time.perf_counter()
        out = fn(eps, *args)
        _ = float(jax.tree.leaves(out)[0].ravel()[0])  # fetch: block_until_ready
        # alone can return before device completion on this plugin
        best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
    print(f"{name:34s} {best:8.2f} ms/iter")
    return out


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

    def stage_pre(s, eps):
        return pre.preprocess(
            **{**s, "means3d": s["means3d"] + eps}, camera=camarr, opts=OPTS)

    def consume(tree):
        # Sum WHOLE leaves: slicing before the reduce can leave stages
        # partially dead, and integer-output stages (binning) have shown
        # bogus 0.00 readings when the consumed slice was bit-identical
        # across reps.
        return sum(jnp.sum(x.astype(jnp.float32)[::1000]) * 1e-20
                   for x in jax.tree.leaves(tree)
                   if hasattr(x, "ndim") and x.ndim > 0)

    def scan(fn):
        @jax.jit
        def run(eps, s):
            def body(c, i):
                # i-scaled 1e-4 steps: large enough to flip f32 bits all
                # the way through integer-output stages.
                return c + fn(s, i.astype(jnp.float32) * 1e-4 + eps), 0
            return jax.lax.scan(body, 0.0, jnp.arange(ITERS))
        return run

    # cumulative prefixes
    def upto_pre(s, eps):
        proc = stage_pre(s, eps)
        return consume(proc)

    def upto_bin(s, eps):
        proc = stage_pre(s, eps)
        abins = binning.bin_gaussians_aligned(
            jax.lax.stop_gradient(proc), OPTS, CAPACITY,
            pallas_blend.CHUNK, dummy_cap=dummy)
        return consume(proc) + consume(abins)

    def upto_bin_only_ids(s, eps):
        proc = stage_pre(s, eps)
        abins = binning.bin_gaussians_aligned(
            jax.lax.stop_gradient(proc), OPTS, CAPACITY,
            pallas_blend.CHUNK, dummy_cap=dummy)
        # consume only what the fwd kernel path needs (row_id,
        # source_perm, tile_start/count), letting XLA DCE the
        # bwd-only seg_offsets/out_perm.
        return (jnp.sum(abins.row_id[::4096]).astype(jnp.float32) * 1e-20
                + consume(abins.source_perm)
                + consume(abins.tile_start) + consume(abins.tile_count))

    def upto_inst(s, eps):
        proc = stage_pre(s, eps)
        abins = binning.bin_gaussians_aligned(
            jax.lax.stop_gradient(proc), OPTS, CAPACITY,
            pallas_blend.CHUNK, dummy_cap=dummy)
        feat = jnp.concatenate(
            [proc.rgb, proc.depth[:, None], proc.flow], axis=-1)
        inst = pallas_blend._build_inst_data(
            proc.xy, proc.conic, proc.opacity, feat, abins)
        return jnp.sum(inst[:, ::4096]) * 1e-20

    def upto_fwdk(s, eps):
        proc = stage_pre(s, eps)
        abins = binning.bin_gaussians_aligned(
            jax.lax.stop_gradient(proc), OPTS, CAPACITY,
            pallas_blend.CHUNK, dummy_cap=dummy)
        feat = jnp.concatenate(
            [proc.rgb, proc.depth[:, None], proc.flow], axis=-1)
        inst = pallas_blend._build_inst_data(
            proc.xy, proc.conic, proc.opacity, feat, abins)
        pcfg = pallas_blend.PallasBlendConfig(
            height=H, width=W, tiles_x=OPTS.tiles_x, tiles_y=OPTS.tiles_y)
        accum, t_final, ncon, raw = pallas_blend.blend_forward_pallas(
            pcfg, inst, abins.tile_start, abins.tile_count)
        return jnp.sum(t_final[::16, ::16]) * 1e-20 + accum[0, 0, 0] * 1e-20

    def upto_full(s, eps):
        out = render(**{**s, "means3d": s["means3d"] + eps},
                     camera=camarr, bg=bg, opts=OPTS, capacity=CAPACITY,
                     max_per_tile=4096, chunk=32, backend="pallas",
                     fast_grad_reduce=True, dummy_cap=dummy)
        loss, _, _ = photometric_loss(out.color, tgt)
        return loss * 1e-20

    timed("1 pre (all outputs)", scan(upto_pre), scene)
    timed("2 pre+bin (all outputs)", scan(upto_bin), scene)
    timed("2b pre+bin (fwd-needed only)", scan(upto_bin_only_ids), scene)
    timed("3 pre+bin+inst", scan(upto_inst), scene)
    timed("4 pre+bin+inst+fwdk", scan(upto_fwdk), scene)
    timed("5 full fwd (render+loss)", scan(upto_full), scene)


if __name__ == "__main__":
    main()
