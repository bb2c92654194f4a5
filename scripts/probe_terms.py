#!/usr/bin/env python
"""Accuracy + speed of 2-term vs 3-term bf16-split cumsum matmuls in the
Pallas blend kernels, at bench shape on the real TPU."""
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

ITERS = 8
H = W = 800
CAPACITY = 3 * 2 ** 18
OPTS = RenderOptions(height=H, width=W, gaussian_dim=4, rot_4d=True,
                     time_duration=1.0)


def main():
    scene, cam, tgt = build_inputs(h=H, w=W)
    camarr = pre.CameraArrays(**cam) if isinstance(cam, dict) else cam
    bg = jnp.zeros(3, jnp.float32)

    proc = jax.jit(lambda s: pre.preprocess(**s, camera=camarr,
                                            opts=OPTS))(scene)
    abins = jax.jit(lambda p: binning.bin_gaussians_aligned(
        p, OPTS, CAPACITY, pallas_blend.CHUNK))(proc)
    feat = jnp.concatenate(
        [proc.rgb, proc.depth[:, None], proc.flow], axis=-1)

    def make_cfg(ft, bt):
        return pallas_blend.PallasBlendConfig(
            height=H, width=W, tiles_x=OPTS.tiles_x, tiles_y=OPTS.tiles_y,
            fwd_terms=ft, bwd_terms=bt)

    def run(cfg):
        def loss(xy, conic, opa, feat):
            color, depth, flow, alpha = pallas_blend.blend_pallas(
                cfg, xy, conic, opa, feat, bg, abins)
            return jnp.sum(color * tgt[:, :, :3]) + jnp.sum(alpha) * 0.1, color

        f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3),
                                       has_aux=True))
        (v, color), g = f(proc.xy, proc.conic, proc.opacity, feat)
        return np.asarray(color), [np.asarray(x) for x in g], float(v)

    c3, g3, v3 = run(make_cfg(3, 3))
    for ft, bt in [(2, 3), (3, 2), (2, 2)]:
        c, g, v = run(make_cfg(ft, bt))
        img_d = np.abs(c - c3).max()
        gd = max(np.abs(a - b).max() / max(np.abs(b).max(), 1e-12)
                 for a, b in zip(g, g3))
        print(f"terms fwd={ft} bwd={bt}: max|img diff|={img_d:.3e} "
              f"max rel grad diff={gd:.3e} loss d={abs(v - v3):.3e}")

    # timing: fwd kernel + bwd kernel per terms setting (scan-chained)
    inst = jax.jit(pallas_blend._build_inst_data)(
        proc.xy, proc.conic, proc.opacity, feat, abins)

    for name, ft, bt in [("3/3", 3, 3), ("2/2", 2, 2)]:
        cfg = make_cfg(ft, bt)

        @jax.jit
        def run_fwdk(inst, ts, tc):
            def body(c, i):
                accum, tf, ncon, _ = pallas_blend.blend_forward_pallas(
                    cfg, inst.at[5].mul(1.0 + c * 1e-7), ts, tc)
                return jnp.sum(tf[::16, ::16]) * 1e-20, 0
            return jax.lax.scan(body, 0.0, jnp.arange(ITERS))[0]

        float(run_fwdk(inst, abins.tile_start, abins.tile_count))
        t0 = time.perf_counter()
        float(run_fwdk(inst, abins.tile_start, abins.tile_count))
        print(f"fwd kernel {name}: "
              f"{(time.perf_counter() - t0) / ITERS * 1e3:.2f} ms/iter")

        _, _, _, raw = jax.jit(
            pallas_blend.blend_forward_pallas, static_argnums=0)(
                cfg, inst, abins.tile_start, abins.tile_count)
        dcot = jnp.concatenate([
            jnp.ones((OPTS.num_tiles, 7, 256), jnp.float32),
            jnp.zeros((OPTS.num_tiles, 1, 256), jnp.float32)], axis=1)

        @jax.jit
        def run_bwdk(inst, ts, tc, raw, dcot):
            def body(c, i):
                eg = pallas_blend.blend_backward_pallas(
                    cfg, inst.at[5].mul(1.0 + c * 1e-7), ts, tc, raw, dcot)
                return jnp.sum(eg[0, ::4096]) * 1e-20, 0
            return jax.lax.scan(body, 0.0, jnp.arange(ITERS))[0]

        float(run_bwdk(inst, abins.tile_start, abins.tile_count, raw, dcot))
        t0 = time.perf_counter()
        float(run_bwdk(inst, abins.tile_start, abins.tile_count, raw, dcot))
        print(f"bwd kernel {name}: "
              f"{(time.perf_counter() - t0) / ITERS * 1e3:.2f} ms/iter")


if __name__ == "__main__":
    main()
