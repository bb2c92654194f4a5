#!/usr/bin/env python
"""Speed + accuracy of bf16-split variants of the backward kernel's three
data matmuls (gdot / pixel-moment / d_feat) vs the HIGHEST baseline, at
bench shape on the real TPU."""
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

    proc = jax.jit(lambda s: pre.preprocess(**s, camera=camarr,
                                            opts=OPTS))(scene)
    abins = jax.jit(lambda p: binning.bin_gaussians_aligned(
        p, OPTS, CAPACITY, pallas_blend.CHUNK))(proc)
    feat = jnp.concatenate(
        [proc.rgb, proc.depth[:, None], proc.flow], axis=-1)
    inst = jax.jit(pallas_blend._build_inst_data)(
        proc.xy, proc.conic, proc.opacity, feat, abins)

    def make_cfg(dt):
        return pallas_blend.PallasBlendConfig(
            height=H, width=W, tiles_x=OPTS.tiles_x, tiles_y=OPTS.tiles_y,
            bwd_dot_terms=dt)

    cfg0 = make_cfg(())
    _, _, _, raw = jax.jit(
        pallas_blend.blend_forward_pallas, static_argnums=0)(
            cfg0, inst, abins.tile_start, abins.tile_count)
    rng = np.random.default_rng(0)
    dcot = jnp.asarray(np.concatenate([
        rng.standard_normal((OPTS.num_tiles, 7, 256)),
        np.zeros((OPTS.num_tiles, 1, 256))], axis=1), jnp.float32)

    ref = None
    for dt in [(), (3, 2), (2, 2), (2, 1), (1, 1)]:
        cfg = make_cfg(dt)
        eg = np.asarray(jax.jit(
            pallas_blend.blend_backward_pallas, static_argnums=0)(
                cfg, inst, abins.tile_start, abins.tile_count, raw, dcot))
        if ref is None:
            ref = eg
            err = 0.0
        else:
            per_gauss = np.abs(eg - ref)
            err = max(per_gauss[i].max() / max(np.abs(ref[i]).max(), 1e-12)
                      for i in range(12))

        @jax.jit
        def run_bwdk(inst, ts, tc, raw, dcot):
            def body(c, i):
                e = pallas_blend.blend_backward_pallas(
                    cfg, inst.at[5].mul(1.0 + c * 1e-7), ts, tc, raw, dcot)
                return jnp.sum(e[0, ::4096]) * 1e-20, 0
            return jax.lax.scan(body, 0.0, jnp.arange(ITERS))[0]

        float(run_bwdk(inst, abins.tile_start, abins.tile_count, raw, dcot))
        t0 = time.perf_counter()
        float(run_bwdk(inst, abins.tile_start, abins.tile_count, raw, dcot))
        dt_ms = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"bwd_dot_terms={dt or 'HIGHEST'}: {dt_ms:.2f} ms/iter  "
              f"max rel row err vs HIGHEST = {err:.3e}")


if __name__ == "__main__":
    main()
