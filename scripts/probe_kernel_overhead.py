#!/usr/bin/env python
"""Decompose Pallas kernel time: per-program overhead (zero-count grid)
vs per-chunk cost (scaled tile counts)."""
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

ITERS = 16
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
    cfg = pallas_blend.PallasBlendConfig(
        height=H, width=W, tiles_x=OPTS.tiles_x, tiles_y=OPTS.tiles_y)

    counts = np.asarray(abins.tile_count)
    nchunks = int(np.ceil(counts / 128).sum())
    print(f"tiles={counts.size} total chunks={nchunks} "
          f"instances={int(counts.sum())}")

    def run_fwd(name, tc):
        ts = abins.tile_start

        @jax.jit
        def run(inst, tc):
            def body(c, i):
                accum, tf, ncon, _ = pallas_blend.blend_forward_pallas(
                    cfg, inst, ts,
                    tc + (c > 1e30).astype(jnp.int32))
                return jnp.sum(tf[::16, ::16]) * 1e-20, 0
            return jax.lax.scan(body, 0.0, jnp.arange(ITERS))[0]

        float(run(inst, tc))
        t0 = time.perf_counter()
        float(run(inst, tc))
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"fwd {name:24s} {dt:7.2f} ms/iter")
        return dt

    zero = jnp.zeros_like(abins.tile_count)
    t_zero = run_fwd("zero counts", zero)
    t_full = run_fwd("full counts", abins.tile_count)
    # half counts: same #programs, ~half the chunks
    half = jnp.minimum(abins.tile_count,
                       jnp.maximum(abins.tile_count // 2, 0))
    t_half = run_fwd("half counts", half)
    ch_full = nchunks
    ch_half = int(np.ceil(np.minimum(counts, np.maximum(counts // 2, 0))
                          / 128).sum())
    if ch_full != ch_half:
        per_chunk = (t_full - t_half) / (ch_full - ch_half) * 1e3
        print(f"fwd: per-program overhead ~{t_zero / counts.size * 1e3:.2f} "
              f"us, per-chunk ~{per_chunk:.2f} us "
              f"({ch_full - ch_half} chunk delta)")


if __name__ == "__main__":
    main()
