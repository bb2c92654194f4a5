#!/usr/bin/env python
"""Forward/backward kernel time decomposition: chunk counts, program
overhead (tiles_per_program sweep), MXU share (fwd_terms sweep)."""
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

    tc = np.asarray(abins.tile_count)
    nchunks = np.ceil(tc / 128).astype(int)
    print(f"tiles={tc.size} total instances={tc.sum()} "
          f"total chunks={nchunks.sum()} max chunks/tile={nchunks.max()}")

    cfg0 = pallas_blend.PallasBlendConfig(
        height=H, width=W, tiles_x=OPTS.tiles_x, tiles_y=OPTS.tiles_y)
    _, _, ncon, raw = jax.jit(
        pallas_blend.blend_forward_pallas, static_argnums=0)(
            cfg0, inst, abins.tile_start, abins.tile_count)
    ncon_max = np.asarray(ncon).max(axis=1)  # per-tile max rank used
    eff_fwd = np.minimum(np.ceil(ncon_max / 128) + 1, nchunks).sum()
    eff_bwd = np.minimum(np.ceil(ncon_max / 128), nchunks).sum()
    print(f"effective fwd chunks (sat exit) ~{int(eff_fwd)}  "
          f"bwd chunks {int(eff_bwd)}  zero-tail chunks "
          f"{int(nchunks.sum() - eff_bwd)}")

    def time_fwd(cfg):
        @jax.jit
        def run(inst, ts, tcc):
            def body(c, i):
                _, tf, _, _ = pallas_blend.blend_forward_pallas(
                    cfg, inst.at[5].mul(1.0 + c * 1e-7), ts, tcc)
                return jnp.sum(tf[::16, ::16]) * 1e-20, 0
            return jax.lax.scan(body, 0.0, jnp.arange(ITERS))[0]
        float(run(inst, abins.tile_start, abins.tile_count))
        t0 = time.perf_counter()
        float(run(inst, abins.tile_start, abins.tile_count))
        return (time.perf_counter() - t0) / ITERS * 1e3

    for tpp in [2, 4, 8, 16]:
        cfg = cfg0._replace(tiles_per_program=tpp)
        print(f"fwd tiles_per_program={tpp}: {time_fwd(cfg):.2f} ms")
    for ft in [1, 2, 3]:
        cfg = cfg0._replace(fwd_terms=ft)
        print(f"fwd fwd_terms={ft}: {time_fwd(cfg):.2f} ms")

    def time_bwd(cfg):
        dcot = jnp.concatenate([
            jnp.ones((OPTS.num_tiles, 7, 256), jnp.float32),
            jnp.zeros((OPTS.num_tiles, 1, 256), jnp.float32)], axis=1)

        @jax.jit
        def run(inst, ts, tcc, raw, dcot):
            def body(c, i):
                e = pallas_blend.blend_backward_pallas(
                    cfg, inst.at[5].mul(1.0 + c * 1e-7), ts, tcc, raw, dcot)
                return jnp.sum(e[0, ::4096]) * 1e-20, 0
            return jax.lax.scan(body, 0.0, jnp.arange(ITERS))[0]
        float(run(inst, abins.tile_start, abins.tile_count, raw, dcot))
        t0 = time.perf_counter()
        float(run(inst, abins.tile_start, abins.tile_count, raw, dcot))
        return (time.perf_counter() - t0) / ITERS * 1e3

    for tpp in [2, 4, 8, 16]:
        cfg = cfg0._replace(tiles_per_program=tpp, bwd_dot_terms=(2, 2))
        print(f"bwd tiles_per_program={tpp}: {time_bwd(cfg):.2f} ms")
    for bt in [1, 2, 3]:
        cfg = cfg0._replace(bwd_terms=bt, bwd_dot_terms=(2, 2))
        print(f"bwd bwd_terms={bt}: {time_bwd(cfg):.2f} ms")


if __name__ == "__main__":
    main()
