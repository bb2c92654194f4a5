#!/usr/bin/env python
"""Ad-hoc probe: where does preprocess time go? (TPU, bench shape)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

from bench import build_inputs
from fourdgs_tpu.ops import preprocess as pre
from fourdgs_tpu.ops import sh as shlib
from fourdgs_tpu.ops.preprocess import RenderOptions

ITERS = 8
H = W = 800
OPTS = RenderOptions(height=H, width=W, gaussian_dim=4, rot_4d=True,
                     time_duration=1.0)


def timed(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:34s} {dt:8.3f} ms/iter")
    return out


def scan_wrap(body):
    @jax.jit
    def run(*args):
        def sbody(c, i):
            return body(c, i, *args)
        return jax.lax.scan(sbody, 0.0, jnp.arange(ITERS))
    return run


def main():
    scene, cam, tgt = build_inputs(h=H, w=W)
    camarr = pre.CameraArrays(**cam) if isinstance(cam, dict) else cam

    # full preprocess
    def body_full(c, i, scene):
        proc = pre.preprocess(
            **{**scene, "means3d": scene["means3d"] + c * 1e-6},
            camera=camarr, opts=OPTS)
        return jnp.sum(proc.depth) * 1e-20 + proc.rgb[0, 0] * 1e-20, 0
    timed("preprocess full", scan_wrap(body_full), scene)

    # preprocess with colors_precomp (skips SH)
    pcol = jnp.ones((scene["sh"].shape[0], 3), jnp.float32)

    def body_nosh(c, i, scene):
        kw = {k: v for k, v in scene.items() if k != "sh"}
        proc = pre.preprocess(
            **{**kw, "means3d": kw["means3d"] + c * 1e-6},
            sh=scene["sh"], colors_precomp=pcol, camera=camarr, opts=OPTS)
        return jnp.sum(proc.depth) * 1e-20 + proc.rgb[0, 0] * 1e-20, 0
    timed("preprocess no-SH", scan_wrap(body_nosh), scene)

    # SH alone
    def body_sh(c, i, scene):
        dirs = scene["means3d"] + c * 1e-6 - camarr.campos
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
        rgb = shlib.sh_to_rgb(shlib.eval_sh4d(
            scene["sh"], dirs, scene["t"] - camarr.timestamp, 1.0))
        return jnp.sum(rgb[:, 0]) * 1e-20, 0
    timed("sh4d eval (highest)", scan_wrap(body_sh), scene)

    # SH with default precision
    def body_sh_def(c, i, scene):
        dirs = scene["means3d"] + c * 1e-6 - camarr.campos
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
        basis = shlib.sh4d_basis(dirs, scene["t"] - camarr.timestamp, 1.0)
        rgb = jnp.einsum("pm,pmc->pc", basis, scene["sh"])
        return jnp.sum(rgb[:, 0]) * 1e-20, 0
    timed("sh4d eval (default prec)", scan_wrap(body_sh_def), scene)

    # SH channel-major: sh stored (3, P, 48), contraction per channel
    sh_cm = jnp.transpose(scene["sh"], (2, 0, 1))  # (3, P, 48)

    def body_sh_cm(c, i, scene, sh_cm):
        dirs = scene["means3d"] + c * 1e-6 - camarr.campos
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
        basis = shlib.sh4d_basis(dirs, scene["t"] - camarr.timestamp, 1.0)
        rgb = jnp.sum(basis[None] * sh_cm, axis=-1)   # (3, P)
        return jnp.sum(rgb[0]) * 1e-20, 0
    timed("sh4d channel-major f32", scan_wrap(body_sh_cm), scene, sh_cm)


if __name__ == "__main__":
    main()
