#!/usr/bin/env python
"""Per-HLO-op time breakdown of the bench-shape fwd+bwd step on the TPU.

Runs the full pipeline (render fwd+bwd + photometric loss) under
`jax.profiler.trace`, then parses the xplane proto directly
(tensorflow.tsl schema — tensorboard_plugin_profile's converter is broken
in this environment) and prints the top ops by total device time.

Usage: python scripts/profile_step.py [out_dir]
"""

import glob
import gzip
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

from bench import build_inputs
from fourdgs_tpu.ops import preprocess as pre
from fourdgs_tpu.ops.preprocess import RenderOptions
from fourdgs_tpu.render import render
from fourdgs_tpu.utils.losses import photometric_loss

ITERS = 8
H = W = 800
CAPACITY = 3 * 2 ** 18


def run_traced(out_dir: str) -> None:
    opts = RenderOptions(height=H, width=W, gaussian_dim=4, rot_4d=True,
                         time_duration=1.0)
    scene, cam, tgt = build_inputs(h=H, w=W)
    camarr = pre.CameraArrays(**cam) if isinstance(cam, dict) else cam
    bg = jnp.zeros(3, jnp.float32)
    diff_keys = ("means3d", "t", "scales", "scales_t", "rotations",
                 "rotations_r", "opacity", "sh")
    diff = {k: scene[k] for k in diff_keys}
    aux = {k: scene[k] for k in scene if k not in diff_keys}

    def loss_fn(d, eps):
        out = render(**{**d, "means3d": d["means3d"] + eps}, **aux,
                     camera=camarr, bg=bg, opts=opts, capacity=CAPACITY,
                     max_per_tile=4096, chunk=32, backend="pallas",
                     fast_grad_reduce=True)
        loss, _, _ = photometric_loss(out.color, tgt)
        return loss

    @jax.jit
    def step(d):
        def body(c, i):
            loss, g = jax.value_and_grad(
                lambda dd: loss_fn(dd, c * 1e-6))(d)
            return loss * 1e-20, g["opacity"][0]
        return jax.lax.scan(body, 0.0, jnp.arange(ITERS))

    jax.block_until_ready(step(diff))          # compile + warm
    with jax.profiler.trace(out_dir):
        jax.block_until_ready(step(diff))


def summarize(out_dir: str, top: int = 40) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(
        out_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {out_dir}")
    path = max(paths, key=os.path.getmtime)
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_names = dict(plane.event_metadata.items())
        totals = defaultdict(float)
        counts = defaultdict(int)
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Ops" != line.name:
                continue
            for ev in line.events:
                name = ev_names[ev.metadata_id].name
                totals[name] += ev.duration_ps / 1e9      # ms
                counts[name] += 1
        if not totals:
            continue
        print(f"== plane: {plane.name} "
              f"(total {sum(totals.values()):.2f} ms over the trace, "
              f"{ITERS} iters) ==")
        rows = sorted(totals.items(), key=lambda kv: -kv[1])
        for name, ms in rows[:top]:
            print(f"{ms / ITERS:9.3f} ms/iter  x{counts[name]:<4d} {name}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fourdgs_profile"
    if not os.environ.get("FOURDGS_PROFILE_PARSE_ONLY"):
        run_traced(out)
    summarize(out)
