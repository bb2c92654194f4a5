#!/usr/bin/env python
"""On-hardware verification: compiled Pallas kernels vs the XLA path on
the real TPU (the pytest suite runs on a CPU mesh with the Pallas
interpreter; this exercises the Mosaic-compiled kernels). Exits nonzero
on mismatch. Run whenever the kernels or binning change."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from utils import look_at_camera, random_scene
from fourdgs_tpu.ops.preprocess import RenderOptions
from fourdgs_tpu.render import render

OPTS = RenderOptions(height=48, width=40, gaussian_dim=4, rot_4d=True, time_duration=1.0)
KW = dict(capacity=2048, max_per_tile=256, chunk=16)
rng = np.random.default_rng(0)
scene = {k: jnp.asarray(v) for k, v in random_scene(rng, p=56).items()}
cam = look_at_camera(width=40, height=48).arrays()
bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)

out_x = render(**scene, camera=cam, bg=bg, opts=OPTS, backend="xla", **KW)
out_p = render(**scene, camera=cam, bg=bg, opts=OPTS, backend="pallas", **KW)
print("fwd max diff color:", float(jnp.abs(out_p.color - out_x.color).max()))
print("fwd max diff alpha:", float(jnp.abs(out_p.alpha - out_x.alpha).max()))

diff_keys = ("means3d","t","scales","scales_t","rotations","rotations_r","opacity","sh")
diff = {k: scene[k] for k in diff_keys}
aux = {"active": scene["active"]}
tgt = jnp.asarray(rng.random((48, 40, 3)), jnp.float32)
def loss(d, backend):
    out = render(**d, **aux, camera=cam, bg=bg, opts=OPTS, backend=backend, **KW)
    return jnp.sum((out.color - tgt) ** 2) + jnp.sum(out.depth) + 0.5*jnp.sum(out.alpha)
g1 = jax.grad(lambda d: loss(d, "pallas"))(diff)
g2 = jax.grad(lambda d: loss(d, "xla"))(diff)
fail = False
for k in diff_keys:
    a, b = np.asarray(g1[k]), np.asarray(g2[k])
    s = max(np.abs(b).max(), 1e-3)
    rel = np.abs(a - b).max() / s
    print(f"grad {k}: max rel diff {rel:.2e}")
    fail |= rel > 2e-3
cfail = float(jnp.abs(out_p.color - out_x.color).max()) > 1e-3
if fail or cfail:
    print("TPU VERIFY FAILED"); raise SystemExit(1)
print("TPU VERIFY OK")
