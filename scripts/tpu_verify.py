#!/usr/bin/env python
"""On-hardware verification: compiled Pallas kernels vs the XLA path on
the real TPU (the pytest suite runs on a CPU mesh with the Pallas
interpreter; this exercises the Mosaic-compiled kernels). Exits nonzero
on mismatch. Run whenever the kernels or binning change.

Default: fast toy-scale check (48x40, 56 gaussians — seconds).
`python scripts/tpu_verify.py full` adds the PRODUCTION-SCALE pass at the
bench shape (800x800, 100k gaussians, 786k instance capacity, 4096-deep
tiles): compiled Pallas vs XLA forward + gradients, exercising
fast_grad_reduce both ways — the regime where DMA/alignment/occupancy
bugs live that the toy shapes cannot reach. Expect a few minutes on a
cold compile cache."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from utils import look_at_camera, random_scene
from fourdgs_tpu.ops.preprocess import RenderOptions
from fourdgs_tpu.render import render

DIFF_KEYS = ("means3d","t","scales","scales_t","rotations","rotations_r","opacity","sh")
fail = False

def check_grads(tag, g1, g2, tol, outlier_frac=0.0):
    """Per-key gradient comparison, normalized by the key's global max.

    outlier_frac > 0 switches to the production-scale criterion: at
    800x800 / 4096-deep tiles the scales gradient is ill-conditioned at
    threshold boundaries (alpha clamp, T_EPS early exit) — merely
    PERMUTING the gaussians changes the XLA path's own scales grad by
    max-rel 1.7e-2 on ~41/300k elements (sign flips included), i.e. the
    max-rel metric measures the problem's conditioning, not the kernel.
    So at scale we bound the mean rel diff (tol/50) and allow up to
    outlier_frac of elements past tol, calibrated against the
    permutation noise floor of the XLA path against itself
    (/tmp-pattern calib: permuting the 300k gaussians moves the XLA
    scales grad by frac>0.005 = 1.43e-4, mean rel 3.6e-5 — the
    allowance is ~3x that floor; the rank-keyed grad reduce sums each
    gaussian's instances in tile order rather than rect order, which
    costs nothing beyond this reordering class)."""
    global fail
    for k in DIFF_KEYS:
        a, b = np.asarray(g1[k]), np.asarray(g2[k])
        s = max(np.abs(b).max(), 1e-3)
        rel = np.abs(a - b) / s
        if outlier_frac:
            frac = float((rel > tol).mean())
            print(f"[{tag}] grad {k}: max rel {rel.max():.2e} mean "
                  f"{rel.mean():.2e} frac>{tol:g} {frac:.2e}")
            fail |= bool(frac > outlier_frac or rel.mean() > tol / 50)
        else:
            print(f"[{tag}] grad {k}: max rel diff {rel.max():.2e}")
            fail |= bool(rel.max() > tol)

def toy():
    global fail
    opts = RenderOptions(height=48, width=40, gaussian_dim=4, rot_4d=True, time_duration=1.0)
    kw = dict(capacity=2048, max_per_tile=256, chunk=16)
    rng = np.random.default_rng(0)
    scene = {k: jnp.asarray(v) for k, v in random_scene(rng, p=56).items()}
    cam = look_at_camera(width=40, height=48).arrays()
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)

    out_x = render(**scene, camera=cam, bg=bg, opts=opts, backend="xla", **kw)
    out_p = render(**scene, camera=cam, bg=bg, opts=opts, backend="pallas", **kw)
    cdiff = float(jnp.abs(out_p.color - out_x.color).max())
    print("[toy] fwd max diff color:", cdiff)
    print("[toy] fwd max diff alpha:", float(jnp.abs(out_p.alpha - out_x.alpha).max()))
    fail |= cdiff > 1e-3

    # Inference fast path (packed bf16-pair rows + 1-pass cumsum):
    # bf16 rounding of opacity/rgb bounds the color error ~1%.
    out_i = render(**scene, camera=cam, bg=bg, opts=opts, backend="pallas",
                   infer=True, **kw)
    idiff = float(jnp.abs(out_i.color - out_p.color).max())
    print("[toy] infer max diff color:", idiff)
    fail |= idiff > 1.5e-2

    diff = {k: scene[k] for k in DIFF_KEYS}
    aux = {"active": scene["active"]}
    tgt = jnp.asarray(rng.random((48, 40, 3)), jnp.float32)
    def loss(d, backend):
        out = render(**d, **aux, camera=cam, bg=bg, opts=opts, backend=backend, **kw)
        return jnp.sum((out.color - tgt) ** 2) + jnp.sum(out.depth) + 0.5*jnp.sum(out.alpha)
    g1 = jax.grad(lambda d: loss(d, "pallas"))(diff)
    g2 = jax.grad(lambda d: loss(d, "xla"))(diff)
    check_grads("toy", g1, g2, 2e-3)

def full():
    """Bench-shape compiled-Pallas vs XLA: forward, exact grads
    (fast_grad_reduce=False), and the production fast_grad_reduce=True
    path (bf16 per-instance rounding -> looser tolerance)."""
    global fail
    from bench import build_inputs
    from fourdgs_tpu.utils.losses import photometric_loss
    h = w = 800
    opts = RenderOptions(height=h, width=w, gaussian_dim=4, rot_4d=True, time_duration=1.0)
    kw = dict(capacity=3 * 2 ** 18, max_per_tile=4096, chunk=32)
    scene, cam, tgt = build_inputs(h=h, w=w)
    bg = jnp.zeros(3, jnp.float32)
    diff = {k: scene[k] for k in DIFF_KEYS}
    aux = {"active": scene["active"]}

    # jit each pass: eagerly the 800x800 graphs dispatch thousands of ops
    # through the ~10ms serializing tunnel (>10 min just in dispatch) and
    # nothing lands in the persistent compile cache.
    fwd = jax.jit(lambda s, backend: render(
        **s, camera=cam, bg=bg, opts=opts, backend=backend, **kw),
        static_argnames=("backend",))
    t0 = time.perf_counter()
    out_x = jax.block_until_ready(fwd(scene, "xla"))
    t1 = time.perf_counter()
    out_p = jax.block_until_ready(fwd(scene, "pallas"))
    t2 = time.perf_counter()
    print(f"[full] fwd xla {t1-t0:.1f}s pallas {t2-t1:.1f}s (incl. compile)")
    for name in ("color", "alpha", "depth"):
        d = float(jnp.abs(getattr(out_p, name) - getattr(out_x, name)).max())
        print(f"[full] fwd max diff {name}: {d:.2e}")
        fail |= d > (2e-2 if name == "depth" else 2e-3)

    fwd_i = jax.jit(lambda s: render(
        **s, camera=cam, bg=bg, opts=opts, backend="pallas", infer=True,
        **kw))
    t0 = time.perf_counter()
    out_i = jax.block_until_ready(fwd_i(scene))
    print(f"[full] infer fwd {time.perf_counter()-t0:.1f}s (incl. compile)")
    d = float(jnp.abs(out_i.color - out_p.color).max())
    print(f"[full] infer max diff color: {d:.2e}")
    fail |= d > 2e-2

    def loss(d, backend, fast):
        out = render(**d, **aux, camera=cam, bg=bg, opts=opts,
                     backend=backend, fast_grad_reduce=fast, **kw)
        l, _, _ = photometric_loss(out.color, tgt)
        return l + 1e-4 * jnp.sum(out.depth) + 0.1 * jnp.mean(out.alpha)
    gradfn = jax.jit(jax.grad(loss), static_argnames=("backend", "fast"))
    t0 = time.perf_counter()
    g_exact = jax.block_until_ready(gradfn(diff, backend="pallas", fast=False))
    t1 = time.perf_counter()
    g_xla = jax.block_until_ready(gradfn(diff, backend="xla", fast=False))
    t2 = time.perf_counter()
    g_fast = jax.block_until_ready(gradfn(diff, backend="pallas", fast=True))
    t3 = time.perf_counter()
    print(f"[full] bwd pallas {t1-t0:.1f}s xla {t2-t1:.1f}s fast {t3-t2:.1f}s (incl. compile)")
    check_grads("full exact-vs-xla", g_exact, g_xla, 5e-3,
                outlier_frac=4e-4)
    check_grads("full fast-vs-exact", g_fast, g_exact, 2e-2,
                outlier_frac=2e-4)

toy()
if "full" in sys.argv[1:]:
    full()
if fail:
    print("TPU VERIFY FAILED"); raise SystemExit(1)
print("TPU VERIFY OK" + (" (full scale)" if "full" in sys.argv[1:] else ""))
