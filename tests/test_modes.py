"""Degenerate-mode parity: gaussian_dim=3 (pure 3DGS), gaussian_dim=4 with
rot_4d=False (separable time gaussian), force_sh_3d, and scale_modifier —
production pipeline vs the brute-force oracle (`forward.cu:431-437`,
`train.py:368-373` behaviors)."""

import jax
import jax.numpy as jnp
import numpy as np

from fourdgs_tpu.ops.preprocess import RenderOptions
from fourdgs_tpu.ops.reference_renderer import render_reference
from fourdgs_tpu.render import render

from utils import look_at_camera, random_scene

KW = dict(capacity=2048, max_per_tile=256, chunk=16)


def _scene(rng, p=40, sh_channels=48):
    s = random_scene(rng, p=p)
    s["sh"] = s["sh"][:, :sh_channels, :]
    return {k: jnp.asarray(v) for k, v in s.items()}


def _check(scene, opts, rng, grad_key="means3d"):
    cam = look_at_camera(width=opts.width, height=opts.height).arrays()
    bg = jnp.asarray([0.1, 0.0, 0.2], jnp.float32)
    out = render(**scene, camera=cam, bg=bg, opts=opts, **KW)
    ref = render_reference(**scene, camera=cam, bg=bg, opts=opts)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref[0]),
                               rtol=1e-4, atol=1e-5)
    # gradient spot-check on one input
    tgt = jnp.asarray(rng.random(ref[0].shape), jnp.float32)

    def lp(x):
        o = render(**{**scene, grad_key: x}, camera=cam, bg=bg, opts=opts,
                   **KW)
        return jnp.sum((o.color - tgt) ** 2)

    def lr(x):
        c, *_ = render_reference(**{**scene, grad_key: x}, camera=cam,
                                 bg=bg, opts=opts)
        return jnp.sum((c - tgt) ** 2)

    g1 = jax.grad(lp)(scene[grad_key])
    g2 = jax.grad(lr)(scene[grad_key])
    scale = max(float(jnp.abs(g2).max()), 1e-3)
    np.testing.assert_allclose(np.asarray(g1) / scale,
                               np.asarray(g2) / scale, atol=3e-4)


def test_gaussian_dim3(rng):
    opts = RenderOptions(height=40, width=40, gaussian_dim=3, rot_4d=False,
                         time_duration=1.0)
    _check(_scene(rng, sh_channels=16), opts, rng)


def test_dim4_separable_time(rng):
    opts = RenderOptions(height=40, width=40, gaussian_dim=4, rot_4d=False,
                         time_duration=1.0)
    _check(_scene(rng), opts, rng, grad_key="t")


def test_force_sh_3d(rng):
    opts = RenderOptions(height=40, width=40, gaussian_dim=4, rot_4d=True,
                         force_sh_3d=True, time_duration=1.0)
    _check(_scene(rng, sh_channels=16), opts, rng, grad_key="sh")


def test_scale_modifier(rng):
    opts = RenderOptions(height=40, width=40, gaussian_dim=4, rot_4d=True,
                         time_duration=1.0, scale_modifier=0.5)
    _check(_scene(rng), opts, rng, grad_key="scales")


def test_prefilter_var(rng):
    opts = RenderOptions(height=40, width=40, gaussian_dim=4, rot_4d=True,
                         time_duration=1.0, prefilter_var=0.05)
    _check(_scene(rng), opts, rng, grad_key="opacity")
