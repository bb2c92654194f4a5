"""Brute-force O(P · pixels) differentiable oracle renderer.

Implements the exact blend semantics of the tile pipeline (and of the
reference `forward.cu:501-626`) with no binning, no chunking and no custom
VJP — every pixel considers every gaussian in global depth order, masked
by the tile-rect coverage test the binner would have applied. Used as the
golden reference for the production path's forward values AND gradients
(its gradients come from plain `jax.grad` through the closed-form blend).
Only suitable for small scenes/tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import gaussmath as gm
from . import preprocess as pre
from .preprocess import TILE, CameraArrays, RenderOptions


def render_reference(
    *,
    means3d, t, scales, scales_t, rotations, rotations_r, opacity, sh,
    active, camera: CameraArrays, bg, opts: RenderOptions,
    sh_mask=None, mean2d_tap=None, colors_precomp=None, cov3d_precomp=None,
):
    """Returns (color (H,W,3), depth (H,W), flow (H,W,2), alpha (H,W))."""
    proc = pre.preprocess(
        means3d=means3d, t=t, scales=scales, scales_t=scales_t,
        rotations=rotations, rotations_r=rotations_r, opacity=opacity,
        sh=sh, active=active, camera=camera, opts=opts, sh_mask=sh_mask,
        mean2d_tap=mean2d_tap, colors_precomp=colors_precomp,
        cov3d_precomp=cov3d_precomp)

    # Global stable depth order; per-tile order is its restriction, matching
    # the binner's stable (tile, depth) sort.
    order = jnp.argsort(jax.lax.stop_gradient(proc.depth), stable=True)
    xy = proc.xy[order]
    conic = proc.conic[order]
    opa = proc.opacity[order]
    feat = jnp.concatenate(
        [proc.rgb, proc.depth[:, None], proc.flow], axis=-1)[order]
    rect = proc.rect[order]
    visible = proc.visible[order]

    hp, wp = opts.tiles_y * TILE, opts.tiles_x * TILE
    ys = jnp.arange(hp, dtype=xy.dtype)
    xs = jnp.arange(wp, dtype=xy.dtype)

    def render_pixel(pxf, pyf):
        tx = (pxf / TILE).astype(jnp.int32)
        ty = (pyf / TILE).astype(jnp.int32)
        covered = ((rect[:, 0] <= tx) & (tx < rect[:, 2])
                   & (rect[:, 1] <= ty) & (ty < rect[:, 3]) & visible)
        dx = xy[:, 0] - pxf
        dy = xy[:, 1] - pyf
        power = (-0.5 * (conic[:, 0] * dx * dx + conic[:, 2] * dy * dy)
                 - conic[:, 1] * dx * dy)
        alpha = jnp.minimum(opa * jnp.exp(power), gm.ALPHA_CLAMP)
        valid = covered & (power <= 0.0) & (alpha >= gm.ALPHA_MIN)
        a_v = jnp.where(valid, alpha, 0.0)
        q = jnp.cumprod(1.0 - a_v)
        fail = valid & (q < gm.T_EPS)
        dead = jnp.cumsum(fail.astype(jnp.int32)) > 0
        used = valid & ~dead
        a_u = jnp.where(used, alpha, 0.0)
        cu = 1.0 - a_u
        prod_incl = jnp.cumprod(cu)
        w = a_u * prod_incl / cu
        out = w @ feat
        t_fin = prod_incl[-1]
        return out, t_fin

    out, t_fin = jax.vmap(lambda y: jax.vmap(
        lambda x: render_pixel(x, y))(xs))(ys)

    out = out[: opts.height, : opts.width]
    t_fin = t_fin[: opts.height, : opts.width]
    color = out[..., 0:3] + t_fin[..., None] * bg
    return color, out[..., 3], out[..., 4:6], 1.0 - t_fin
