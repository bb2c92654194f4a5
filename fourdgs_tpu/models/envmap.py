"""Learnable equirectangular environment map on a radius-60 sky sphere.

Parity with the reference (`gaussian_renderer/__init__.py:165-178`,
`train.py:71-77`): a (res, res, 3) zero-init texture optimized with Adam
(lr = feature_lr, eps = 1e-15); per pixel a camera ray is intersected with
the sphere, mapped to equirect (u, v) and bilinearly sampled
(torch grid_sample align_corners=False semantics); composited as
`rendered + (1 - alpha) * bg_env`. Channel-last here.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

SKY_RADIUS = 60.0


class EnvMapState(NamedTuple):
    texture: jax.Array    # (res, res, 3)
    mu: jax.Array
    nu: jax.Array
    count: jax.Array      # () int32


def init_envmap(res: int, dtype=jnp.float32) -> EnvMapState:
    z = jnp.zeros((res, res, 3), dtype)
    return EnvMapState(z, jnp.zeros_like(z), jnp.zeros_like(z),
                       jnp.zeros((), jnp.int32))


def camera_rays(viewmatrix: jax.Array, intrinsics: jax.Array,
                height: int, width: int):
    """Per-pixel world-space rays.

    intrinsics: (4,) [fl_x, fl_y, cx, cy] in pixels.
    Returns (origin (3,), dirs (H, W, 3) unit). Matches the reference
    `Camera.get_rays` (`scene/cameras.py:75-82`): pixel centers at +0.5.
    """
    fl_x, fl_y, cx, cy = (intrinsics[0], intrinsics[1],
                          intrinsics[2], intrinsics[3])
    i = jnp.arange(width, dtype=viewmatrix.dtype)[None, :] + 0.5
    j = jnp.arange(height, dtype=viewmatrix.dtype)[:, None] + 0.5
    x = (i - cx) / fl_x
    y = (j - cy) / fl_y
    ones = jnp.ones((height, width), viewmatrix.dtype)
    pts_view = jnp.stack([jnp.broadcast_to(x, (height, width)),
                          jnp.broadcast_to(y, (height, width)), ones], -1)
    r_c2w = viewmatrix[:3, :3].T          # inverse rotation
    campos = -(r_c2w @ viewmatrix[:3, 3])
    dirs = pts_view @ r_c2w.T
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return campos, dirs


def _bilinear_sample(tex: jax.Array, uv: jax.Array) -> jax.Array:
    """grid_sample(align_corners=False, zeros padding) for uv in [-1, 1],
    tex (R, R, 3), uv (..., 2) with uv[..., 0] = x (width axis)."""
    r_h, r_w = tex.shape[0], tex.shape[1]
    x = (uv[..., 0] + 1.0) * 0.5 * r_w - 0.5
    y = (uv[..., 1] + 1.0) * 0.5 * r_h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(yi, xi):
        inb = ((xi >= 0) & (xi < r_w) & (yi >= 0) & (yi < r_h))
        xi_c = jnp.clip(xi, 0, r_w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, r_h - 1).astype(jnp.int32)
        return jnp.where(inb[..., None], tex[yi_c, xi_c], 0.0)

    return ((1 - wx)[..., None] * (1 - wy)[..., None] * tap(y0, x0)
            + wx[..., None] * (1 - wy)[..., None] * tap(y0, x0 + 1)
            + (1 - wx)[..., None] * wy[..., None] * tap(y0 + 1, x0)
            + wx[..., None] * wy[..., None] * tap(y0 + 1, x0 + 1))


def sample_sky(texture: jax.Array, origin: jax.Array, dirs: jax.Array):
    """Environment color for unit rays hitting the R=60 sphere."""
    od = jnp.sum(origin * dirs, axis=-1)
    delta = od * od - (jnp.sum(origin * origin) - SKY_RADIUS ** 2)
    t_hit = -od + jnp.sqrt(jnp.maximum(delta, 1e-12))
    hit = origin + dirs * t_hit[..., None]
    tu = jnp.arctan2(hit[..., 1], hit[..., 0]) / (2.0 * jnp.pi) + 0.5
    tv = jnp.arccos(jnp.clip(hit[..., 2] / SKY_RADIUS, -1.0, 1.0)) / jnp.pi
    uv = jnp.stack([tu, tv], axis=-1) * 2.0 - 1.0
    return _bilinear_sample(texture, uv)


def composite_sky(color: jax.Array, alpha: jax.Array, texture: jax.Array,
                  viewmatrix: jax.Array, intrinsics: jax.Array):
    """rendered + (1 - alpha) * env (`gaussian_renderer/__init__.py:178`)."""
    h, w = color.shape[:2]
    origin, dirs = camera_rays(viewmatrix, intrinsics, h, w)
    bg = sample_sky(texture, origin, dirs)
    return color + (1.0 - alpha)[..., None] * bg
