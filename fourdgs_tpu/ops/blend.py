"""Tile-parallel saturating alpha blend with an analytic custom VJP.

TPU-first redesign of the reference hot kernels (`forward.cu:501-626`
renderCUDA and `backward.cu:926-1137`):

  * One 16×16 pixel tile is a 256-lane vector block; the K gaussians of a
    depth-sorted chunk are a reduction axis. The weighted color/feature
    accumulation is a (256, K) @ (K, 6) matmul per tile — MXU work — and
    the front-to-back transmittance recursion becomes a closed-form
    within-chunk cumulative product (no per-pixel serial loop).
  * The per-pixel early-exit (`T < 1e-4 → done`) is reproduced exactly via
    a monotone "done" mask: the instance that would cross the threshold is
    skipped and everything after it is dead, matching the CUDA semantics.
  * The backward pass replays chunks back-to-front, reconstructing T by
    division (exactly like `backward.cu:1040-1056`) from only two saved
    per-pixel scalars (final transmittance + contributor count) — O(1)
    residual memory.
  * Gradient scatter: CUDA atomicAdds into per-gaussian slots; TPU has no
    atomics, so per-instance gradients are written into the sorted
    instance list (each slot is touched exactly once) and reduced to
    per-gaussian gradients with permutation + cumsum segment sums
    (`binning.entry_grads_to_gaussian_grads`).

Numerics (all from the reference): alpha = min(0.99, opa·exp(power)) with
pass-through gradient on the clamp (the CUDA backward ignores the clamp,
`backward.cu:1060-1075`), alpha floor 1/255, power > 0 rejection,
transmittance floor 1e-4, fp32 accumulation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import gaussmath as gm
from .binning import TileBins, entry_grads_to_gaussian_grads
from .preprocess import TILE, RenderOptions

PIX = TILE * TILE  # 256 pixels per tile
NUM_FEAT = 6       # rgb(3) + depth(1) + flow(2)
NUM_GRAD = 12      # dxy(2) + dconic(3) + dopa(1) + dfeat(6)


class BlendConfig(NamedTuple):
    """Static blend configuration."""
    height: int
    width: int
    tiles_x: int
    tiles_y: int
    chunk: int = 32            # K — gaussians blended per scan step
    max_per_tile: int = 1024   # static bound on a single tile's instances

    @property
    def num_tiles(self) -> int:
        return self.tiles_x * self.tiles_y

    @property
    def num_chunks(self) -> int:
        return -(-self.max_per_tile // self.chunk)


def make_blend_config(opts: RenderOptions, chunk: int = 32,
                      max_per_tile: int = 1024) -> BlendConfig:
    return BlendConfig(height=opts.height, width=opts.width,
                       tiles_x=opts.tiles_x, tiles_y=opts.tiles_y,
                       chunk=chunk, max_per_tile=max_per_tile)


def _tile_pixel_coords(cfg: BlendConfig, dtype=jnp.float32):
    """(num_tiles, PIX) pixel x/y coordinates; within-tile order is
    row-major (p = yy·16 + xx), matching the final image reshape."""
    tids = jnp.arange(cfg.num_tiles, dtype=jnp.int32)
    tx = (tids % cfg.tiles_x)[:, None]
    ty = (tids // cfg.tiles_x)[:, None]
    pp = jnp.arange(PIX, dtype=jnp.int32)[None, :]
    px = (tx * TILE + pp % TILE).astype(dtype)
    py = (ty * TILE + pp // TILE).astype(dtype)
    return px, py


def _tiles_to_image(tiled: jax.Array, cfg: BlendConfig) -> jax.Array:
    """(num_tiles, PIX, C...) → (H, W, C...) (crops the tile padding)."""
    trailing = tiled.shape[2:]
    img = tiled.reshape((cfg.tiles_y, cfg.tiles_x, TILE, TILE) + trailing)
    img = jnp.swapaxes(img, 1, 2)
    img = img.reshape((cfg.tiles_y * TILE, cfg.tiles_x * TILE) + trailing)
    return img[: cfg.height, : cfg.width]


def _image_to_tiles(img: jax.Array, cfg: BlendConfig) -> jax.Array:
    """(H, W, C...) → (num_tiles, PIX, C...), zero-padding partial tiles."""
    trailing = img.shape[2:]
    hp, wp = cfg.tiles_y * TILE, cfg.tiles_x * TILE
    pad = [(0, hp - img.shape[0]), (0, wp - img.shape[1])] + [(0, 0)] * len(trailing)
    img = jnp.pad(img, pad)
    img = img.reshape((cfg.tiles_y, TILE, cfg.tiles_x, TILE) + trailing)
    img = jnp.swapaxes(img, 1, 2)
    return img.reshape((cfg.num_tiles, PIX) + trailing)


def _chunk_inputs(c, xy, conic, opacity, feat, bins: TileBins, cfg: BlendConfig):
    """Gather chunk c's per-instance data for every tile: (T, K, ·)."""
    k = cfg.chunk
    idx = bins.tile_start[:, None] + c * k + jnp.arange(k, dtype=jnp.int32)[None, :]
    in_range = idx < bins.tile_stop[:, None]
    capacity = bins.gauss_id.shape[0]
    safe = jnp.minimum(idx, capacity - 1)
    ids = bins.gauss_id[safe]
    return idx, in_range, ids, xy[ids], conic[ids], opacity[ids], feat[ids]


def _alpha_terms(xy_g, conic_g, opa_g, px, py):
    """Per (tile, k, pixel) gaussian falloff terms.

    Returns (power, g=exp(power), alpha_raw, alpha, dx, dy), each (T, K, P).
    """
    dx = xy_g[..., 0:1] - px[:, None, :]     # (T, K, PIX)
    dy = xy_g[..., 1:2] - py[:, None, :]
    a = conic_g[..., 0:1]
    b = conic_g[..., 1:2]
    cc = conic_g[..., 2:3]
    power = -0.5 * (a * dx * dx + cc * dy * dy) - b * dx * dy
    g = jnp.exp(power)
    alpha_raw = opa_g[..., None] * g
    alpha = jnp.minimum(alpha_raw, gm.ALPHA_CLAMP)
    return power, g, alpha_raw, alpha, dx, dy


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def blend(cfg: BlendConfig, xy, conic, opacity, feat, bg, bins: TileBins):
    """Front-to-back blend of the sorted instance list.

    Args:
      cfg: static BlendConfig.
      xy (P, 2) pixel means; conic (P, 3); opacity (P,);
      feat (P, 6) = [rgb, depth, flow]; bg (3,) background color.
      bins: the sorted tile bins (non-differentiable indices).

    Returns:
      color (H, W, 3) background-composited; depth (H, W) α-weighted
      (unnormalized); flow (H, W, 2); alpha (H, W) = 1 − T_final.
    """
    color, depth_img, flow_img, alpha_img, _, _ = _blend_forward(
        cfg, xy, conic, opacity, feat, bg, bins)
    return color, depth_img, flow_img, alpha_img


def _blend_forward(cfg: BlendConfig, xy, conic, opacity, feat, bg, bins):
    px, py = _tile_pixel_coords(cfg, xy.dtype)
    nt = cfg.num_tiles

    def step(carry, c):
        t_in, accum, done, ncon = carry
        _, in_range, _, xy_g, conic_g, opa_g, feat_g = _chunk_inputs(
            c, xy, conic, opacity, feat, bins, cfg)
        power, _, _, alpha, _, _ = _alpha_terms(xy_g, conic_g, opa_g, px, py)
        valid = in_range[..., None] & (power <= 0.0) & (alpha >= gm.ALPHA_MIN)

        # Tentative transmittance including every valid instance; the first
        # one that would cross the 1e-4 floor triggers "done" and is itself
        # skipped (forward.cu:590-596).
        a_v = jnp.where(valid, alpha, 0.0)
        q = t_in[:, None, :] * jnp.cumprod(1.0 - a_v, axis=1)
        fail = valid & (q < gm.T_EPS)
        dead = done[:, None, :] | (jnp.cumsum(fail.astype(jnp.int32), axis=1) > 0)
        used = valid & ~dead

        a_u = jnp.where(used, alpha, 0.0)
        cu = 1.0 - a_u
        prod_incl = jnp.cumprod(cu, axis=1)
        prod_excl = prod_incl / cu  # cu ≥ 0.01 (alpha ≤ 0.99)
        w = a_u * t_in[:, None, :] * prod_excl           # (T, K, PIX)
        contrib = jnp.einsum("tkp,tkf->tpf", w, feat_g, precision="highest",
                             preferred_element_type=jnp.float32)
        t_out = t_in * prod_incl[:, -1, :]
        done_out = done | jnp.any(fail, axis=1)
        rank1 = (c * cfg.chunk + 1
                 + jnp.arange(cfg.chunk, dtype=jnp.int32))[None, :, None]
        ncon_out = jnp.maximum(
            ncon, jnp.max(jnp.where(used, rank1, 0), axis=1))
        return (t_out, accum + contrib, done_out, ncon_out), None

    init = (jnp.ones((nt, PIX), xy.dtype),
            jnp.zeros((nt, PIX, NUM_FEAT), jnp.float32),
            jnp.zeros((nt, PIX), bool),
            jnp.zeros((nt, PIX), jnp.int32))
    (t_final, accum, _, ncontrib), _ = jax.lax.scan(
        step, init, jnp.arange(cfg.num_chunks, dtype=jnp.int32))

    color = _tiles_to_image(
        accum[..., 0:3] + t_final[..., None] * bg[None, None, :], cfg)
    depth_img = _tiles_to_image(accum[..., 3], cfg)
    flow_img = _tiles_to_image(accum[..., 4:6], cfg)
    alpha_img = _tiles_to_image(1.0 - t_final, cfg)
    return color, depth_img, flow_img, alpha_img, t_final, ncontrib


def _blend_fwd(cfg, xy, conic, opacity, feat, bg, bins):
    color, depth_img, flow_img, alpha_img, t_final, ncontrib = _blend_forward(
        cfg, xy, conic, opacity, feat, bg, bins)
    res = (xy, conic, opacity, feat, bg, bins, t_final, ncontrib)
    return (color, depth_img, flow_img, alpha_img), res


def _blend_bwd(cfg: BlendConfig, res, cots):
    xy, conic, opacity, feat, bg, bins, t_final, ncontrib = res
    d_color, d_depth, d_flow, d_alpha = cots

    # Per-pixel cotangents in tile layout.
    dc = jnp.concatenate([
        _image_to_tiles(d_color, cfg),
        _image_to_tiles(d_depth, cfg)[..., None],
        _image_to_tiles(d_flow, cfg),
    ], axis=-1)                                   # (T, PIX, 6)
    # dL/dT_final: background compositing minus the alpha output.
    dt_total = (jnp.einsum("tpc,c->tp", dc[..., 0:3], bg)
                - _image_to_tiles(d_alpha, cfg))   # (T, PIX)
    d_bg = jnp.einsum("tp,tpc->c", t_final, dc[..., 0:3])

    px, py = _tile_pixel_coords(cfg, xy.dtype)
    capacity = bins.gauss_id.shape[0]

    def step(carry, c):
        t_run, sigma, entry_grads = carry
        idx, in_range, _, xy_g, conic_g, opa_g, feat_g = _chunk_inputs(
            c, xy, conic, opacity, feat, bins, cfg)
        power, g, alpha_raw, alpha, dx, dy = _alpha_terms(
            xy_g, conic_g, opa_g, px, py)
        valid = in_range[..., None] & (power <= 0.0) & (alpha >= gm.ALPHA_MIN)
        rank = (c * cfg.chunk
                + jnp.arange(cfg.chunk, dtype=jnp.int32))[None, :, None]
        used = valid & (rank < ncontrib[:, None, :])

        a_u = jnp.where(used, alpha, 0.0)
        cu = 1.0 - a_u
        # Reverse-inclusive product: rp[j] = prod_{k>=j} cu[k]; the
        # transmittance BEFORE instance j is t_run / rp[j]
        # (back-to-front reconstruction, backward.cu:1040-1056).
        rp = jnp.flip(jnp.cumprod(jnp.flip(cu, axis=1), axis=1), axis=1)
        t_before = t_run[:, None, :] / rp
        w = a_u * t_before                               # (T, K, PIX)

        # Per-instance feature gradients: dL/df_j = w_j · dC.
        d_feat_e = jnp.einsum("tkp,tpf->tkf", w, dc, precision="highest",
                              preferred_element_type=jnp.float32)

        # dL/dalpha_j = T_j·g_j − (σ_j + dT·T_final)/(1−α_j), where
        # g_j = Σ_f f_j dC_f and σ_j = Σ_{k>j} w_k g_k (suffix, cross-chunk).
        gdot = jnp.einsum("tkf,tpf->tkp", feat_g, dc, precision="highest",
                          preferred_element_type=jnp.float32)
        phi = w * gdot
        # suffix_excl[j] = Σ_{k>j in chunk} φ_k + σ_in
        suffix_incl = jnp.flip(jnp.cumsum(jnp.flip(phi, axis=1), axis=1), axis=1)
        suffix_excl = suffix_incl - phi + sigma[:, None, :]
        tf_term = dt_total * t_final                     # (T, PIX)
        d_alpha_e = jnp.where(
            used,
            t_before * gdot - (suffix_excl + tf_term[:, None, :]) / cu,
            0.0)

        # Chain through alpha = opa·exp(power) (clamp is pass-through,
        # matching backward.cu:1060-1075).
        d_power = alpha_raw * d_alpha_e
        d_opa_e = jnp.sum(g * d_alpha_e, axis=-1)        # (T, K)
        a_ = conic_g[..., 0:1]
        b_ = conic_g[..., 1:2]
        c_ = conic_g[..., 2:3]
        d_ca = jnp.sum(-0.5 * dx * dx * d_power, axis=-1)
        d_cb = jnp.sum(-dx * dy * d_power, axis=-1)
        d_cc = jnp.sum(-0.5 * dy * dy * d_power, axis=-1)
        d_x = jnp.sum(-(a_ * dx + b_ * dy) * d_power, axis=-1)
        d_y = jnp.sum(-(b_ * dx + c_ * dy) * d_power, axis=-1)

        grads_k = jnp.concatenate([
            d_x[..., None], d_y[..., None],
            d_ca[..., None], d_cb[..., None], d_cc[..., None],
            d_opa_e[..., None], d_feat_e,
        ], axis=-1)                                      # (T, K, 12)
        grads_k = jnp.where(in_range[..., None], grads_k, 0.0)

        safe_idx = jnp.where(in_range, idx, capacity)
        entry_grads = entry_grads.at[safe_idx.reshape(-1)].add(
            grads_k.reshape(-1, NUM_GRAD), mode="drop")

        t_out = t_run / rp[:, 0, :]
        sigma_out = sigma + suffix_incl[:, 0, :]
        return (t_out, sigma_out, entry_grads), None

    init = (t_final,
            jnp.zeros((cfg.num_tiles, PIX), jnp.float32),
            jnp.zeros((capacity, NUM_GRAD), jnp.float32))
    (_, _, entry_grads), _ = jax.lax.scan(
        step, init,
        jnp.arange(cfg.num_chunks - 1, -1, -1, dtype=jnp.int32))

    per_gauss = entry_grads_to_gaussian_grads(entry_grads, bins, xy.shape[0])
    d_xy = per_gauss[:, 0:2]
    d_conic = per_gauss[:, 2:5]
    d_opa = per_gauss[:, 5]
    d_feat = per_gauss[:, 6:12]
    # TileBins is all-integer → float0 cotangents.
    d_bins = jax.tree.map(
        lambda x: jnp.zeros(x.shape, dtype=jax.dtypes.float0), bins)
    return d_xy, d_conic, d_opa, d_feat, d_bg, d_bins


blend.defvjp(_blend_fwd, _blend_bwd)
