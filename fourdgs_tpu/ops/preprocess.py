"""Per-gaussian preprocess: temporal conditioning → frustum cull → EWA
projection → conic/radius/tile-rect → SH color.

Mirrors the behavior of the reference `preprocessCUDA`
(`cuda_rasterizer/forward.cu:355-496`) but as one fused XLA stage over
(P,) arrays — embarrassingly parallel VPU work with static shapes; culling
is masking (weight-0), never a shape change.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import gaussmath as gm
from . import sh as shlib

TILE = 16  # BLOCK_X = BLOCK_Y = 16 (reference config.h:15-16)


class CameraArrays(NamedTuple):
    """Dynamic per-camera tensors (all jnp, so a batch axis can be vmapped).

    Matrix convention: applied as M @ [x; 1] (the reference stores these
    transposed and right-multiplies; same math — `scene/cameras.py:65-71`).
    """
    viewmatrix: jax.Array   # (4, 4) world → view
    projmatrix: jax.Array   # (4, 4) = P @ V
    campos: jax.Array       # (3,)
    focal: jax.Array        # (2,) [fx, fy] pixels
    tanfov: jax.Array       # (2,) [tan(fovx/2), tan(fovy/2)]
    timestamp: jax.Array    # () scalar


class RenderOptions(NamedTuple):
    """Static (hashable) renderer configuration."""
    height: int
    width: int
    gaussian_dim: int = 4
    rot_4d: bool = True
    force_sh_3d: bool = False
    time_duration: float = 1.0
    prefilter_var: float = -1.0
    scale_modifier: float = 1.0

    @property
    def tiles_x(self) -> int:
        return (self.width + TILE - 1) // TILE

    @property
    def tiles_y(self) -> int:
        return (self.height + TILE - 1) // TILE

    @property
    def num_tiles(self) -> int:
        return self.tiles_x * self.tiles_y


class ProcessedGaussians(NamedTuple):
    """Per-gaussian screen-space quantities (all (P, ...), masked by `visible`)."""
    xy: jax.Array            # (P, 2) pixel-space mean
    depth: jax.Array         # (P,) view-space z
    conic: jax.Array         # (P, 3) inverse 2D covariance [a, b, c]
    opacity: jax.Array       # (P,) final alpha multiplier (marginal applied)
    rgb: jax.Array           # (P, 3) clamped color
    flow: jax.Array          # (P, 2) 2D flow feature (zeros in training)
    radius: jax.Array        # (P,) int32 pixel radius (0 if culled)
    rect: jax.Array          # (P, 4) int32 tile rect [x0, y0, x1, y1)
    tiles_touched: jax.Array  # (P,) int32
    visible: jax.Array       # (P,) bool
    means3d: jax.Array       # (P, 3) time-shifted world means
    cov3d: jax.Array         # (P, 6) conditional covariance (packed)


def preprocess(
    *,
    means3d: jax.Array,
    t: jax.Array,
    scales: jax.Array,
    scales_t: jax.Array,
    rotations: jax.Array,
    rotations_r: jax.Array,
    opacity: jax.Array,
    sh: jax.Array,
    active: jax.Array,
    camera: CameraArrays,
    opts: RenderOptions,
    sh_mask: jax.Array | None = None,
    mean2d_tap: jax.Array | None = None,
    colors_precomp: jax.Array | None = None,
    cov3d_precomp: jax.Array | None = None,
) -> ProcessedGaussians:
    """Run the full preprocess for one camera.

    Args:
      means3d (P,3), t (P,), scales (P,3), scales_t (P,): post-activation.
      rotations / rotations_r (P,4): normalized quaternions.
      opacity (P,): post-sigmoid.
      sh (P, M, 3): SH coefficients (dc + rest, reference channel order).
      active (P,): bool mask of live (non-padding) gaussians.
      camera / opts: see the NamedTuples.
      sh_mask: optional (M,) degree-annealing mask.
      mean2d_tap: optional (P, 2) zeros, added to the NDC mean so its
        gradient reproduces the reference's viewspace_points grad tap
        (`gaussian_renderer/__init__.py:27-31`, NDC-unit gradients).
      colors_precomp: optional (P, 3) overrides SH evaluation.
      cov3d_precomp: optional (P, 6) overrides covariance computation
        (mirrors the reference's cov3D_precomp path). For 4D the caller
        pre-shifts `means3d` by Δμ, folds the temporal marginal into
        `opacity`, and folds the 0.05 prefilter into `active`
        (`gaussian_renderer/__init__.py:73-147`).
    """
    p = means3d.shape[0]
    mod = opts.scale_modifier

    # --- temporal conditioning -------------------------------------------
    # Columnar (scalar-expanded) math throughout: no (P, 3, 3)/(P, 4, 4)
    # intermediates, which pad to 128 lanes on TPU (see gaussmath.py).
    if cov3d_precomp is not None:
        cov3 = cov3d_precomp
        shifted = means3d
        marginal_ok = jnp.ones((p,), bool)
        op = opacity
    elif opts.gaussian_dim == 4 and opts.rot_4d:
        scales_xyzt = jnp.concatenate([scales, scales_t[..., None]], axis=-1) * mod
        cov3, delta_mean, marginal, _ = gm.condition_cov4d_columnar(
            scales_xyzt, rotations, rotations_r, t, camera.timestamp,
            opts.prefilter_var)
        marginal_ok = marginal > gm.MARGINAL_CULL
        shifted = means3d + delta_mean
        op = opacity * marginal
    else:
        cov3 = gm.cov3d_columnar(scales * mod, rotations)
        shifted = means3d
        if opts.gaussian_dim == 4:
            marginal = gm.marginal_t_separable(
                t, scales_t * mod, camera.timestamp, opts.prefilter_var)
            marginal_ok = marginal > gm.MARGINAL_CULL
            op = opacity * marginal
        else:
            marginal_ok = jnp.ones((p,), bool)
            op = opacity

    # --- frustum cull + projection ---------------------------------------
    depth = gm.view_z(shifted, camera.viewmatrix)
    in_front = depth > gm.NEAR_PLANE

    wh = jnp.asarray([opts.width, opts.height], dtype=means3d.dtype)
    xy, ndc = gm.project_points_columnar(shifted, camera.projmatrix, wh)
    if mean2d_tap is not None:
        # Gradient tap in NDC units (value is zeros).
        xy = xy + mean2d_tap * (wh * 0.5)

    cov2d = gm.ewa_project_columnar(shifted, cov3, camera.viewmatrix,
                                    camera.focal, camera.tanfov)
    conic, radius_f, conic_ok = gm.cov2d_to_conic_radius(cov2d)

    # --- tile rect (getRect semantics, auxiliary.h:47-57) ----------------
    # The REPORTED radius and the visibility test keep the reference's
    # isotropic ceil(3·sqrt(λmax)) footprint (densify stats and the
    # `visible`/`radii` output contract depend on it). The rect actually
    # handed to the binner is tightened render-exactly below.
    tx, ty = opts.tiles_x, opts.tiles_y
    r_int = radius_f.astype(jnp.int32)
    xi = xy[..., 0]
    yi = xy[..., 1]
    x0r = jnp.clip(((xi - radius_f) / TILE).astype(jnp.int32), 0, tx)
    y0r = jnp.clip(((yi - radius_f) / TILE).astype(jnp.int32), 0, ty)
    x1r = jnp.clip(((xi + radius_f + TILE - 1) / TILE).astype(jnp.int32), 0, tx)
    y1r = jnp.clip(((yi + radius_f + TILE - 1) / TILE).astype(jnp.int32), 0, ty)
    ntiles_ref = (x1r - x0r) * (y1r - y0r)

    visible = active & marginal_ok & in_front & conic_ok & (ntiles_ref > 0)

    # --- render-exact rect tightening ------------------------------------
    # The blend kernels skip any instance with alpha < ALPHA_MIN at a
    # pixel (forward.cu:589 semantics), so tiles where that holds for
    # EVERY pixel contribute exactly nothing. alpha = op·exp(-Q/2) with
    # Q the conic quadratic, so alpha >= ALPHA_MIN only inside the
    # ellipse Q <= tau, tau = 2·ln(op/ALPHA_MIN), whose axis-aligned
    # bounding box has half-extents sqrt(tau·Σxx), sqrt(tau·Σyy)
    # (Schur: min_dy Q = dx²/Σxx). Replacing the isotropic radius with
    # these per-axis, opacity-aware extents (capped by the reference
    # radius so the footprint stays a subset) drops the all-invisible
    # instances the reference's square rect still enumerates — the
    # render and every gradient are bit-unchanged, only instance count
    # and step time shrink.
    tau = jnp.maximum(
        2.0 * jnp.log(jnp.maximum(op, 1e-12) * (1.0 / gm.ALPHA_MIN)), 0.0)
    ex = jnp.minimum(jnp.sqrt(tau * jnp.maximum(cov2d[..., 0], 0.0))
                     * 1.0001 + 0.01, radius_f)
    ey = jnp.minimum(jnp.sqrt(tau * jnp.maximum(cov2d[..., 2], 0.0))
                     * 1.0001 + 0.01, radius_f)
    x0 = jnp.clip(((xi - ex) / TILE).astype(jnp.int32), x0r, x1r)
    y0 = jnp.clip(((yi - ey) / TILE).astype(jnp.int32), y0r, y1r)
    x1 = jnp.clip(((xi + ex + TILE - 1) / TILE).astype(jnp.int32), x0r, x1r)
    y1 = jnp.clip(((yi + ey + TILE - 1) / TILE).astype(jnp.int32), y0r, y1r)
    # op < ALPHA_MIN cannot pass the kernel's alpha floor anywhere
    # (exp(power) <= 1 inside the valid power <= 0 region).
    ntiles = jnp.where(op >= gm.ALPHA_MIN, (x1 - x0) * (y1 - y0), 0)

    # --- color -------------------------------------------------------------
    if colors_precomp is not None:
        rgb = colors_precomp
    else:
        # The reference CUDA path evaluates SH at the UNSHIFTED means
        # (forward.cu:480-487 passes orig_points).
        dirs = means3d - camera.campos
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
        if opts.gaussian_dim == 3 or opts.force_sh_3d:
            rgb = shlib.sh_to_rgb(shlib.eval_sh3d(sh, dirs, sh_mask))
        else:
            dir_t = t - camera.timestamp
            rgb = shlib.sh_to_rgb(shlib.eval_sh4d(
                sh, dirs, dir_t, opts.time_duration, sh_mask))

    zero = jnp.zeros((), means3d.dtype)
    radius_out = jnp.where(visible, r_int, 0)
    return ProcessedGaussians(
        xy=xy,
        depth=depth,
        conic=conic,
        opacity=jnp.where(visible, op, zero),
        rgb=rgb,
        flow=jnp.zeros((p, 2), means3d.dtype),
        radius=radius_out,
        rect=jnp.stack([x0, y0, x1, y1], axis=-1),
        tiles_touched=jnp.where(visible, ntiles, 0).astype(jnp.int32),
        visible=visible,
        means3d=shifted,
        cov3d=cov3,
    )
