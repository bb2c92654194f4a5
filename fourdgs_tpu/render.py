"""Public rendering API: preprocess → tile binning → blend.

Mirrors the reference `gaussian_renderer.render()` output contract
(`gaussian_renderer/__init__.py:19-194`): color, viewspace-gradient tap,
visibility, radii, depth, alpha, flow — as one jittable function over
static-shape padded gaussian arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .ops import blend as blend_lib
from .ops import binning
from .ops import pallas_blend
from .ops import preprocess as pre
from .ops.preprocess import CameraArrays, RenderOptions


class RenderOutputs(NamedTuple):
    color: jax.Array        # (H, W, 3)
    depth: jax.Array        # (H, W) alpha-weighted, unnormalized
    alpha: jax.Array        # (H, W)
    flow: jax.Array         # (H, W, 2)
    radii: jax.Array        # (P,) int32 screen radius (0 = invisible)
    visible: jax.Array      # (P,) bool
    num_rendered: jax.Array  # () int32 (host checks vs capacity)
    max_per_tile: jax.Array  # () int32 (host checks vs blend bound)
    instances_dropped: jax.Array  # () int32 — instances truncated away
    #                         this render (capacity / tile-bound
    #                         overflow); the reference never truncates
    #                         (resize callback, rasterize_points.cu:28-34),
    #                         so steady state must be 0
    cov3d_com: jax.Array    # (P, 6) conditional 3D covariance (packed) —
    #                         the reference's covs_com (rasterize_points.cu:147)
    aligned_pad: jax.Array = None  # () int32 — dummy rows the aligned
    #                         layout consumed this render (pallas
    #                         backends; 0 on xla / on an overflow-
    #                         sentinel step). Feeds the trainer's
    #                         adaptive dummy-budget policy. NOTE: the
    #                         default must stay a plain constant — a
    #                         jnp default would initialize the XLA
    #                         backend at import time, breaking
    #                         jax.distributed workers.


def _aligned_pad(abins) -> jax.Array:
    """Dummy rows the aligned layout consumed: total_len - live
    instances. 0 on an overflow-sentinel step (total_len is then the
    rp+1 sentinel, not a length — the trainer treats drops separately)."""
    pad = abins.total_len - (abins.num_rendered - abins.dropped)
    return jnp.where(abins.dropped > 0, 0, pad).astype(jnp.int32)


def render(
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
    bg: jax.Array,
    opts: RenderOptions,
    capacity: int,
    max_per_tile: int = 1024,
    chunk: int = 32,
    sh_mask: jax.Array | None = None,
    mean2d_tap: jax.Array | None = None,
    colors_precomp: jax.Array | None = None,
    cov3d_precomp: jax.Array | None = None,
    backend: str = "xla",
    fast_grad_reduce: bool = False,
    infer: bool = False,
    dummy_cap: int | None = None,
) -> RenderOutputs:
    """Render one camera. All inputs post-activation; see `preprocess`.

    backend: "xla" (masked-matmul blend, any platform) or "pallas"
    (TPU tile kernels with per-tile dynamic trip counts) or
    "pallas_interpret" (Pallas interpreter, for CPU tests).

    infer=True (pallas backends only) takes the forward-only fast path:
    packed bf16-pair instance rows (exact f32 xy/conic; ~0.4% rounding
    on opacity/rgb/depth) and a single-pass bf16 transmittance cumsum.
    Not differentiable; the flow output is zeros.
    """
    proc = pre.preprocess(
        means3d=means3d, t=t, scales=scales, scales_t=scales_t,
        rotations=rotations, rotations_r=rotations_r, opacity=opacity,
        sh=sh, active=active, camera=camera, opts=opts, sh_mask=sh_mask,
        mean2d_tap=mean2d_tap, colors_precomp=colors_precomp,
        cov3d_precomp=cov3d_precomp)

    feat = jnp.concatenate(
        [proc.rgb, proc.depth[:, None], proc.flow], axis=-1)
    if infer and backend in ("pallas", "pallas_interpret"):
        abins = binning.bin_gaussians_aligned(
            jax.lax.stop_gradient(proc), opts, capacity, pallas_blend.CHUNK,
            dummy_cap=dummy_cap, grad=False)
        pcfg = pallas_blend.PallasBlendConfig(
            height=opts.height, width=opts.width, tiles_x=opts.tiles_x,
            tiles_y=opts.tiles_y,
            interpret=(backend == "pallas_interpret"),
            inst_capacity=capacity, infer=True, fwd_terms=1,
            tiles_per_program=16)
        color, depth_img, alpha_img = pallas_blend.blend_pallas_infer(
            pcfg, proc.xy, proc.conic, proc.opacity,
            jnp.concatenate([proc.rgb, proc.depth[:, None]], axis=-1),
            bg, abins)
        return RenderOutputs(
            color=color, depth=depth_img, alpha=alpha_img,
            flow=jnp.zeros((opts.height, opts.width, 2), jnp.float32),
            radii=proc.radius, visible=proc.visible,
            num_rendered=abins.num_rendered,
            max_per_tile=abins.max_per_tile,
            instances_dropped=abins.dropped, cov3d_com=proc.cov3d,
            aligned_pad=_aligned_pad(abins))
    if backend in ("pallas", "pallas_interpret"):
        abins = binning.bin_gaussians_aligned(
            jax.lax.stop_gradient(proc), opts, capacity, pallas_blend.CHUNK,
            dummy_cap=dummy_cap)
        pcfg = pallas_blend.PallasBlendConfig(
            height=opts.height, width=opts.width, tiles_x=opts.tiles_x,
            tiles_y=opts.tiles_y,
            interpret=(backend == "pallas_interpret"),
            inst_capacity=capacity,
            fast_grad_reduce=fast_grad_reduce,
            # Production mode also drops the backward data matmuls from
            # HIGHEST (6 MXU passes) to a (2,2)-term bf16 split (3
            # passes, ~1e-5 relative — scripts/probe_bwd_dots.py), and
            # writes bf16-pair-packed u32 gradient rows (half the
            # gradient DMA; the reduce's pack pass disappears); parity
            # mode (fast_grad_reduce=False) keeps HIGHEST + f32 rows.
            bwd_dot_terms=(2, 2) if fast_grad_reduce else (),
            packed_grads=fast_grad_reduce)
        color, depth_img, flow_img, alpha_img = pallas_blend.blend_pallas(
            pcfg, proc.xy, proc.conic, proc.opacity, feat, bg, abins)
        num_rendered, mpt = abins.num_rendered, abins.max_per_tile
        dropped = abins.dropped
    else:
        bins = binning.bin_gaussians(
            jax.lax.stop_gradient(proc), opts, capacity,
            max_per_tile=max_per_tile)
        cfg = blend_lib.make_blend_config(opts, chunk=chunk,
                                          max_per_tile=max_per_tile)
        color, depth_img, flow_img, alpha_img = blend_lib.blend(
            cfg, proc.xy, proc.conic, proc.opacity, feat, bg, bins)
        num_rendered, mpt = bins.num_rendered, bins.max_per_tile
        dropped = bins.dropped

    return RenderOutputs(
        color=color, depth=depth_img, alpha=alpha_img, flow=flow_img,
        radii=proc.radius, visible=proc.visible,
        num_rendered=num_rendered, max_per_tile=mpt,
        instances_dropped=dropped, cov3d_com=proc.cov3d,
        aligned_pad=(_aligned_pad(abins)
                     if backend in ("pallas", "pallas_interpret")
                     else jnp.zeros((), jnp.int32)))


def mark_visible(means3d: jax.Array, viewmatrix: jax.Array,
                 projmatrix: jax.Array | None = None) -> jax.Array:
    """Standalone frustum-visibility query: True where the point sits in
    front of the near plane (view-space z > 0.2).

    API-parity with `GaussianRasterizer.markVisible`
    (`gaussian_renderer/diff_gaussian_rasterization.py:252-261` →
    `rasterize_points.cu:272-291`): the reference's `in_frustum`
    (`auxiliary.h:140-163`) accepts the projection matrix but its NDC
    bound check is commented out, so only the z test applies — we keep
    the same signature and the same semantics. Jittable; (P, 3) -> (P,)
    bool."""
    del projmatrix  # accepted for signature parity; unused (see docstring)
    from .ops import gaussmath as gm
    return gm.view_z(means3d, viewmatrix) > gm.NEAR_PLANE
