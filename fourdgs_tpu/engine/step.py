"""The jitted training step: batched render -> loss -> grads -> Adam.

Functional redesign of the reference hot loop (`train.py:83-252`). The
reference's sequential per-camera gradient accumulation
(`train.py:104-163`) becomes a vmapped camera batch — identical math
(losses are averaged over the batch) with the batch axis free to be
sharded over the device mesh. The reference's visibility-count gradient
renormalization for densification stats (`train.py:168-183`) is
reproduced exactly from the per-camera viewspace-tap gradients.
"""

from __future__ import annotations


from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import envmap as envmap_lib
from ..models.densify import add_densification_stats
from ..models.gaussians import (GaussianState, activate, adam_update,
                                group_lrs)
from ..ops import gaussmath as gm
from ..ops import sh as shlib
from ..ops.knn import knn
from ..ops.preprocess import CameraArrays, RenderOptions
from ..render import render
from ..utils import losses as loss_lib

ADAM_EPS = 1e-15


class StepConfig(NamedTuple):
    """Static (hashable) per-run configuration of the train step."""
    lambda_dssim: float = 0.2
    lambda_opa_mask: float = 0.0
    lambda_rigid: float = 0.0
    lambda_motion: float = 0.0
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    position_t_lr_init: float = -1.0
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    spatial_lr_scale: float = 1.0
    sh_increase_interval: int = 1000
    sh_degree: int = 3
    sh_degree_t: int = 0
    rigid_k: int = 20
    env_map_res: int = 0
    env_optimize_from: int = 0
    env_optimize_until: int = 1 << 30
    # Reference steps the optimizer only while iteration < opt.iterations
    # (`train.py:245-246`): the final iteration computes grads but skips
    # the update.
    iterations: int = 1 << 30


class StepMetrics(NamedTuple):
    loss: jax.Array
    l1: jax.Array
    ssim_loss: jax.Array
    psnr: jax.Array
    num_rendered: jax.Array    # () int32 max over batch
    max_per_tile: jax.Array    # () int32 max over batch
    instances_dropped: jax.Array  # () int32 SUM over batch — instances
    #                               the binner truncated away (0 except
    #                               on an overflow spike step)
    n_active: jax.Array
    rigid: jax.Array
    motion: jax.Array
    aligned_pad: jax.Array = None  # () int32 max over batch — dummy
    #                               rows consumed by the aligned layout
    #                               (adaptive-budget observability).
    #                               Default stays a plain constant: a jnp
    #                               default would initialize the XLA
    #                               backend at import time and break
    #                               jax.distributed workers.


def sh_annealing_mask(step, cfg: StepConfig, opts: RenderOptions,
                      num_channels: int):
    """Dynamic degree-annealing mask (reference oneupSHdegree,
    `gaussian_model.py:253-257`, called every sh_increase_interval)."""
    k = step // cfg.sh_increase_interval
    if opts.gaussian_dim == 3 or opts.force_sh_3d:
        deg = jnp.minimum(k, cfg.sh_degree)
        return shlib.sh_degree_mask_3d(deg, num_channels)
    deg = jnp.minimum(k, cfg.sh_degree)
    deg_t = jnp.clip(k - cfg.sh_degree, 0, cfg.sh_degree_t)
    return shlib.sh_degree_mask_4d(deg, deg_t)[:num_channels]


def _velocity(act, opts: RenderOptions):
    """Mean-velocity Δμ/Δt at dt = 0.1 for the rigid/motion losses
    (`train.py:138-158` via get_current_covariance_and_mean_offset)."""
    scales_xyzt = jnp.concatenate(
        [act.scales, act.scales_t[..., None]], axis=-1)
    cov4 = gm.build_cov4d(scales_xyzt, act.rotations, act.rotations_r)
    cov_t = jnp.maximum(cov4[..., 3, 3], 1e-12)
    # Δμ at timestamp t + 0.1 -> dt = 0.1.
    return cov4[..., :3, 3] / cov_t[..., None] * 0.1


def build_step_fn(
    opts: RenderOptions,
    cfg: StepConfig,
    *,
    capacity: int,
    max_per_tile: int,
    chunk: int = 32,
    batch_size: int = 1,
    backend: str = "xla",
    fast_grad_reduce: bool = True,
    strips: int = 1,
    dummy_cap: int | None = None,
):
    """Build the (unjitted) train step for fixed static shapes. Use
    `make_train_step` for single-device jit or
    `parallel.make_sharded_train_step` for a device mesh.

    strips > 1 renders every camera as `strips` horizontal strip cameras
    (principal-point shift, `parallel/strips.py`) — the camera axis of
    `cams`/`intrinsics` has length batch_size*strips (camera-major) and
    can be mesh-sharded so ONE large frame spreads over devices. The
    strips are reassembled into full frames BEFORE the photometric loss,
    so the training math (SSIM included) is identical to full-frame
    training; only the render is sharded."""
    has_env = cfg.env_map_res > 0
    if opts.height % strips != 0:
        raise ValueError(f"height {opts.height} not divisible into "
                         f"{strips} strips")
    r_opts = (opts if strips == 1
              else opts._replace(height=opts.height // strips))

    def loss_fn(params, env_tex, tap, gauss: GaussianState,
                cams: CameraArrays, gt, alpha_mask, intrinsics, bg, step):
        act = activate(params, gauss.n_active)
        sh_mask = sh_annealing_mask(step, cfg, opts, act.sh.shape[1])

        def render_one(cam: CameraArrays, tap_b, intr):
            out = render(
                means3d=act.means3d, t=act.t, scales=act.scales,
                scales_t=act.scales_t, rotations=act.rotations,
                rotations_r=act.rotations_r, opacity=act.opacity,
                sh=act.sh, active=act.active, camera=cam, bg=bg,
                opts=r_opts, capacity=capacity, max_per_tile=max_per_tile,
                chunk=chunk, sh_mask=sh_mask, mean2d_tap=tap_b,
                backend=backend, fast_grad_reduce=fast_grad_reduce,
                dummy_cap=dummy_cap)
            color = out.color
            if has_env:
                # Sky compositing is pixel-local (rays from the shifted
                # strip intrinsics), so it composes per strip.
                color = envmap_lib.composite_sky(
                    color, out.alpha, env_tex, cam.viewmatrix, intr)
            return color, dict(visible=out.visible, radii=out.radii,
                               num_rendered=out.num_rendered,
                               max_per_tile=out.max_per_tile,
                               instances_dropped=out.instances_dropped,
                               aligned_pad=out.aligned_pad,
                               alpha=out.alpha)

        color_s, aux = jax.vmap(render_one)(cams, tap, intrinsics)

        # (B*strips, H/strips, W, 3) -> (B, H, W, 3): strips of one camera
        # are contiguous (camera-major), so this is a pure reshape. Under a
        # sharded camera axis XLA inserts the strip all-gather here and the
        # matching scatter in the backward.
        b = batch_size
        color = color_s.reshape((b, opts.height) + color_s.shape[2:])
        alpha_img = aux["alpha"].reshape((b, opts.height) + aux["alpha"].shape[2:])
        aux["color"] = color

        def frame_loss(color_f, gt_img):
            # fast_grad_reduce is the production-numerics knob: it also
            # picks the 3-bf16-pass SSIM blurs (~2^-17 on the loss).
            return loss_lib.photometric_loss(color_f, gt_img,
                                             cfg.lambda_dssim,
                                             fast=fast_grad_reduce)

        per_cam_loss, l1, lssim = jax.vmap(frame_loss)(color, gt)
        aux["l1"], aux["lssim"] = l1, lssim
        loss = jnp.mean(per_cam_loss)
        if cfg.lambda_opa_mask > 0:
            loss = loss + cfg.lambda_opa_mask * jnp.mean(jax.vmap(
                loss_lib.opacity_mask_loss)(alpha_img, alpha_mask))

        rigid = jnp.zeros(())
        motion = jnp.zeros(())
        if cfg.lambda_rigid > 0 or cfg.lambda_motion > 0:
            vel = _velocity(act, opts)
            n = jnp.maximum(gauss.n_active.astype(jnp.float32), 1.0)
            # norm with a zero-safe gradient (||0|| has NaN grad otherwise;
            # identical-velocity neighbor pairs are common).
            safe_norm = lambda v: jnp.sqrt(
                jnp.maximum(jnp.sum(v * v, axis=-1), 1e-24))
            if cfg.lambda_rigid > 0:
                # The reference pointops `knn(x, x, k)` returns the query
                # point itself as a zero-contribution neighbor
                # (`train.py:138-152`), so only k−1 real neighbors enter the
                # sum while the normalization stays /k. Our knn excludes
                # self, so query k−1 neighbors and keep /k.
                # Per-step budget: span 8192 x 2 rotated passes measures
                # recall@20 = 0.997 on a 300k trained cloud
                # (scripts/probe_knn_recall.py) at ~1/4 the pair volume
                # of the default span — the exp(-100 d) weights make the
                # rare farther-substitute neighbor contribute ~nothing,
                # while the sweep was the single most expensive non-
                # render stage of a composed rigid-loss step.
                idx, dist2 = knn(jax.lax.stop_gradient(act.means3d),
                                 k=cfg.rigid_k - 1, valid=act.active,
                                 span=8192)
                w = jnp.exp(-100.0 * jnp.sqrt(jnp.maximum(dist2, 0.0)))
                # Columnar gathers: vel[idx] as a (P, k, 3) row gather
                # would lane-pad the minor dim 42x on TPU.
                vd2 = jnp.zeros(idx.shape, vel.dtype)
                for c in range(3):
                    col = vel[:, c]
                    vd2 = vd2 + (col[idx] - col[:, None]) ** 2
                vel_dist = jnp.sqrt(jnp.maximum(vd2, 1e-24))
                w = jnp.where(act.active[:, None], w, 0.0)
                rigid = jnp.sum(w * vel_dist) / cfg.rigid_k / n
                loss = loss + cfg.lambda_rigid * rigid
            if cfg.lambda_motion > 0:
                vnorm = safe_norm(vel)
                motion = jnp.sum(jnp.where(act.active, vnorm, 0.0)) / n
                loss = loss + cfg.lambda_motion * motion
        aux["rigid"] = rigid
        aux["motion"] = motion
        return loss, aux

    def step_fn(gauss: GaussianState, env, step, cams: CameraArrays,
                gt, alpha_mask, intrinsics, bg):
        """One optimizer step. cams/intrinsics lead with B*strips; gt and
        alpha_mask lead with B (full frames)."""
        p = gauss.params.xyz.shape[0]
        tap = jnp.zeros((batch_size * strips, p, 2), gauss.params.xyz.dtype)
        env_tex = env.texture if has_env else None

        argnums = (0, 1, 2) if has_env else (0, 2)
        vg = jax.value_and_grad(loss_fn, argnums=argnums, has_aux=True)
        (loss_val, aux), grads = vg(
            gauss.params, env_tex, tap, gauss, cams, gt, alpha_mask,
            intrinsics, bg, step)
        if has_env:
            g_params, g_env, g_tap = grads
        else:
            (g_params, g_tap), g_env = grads, None

        # --- densification statistics (train.py:164-183, 231-238) ---------
        # Strip quantities fold to per-camera first: a camera saw a gaussian
        # iff any of its strips did; its NDC tap gradient is the sum of the
        # strip tap gradients, with the y component rescaled from strip-NDC
        # (pixels = ndc*h_strip/2) back to full-frame NDC units so the
        # densify thresholds keep the reference's scale.
        vis = jnp.any(aux["visible"].reshape(batch_size, strips, p),
                      axis=1)                      # (B, P)
        g_tap = jnp.sum(g_tap.reshape(batch_size, strips, p, 2), axis=1)
        if strips > 1:
            g_tap = g_tap * jnp.asarray([1.0, float(strips)],
                                        g_tap.dtype)
            aux["radii"] = jnp.max(
                aux["radii"].reshape(batch_size, strips, p), axis=1)
        vis_count = jnp.sum(vis.astype(jnp.int32), axis=0)
        visibility_filter = vis_count > 0
        denom = jnp.maximum(vis_count.astype(jnp.float32), 1.0)
        tap_norm = jnp.linalg.norm(g_tap, axis=-1)  # (B, P)
        point_grad = jnp.sum(tap_norm, axis=0) * batch_size / denom
        t_grad = g_params.t[:, 0] * batch_size / denom
        radii_max = jnp.max(aux["radii"], axis=0)
        gauss = add_densification_stats(
            gauss, point_grad, t_grad, visibility_filter, radii_max)

        # --- Adam ---------------------------------------------------------
        lrs = group_lrs(cfg, cfg.spatial_lr_scale, step)
        do_step = step < cfg.iterations    # reference train.py:245-246
        active = (jnp.arange(p) < gauss.n_active) & do_step
        new_params, new_adam = adam_update(
            gauss.params, g_params, gauss.adam, lrs, update_mask=active)
        gauss = gauss._replace(params=new_params, adam=new_adam)

        if has_env:
            do_env = (do_step & (step >= cfg.env_optimize_from)
                      & (step < cfg.env_optimize_until))
            count = env.count + do_env.astype(jnp.int32)
            b1c = 1.0 - 0.9 ** jnp.maximum(count.astype(jnp.float32), 1.0)
            b2c = 1.0 - 0.999 ** jnp.maximum(count.astype(jnp.float32), 1.0)
            mu = jnp.where(do_env, 0.9 * env.mu + 0.1 * g_env, env.mu)
            nu = jnp.where(do_env, 0.999 * env.nu + 0.001 * g_env * g_env,
                           env.nu)
            upd = cfg.feature_lr * (mu / b1c) / (jnp.sqrt(nu / b2c) + ADAM_EPS)
            tex = jnp.where(do_env, env.texture - upd, env.texture)
            env = envmap_lib.EnvMapState(tex, mu, nu, count)

        psnr = loss_lib.psnr(aux["color"][-1], gt[-1])
        metrics = StepMetrics(
            loss=loss_val, l1=jnp.mean(aux["l1"]),
            ssim_loss=jnp.mean(aux["lssim"]), psnr=psnr,
            num_rendered=jnp.max(aux["num_rendered"]),
            max_per_tile=jnp.max(aux["max_per_tile"]),
            instances_dropped=jnp.sum(aux["instances_dropped"]),
            n_active=gauss.n_active,
            rigid=aux["rigid"], motion=aux["motion"],
            aligned_pad=jnp.max(aux["aligned_pad"]))
        return gauss, env, metrics

    return step_fn


def make_train_step(opts: RenderOptions, cfg: StepConfig, *, capacity: int,
                    max_per_tile: int, chunk: int = 32, batch_size: int = 1,
                    backend: str = "xla", strips: int = 1,
                    dummy_cap: int | None = None):
    """Single-device jitted train step.

    NOTE: no buffer donation — several state leaves can legitimately alias
    the same zeros buffer right after init/densify, which XLA's donation
    checker rejects ("donate the same buffer twice")."""
    return jax.jit(build_step_fn(
        opts, cfg, capacity=capacity, max_per_tile=max_per_tile,
        chunk=chunk, batch_size=batch_size, backend=backend, strips=strips,
        dummy_cap=dummy_cap))
