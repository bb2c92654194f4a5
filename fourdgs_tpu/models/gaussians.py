"""The 4D gaussian parameter pytree and its optimizer.

Functional redesign of the reference `GaussianModel`
(`scene/gaussian_model.py`): the 9 learned tensors live in a flat
`GaussianParams` NamedTuple padded to a static CAPACITY with an active
count, so densify/prune never change jitted shapes — they rewrite the
padded arrays (and Adam moments) on the host at the reference's 100-iter
cadence, exactly like the reference's optimizer-state surgery
(`gaussian_model.py:376-484`) but as pure array rebuilds.

The optimizer is hand-rolled Adam (eps outside the sqrt? no — reference
uses torch.optim.Adam(eps=1e-15): p -= lr·m̂/(√v̂+eps)) with per-group
learning rates and the exponential xyz decay (`gaussian_model.py:331-369`).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sh as shlib

ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-15  # reference gaussian_model.py:353


class GaussianParams(NamedTuple):
    """Raw (pre-activation) learned tensors, padded to capacity P.

    Field names mirror the reference param groups (`gaussian_model.py:336-351`).
    """
    xyz: jax.Array          # (P, 3)
    t: jax.Array            # (P, 1)
    scaling: jax.Array      # (P, 3)   log-scale
    scaling_t: jax.Array    # (P, 1)   log-scale
    rotation: jax.Array     # (P, 4)   unnormalized quat (left)
    rotation_r: jax.Array   # (P, 4)   unnormalized quat (right)
    f_dc: jax.Array         # (P, 1, 3)
    f_rest: jax.Array       # (P, M-1, 3)
    opacity: jax.Array      # (P, 1)   pre-sigmoid


class AdamState(NamedTuple):
    mu: GaussianParams
    nu: GaussianParams
    count: jax.Array  # () int32


class GaussianState(NamedTuple):
    """Full training state for the gaussian cloud (a single pytree)."""
    params: GaussianParams
    adam: AdamState
    n_active: jax.Array            # () int32
    # densification statistics (reference xyz_gradient_accum / t_…/ denom /
    # max_radii2D, `gaussian_model.py:73-75,87`)
    xyz_grad_accum: jax.Array      # (P,)
    t_grad_accum: jax.Array        # (P,)
    denom: jax.Array               # (P,)
    max_radii2d: jax.Array         # (P,) float32 (pixels)


def inverse_sigmoid(x):
    return np.log(x / (1 - x))


def capacity_for(n: int, slack: float = 1.3, multiple: int = 1024) -> int:
    """Padded capacity schedule: slack headroom, rounded to a lane multiple."""
    return int(math.ceil(n * slack / multiple)) * multiple


def empty_params(capacity: int, sh_channels: int, dtype=jnp.float32) -> GaussianParams:
    """Safe padding rows: identity quats, tiny scales, ~0 opacity."""
    z = lambda *s: jnp.zeros(s, dtype)
    quat = jnp.zeros((capacity, 4), dtype).at[:, 0].set(1.0)
    return GaussianParams(
        xyz=z(capacity, 3),
        t=z(capacity, 1),
        scaling=jnp.full((capacity, 3), -10.0, dtype),
        scaling_t=jnp.full((capacity, 1), 0.0, dtype),
        rotation=quat,
        rotation_r=quat,
        f_dc=z(capacity, 1, 3),
        f_rest=z(capacity, sh_channels - 1, 3),
        opacity=jnp.full((capacity, 1), -9.21, dtype),  # sigmoid ≈ 1e-4
    )


def init_from_pcd(
    points: np.ndarray,
    colors: np.ndarray,
    *,
    sh_channels: int,
    time_duration=(0.0, 1.0),
    times: np.ndarray | None = None,
    capacity: int | None = None,
    seed: int = 0,
    mean_knn_dist2: np.ndarray | None = None,
) -> GaussianState:
    """Build the initial cloud (reference create_from_pcd,
    `gaussian_model.py:259-300`):
      * color DC from RGB; rest zero.
      * time from the ply `time` field, else uniform over 1.2×duration−0.1.
      * log-scale = log √(mean squared distance to 3 nearest neighbors).
      * scale_t = log √(duration/5); opacity 0.1; identity quats.
    """
    n = points.shape[0]
    capacity = capacity or capacity_for(n)
    rng = np.random.default_rng(seed)

    params = empty_params(capacity, sh_channels)
    dur = time_duration[1] - time_duration[0]
    if times is None:
        times = ((rng.random((n, 1)) * 1.2 - 0.1) * dur
                 + time_duration[0])
    if mean_knn_dist2 is None:
        # Native multithreaded exact 3-NN (replaces simple-knn's
        # distCUDA2); numpy fallback inside when no compiler.
        from ..native import mean_dist2_to_3nn
        mean_knn_dist2 = mean_dist2_to_3nn(points)
    dist2 = np.maximum(np.asarray(mean_knn_dist2), 1e-7)
    scales = np.log(np.sqrt(dist2))[:, None].repeat(3, axis=1)
    scale_t = math.log(math.sqrt(dur / 5.0))

    def fill(arr, vals):
        return arr.at[:n].set(jnp.asarray(vals, arr.dtype))

    params = params._replace(
        xyz=fill(params.xyz, points),
        t=fill(params.t, times),
        scaling=fill(params.scaling, scales),
        scaling_t=params.scaling_t.at[:n].set(scale_t),
        f_dc=fill(params.f_dc, shlib.rgb_to_sh_dc(
            np.asarray(colors, np.float32))[:, None, :]),
        opacity=params.opacity.at[:n].set(float(inverse_sigmoid(0.1))),
    )
    zerosP = GaussianParams(*[jnp.zeros_like(x) for x in params])
    return GaussianState(
        params=params,
        adam=AdamState(mu=zerosP, nu=zerosP, count=jnp.zeros((), jnp.int32)),
        n_active=jnp.asarray(n, jnp.int32),
        xyz_grad_accum=jnp.zeros((capacity,)),
        t_grad_accum=jnp.zeros((capacity,)),
        denom=jnp.zeros((capacity,)),
        max_radii2d=jnp.zeros((capacity,)),
    )


class Activated(NamedTuple):
    """Post-activation views consumed by the renderer."""
    means3d: jax.Array
    t: jax.Array
    scales: jax.Array
    scales_t: jax.Array
    rotations: jax.Array
    rotations_r: jax.Array
    opacity: jax.Array
    sh: jax.Array
    active: jax.Array


def activate(params: GaussianParams, n_active: jax.Array) -> Activated:
    """exp / sigmoid / normalize activations (`gaussian_model.py:49-60`)."""
    p = params.xyz.shape[0]
    qn = lambda q: q / jnp.maximum(
        jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    return Activated(
        means3d=params.xyz,
        t=params.t[:, 0],
        scales=jnp.exp(params.scaling),
        scales_t=jnp.exp(params.scaling_t[:, 0]),
        rotations=qn(params.rotation),
        rotations_r=qn(params.rotation_r),
        opacity=jax.nn.sigmoid(params.opacity[:, 0]),
        sh=jnp.concatenate([params.f_dc, params.f_rest], axis=1),
        active=jnp.arange(p) < n_active,
    )


def expon_lr(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
             max_steps=1000000):
    """JaxNeRF-style log-linear decay (`general_utils.py:30-63`), traceable."""
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
    else:
        delay = 1.0
    return delay * log_lerp


def group_lrs(opt_cfg, spatial_lr_scale: float, step) -> GaussianParams:
    """Per-group learning rates at `step` (reference training_setup +
    update_learning_rate, `gaussian_model.py:331-369`)."""
    xyz_lr = expon_lr(
        step,
        opt_cfg.position_lr_init * spatial_lr_scale,
        opt_cfg.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt_cfg.position_lr_delay_mult,
        max_steps=opt_cfg.position_lr_max_steps)
    t_lr_init = (opt_cfg.position_t_lr_init
                 if opt_cfg.position_t_lr_init >= 0
                 else opt_cfg.position_lr_init)
    return GaussianParams(
        xyz=xyz_lr,
        t=t_lr_init * spatial_lr_scale * jnp.ones(()),
        scaling=opt_cfg.scaling_lr * jnp.ones(()),
        scaling_t=opt_cfg.scaling_lr * jnp.ones(()),
        rotation=opt_cfg.rotation_lr * jnp.ones(()),
        rotation_r=opt_cfg.rotation_lr * jnp.ones(()),
        f_dc=opt_cfg.feature_lr * jnp.ones(()),
        f_rest=opt_cfg.feature_lr / 20.0 * jnp.ones(()),
        opacity=opt_cfg.opacity_lr * jnp.ones(()),
    )


def adam_update(params: GaussianParams, grads: GaussianParams,
                state: AdamState, lrs: GaussianParams,
                update_mask: jax.Array | None = None):
    """torch-Adam step (eps added outside the sqrt, eps=1e-15).

    `update_mask` (P,) optionally freezes padding rows (they have zero
    grads, but freezing also stops moment decay on live rows' zeros — we
    keep torch semantics: every row in the group updates each step, which
    matches the reference since its tensors hold only live rows; padding
    rows here have identically-zero grads and zero moments, so updating
    them is a no-op anyway).
    """
    count = state.count + 1
    b1c = 1.0 - ADAM_B1 ** count.astype(jnp.float32)
    b2c = 1.0 - ADAM_B2 ** count.astype(jnp.float32)

    def upd(p, g, m, v, lr):
        m = ADAM_B1 * m + (1 - ADAM_B1) * g
        v = ADAM_B2 * v + (1 - ADAM_B2) * g * g
        # torch's evaluation order (step_size scalar, addcdiv):
        # denom = sqrt(v)/sqrt(b2c) + eps;  p -= (lr/b1c) * m / denom.
        # Residual deviation vs torch: the bias corrections are f32 pows
        # under jit (torch uses exact python doubles; x64 is disabled
        # here) — ~1e-7 relative per step, verified to stay ~1e-6 over
        # multi-step runs (tests/test_adam_oracle.py).
        step = (lr / b1c) * (m / (jnp.sqrt(v) / jnp.sqrt(b2c) + ADAM_EPS))
        if update_mask is not None:
            mask = update_mask.reshape((-1,) + (1,) * (p.ndim - 1))
            step = jnp.where(mask, step, 0.0)
        return p - step, m, v

    new_p, new_m, new_v = [], [], []
    for p, g, m, v, lr in zip(params, grads, state.mu, state.nu, lrs):
        pp, mm, vv = upd(p, g, m, v, lr)
        new_p.append(pp)
        new_m.append(mm)
        new_v.append(vv)
    return (GaussianParams(*new_p),
            AdamState(GaussianParams(*new_m), GaussianParams(*new_v), count))
