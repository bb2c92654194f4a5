"""Functional adaptive density control over the padded gaussian cloud.

Redesign of the reference's in-place optimizer surgery
(`scene/gaussian_model.py:376-589`) as pure, jit-compiled array rebuilds
with STATIC shapes: the cloud lives in capacity-padded arrays; clone /
split / prune compute destination indices with cumsums and write survivors
+ new rows with unique-index scatters. The host only grows capacity
(recompile) when the cloud outgrows its padding.

Behavioral parity notes:
  * clone: grad-norm >= thr and max world scale <= percent_dense * extent;
    exact parameter copy, zeroed Adam moments (`gaussian_model.py:533-555`).
  * split: grad-norm >= thr and max scale > percent_dense * extent; N = 2
    children sampled from the parent's own (4D, when rot_4d) gaussian,
    child scales = parent / 1.6, parents pruned
    (`gaussian_model.py:486-531`).
  * final prune: opacity < min_opacity, plus (when a screen-size threshold
    is active) world scale > 0.1 * extent. The reference computes the
    radii2D test AFTER densification_postfix zeroed max_radii2D, so inside
    the densify path that test never fires; it is live only via
    prune_only (`gaussian_model.py:557-575` + postfix reset at 478-483).
    We reproduce both behaviors (densify_and_prune vs prune_only).
  * all densification statistics are zeroed afterwards (postfix,
    `gaussian_model.py:478-483`).
  * opacity reset: op <- min(op, 0.01) with zeroed opacity Adam moments
    (`gaussian_model.py:371-389`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import gaussmath as gm
from .gaussians import AdamState, GaussianParams, GaussianState


class DensifyConfig(NamedTuple):
    """Static densification hyper-parameters (reference OptimizationParams)."""
    grad_threshold: float = 0.0002
    grad_t_threshold: float = 0.0002 / 40  # computed, unused in selection (parity)
    min_opacity: float = 0.005
    percent_dense: float = 0.01
    max_screen_size: float = 20.0
    split_n: int = 2


class DensifyInfo(NamedTuple):
    n_active: jax.Array       # () int32 — new count (clipped to capacity)
    n_needed: jax.Array       # () int32 — true count (host grows capacity if > P)
    n_cloned: jax.Array
    n_split: jax.Array
    n_pruned: jax.Array


def _scatter_rows(dst: GaussianParams, src: GaussianParams,
                  idx: jax.Array, mask: jax.Array) -> GaussianParams:
    """dst[idx[i]] = src[i] where mask[i]; out-of-range/unmasked dropped.
    Unmasked rows get DISTINCT out-of-bounds indices so unique_indices
    stays truthful."""
    capacity = dst.xyz.shape[0]
    rows = jnp.arange(idx.shape[0], dtype=jnp.int32)
    safe = jnp.where(mask, idx, capacity + rows)
    return GaussianParams(*[
        d.at[safe].set(s, mode="drop", unique_indices=True)
        for d, s in zip(dst, src)])


def _dest_indices(mask: jax.Array, offset) -> jax.Array:
    """Packed destination index for each masked row (original order kept)."""
    return offset + jnp.cumsum(mask.astype(jnp.int32)) - 1


def _split_children(params: GaussianParams, key: jax.Array, n: int,
                    rot_4d: bool, gaussian_dim: int):
    """Children rows for EVERY point (selection masks later); returns a
    list of n GaussianParams. Sampling matches `gaussian_model.py:505-526`."""
    p = params.xyz.shape[0]
    scales = jnp.exp(params.scaling)
    scales_t = jnp.exp(params.scaling_t)
    inv_shrink = 1.0 / (0.8 * n)
    children = []
    keys = jax.random.split(key, n)
    qn = lambda q: q / jnp.maximum(
        jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    for j in range(n):
        if rot_4d:
            eps = jax.random.normal(keys[j], (p, 4), params.xyz.dtype)
            rot = gm.rotor4d_to_rotmat(qn(params.rotation), qn(params.rotation_r))
            s4 = jnp.concatenate([scales, scales_t], axis=-1)
            delta = jnp.einsum("pij,pj->pi", rot, eps * s4)
            new_xyz = params.xyz + delta[:, :3]
            new_t = params.t + delta[:, 3:4]
            new_scaling_t = params.scaling_t + jnp.log(inv_shrink)
        else:
            eps = jax.random.normal(keys[j], (p, 3), params.xyz.dtype)
            rot = gm.quat_to_rotmat(qn(params.rotation))
            delta = jnp.einsum("pij,pj->pi", rot, eps * scales)
            new_xyz = params.xyz + delta
            if gaussian_dim == 4:
                eps_t = jax.random.normal(
                    jax.random.fold_in(keys[j], 1), (p, 1), params.xyz.dtype)
                new_t = params.t + eps_t * scales_t
                new_scaling_t = params.scaling_t + jnp.log(inv_shrink)
            else:
                new_t = params.t
                new_scaling_t = params.scaling_t
        children.append(params._replace(
            xyz=new_xyz, t=new_t,
            scaling=params.scaling + jnp.log(inv_shrink),
            scaling_t=new_scaling_t))
    return children


@functools.partial(jax.jit, static_argnames=("cfg", "rot_4d", "gaussian_dim",
                                             "use_size_threshold"))
def densify_and_prune(
    state: GaussianState,
    key: jax.Array,
    extent: jax.Array,
    *,
    cfg: DensifyConfig,
    rot_4d: bool = True,
    gaussian_dim: int = 4,
    use_size_threshold: bool = False,
):
    """One densification event (reference cadence: every 100 iters in the
    densify window). Returns (new_state, DensifyInfo)."""
    params = state.params
    capacity = params.xyz.shape[0]
    active = jnp.arange(capacity) < state.n_active

    denom = jnp.maximum(state.denom, 1.0)
    grads = jnp.where(state.denom > 0, state.xyz_grad_accum / denom, 0.0)
    scales = jnp.exp(params.scaling)
    max_scale = jnp.max(scales, axis=-1)
    opacity = jax.nn.sigmoid(params.opacity[:, 0])

    hot = active & (grads >= cfg.grad_threshold)
    clone = hot & (max_scale <= cfg.percent_dense * extent)
    split = hot & (max_scale > cfg.percent_dense * extent)

    # Final prune test (applies to old + new rows; the radii2D component is
    # structurally dead here — stats were just zeroed — reference parity).
    if use_size_threshold:
        too_big_ws = max_scale > 0.1 * extent
    else:
        too_big_ws = jnp.zeros_like(active)
    drop = (opacity < cfg.min_opacity) | too_big_ws

    keep_old = active & ~split & ~drop
    keep_clone = clone & ~drop       # clone rows duplicate parent op/scale
    # Children: scale shrinks by 1.6 so re-evaluate their own size test.
    child_scale_ok = (~(jnp.max(scales / (0.8 * cfg.split_n), -1) > 0.1 * extent)
                      if use_size_threshold else jnp.ones_like(active))
    keep_child = split & (opacity >= cfg.min_opacity) & child_scale_ok

    n_old = jnp.sum(keep_old.astype(jnp.int32))
    n_clone = jnp.sum(keep_clone.astype(jnp.int32))
    n_child = jnp.sum(keep_child.astype(jnp.int32))

    out = GaussianParams(*[jnp.zeros_like(x) for x in params])
    zero_adam = GaussianParams(*[jnp.zeros_like(x) for x in params])

    dst_old = _dest_indices(keep_old, 0)
    out = _scatter_rows(out, params, dst_old, keep_old)
    mu = _scatter_rows(zero_adam, state.adam.mu, dst_old, keep_old)
    nu = _scatter_rows(zero_adam, state.adam.nu, dst_old, keep_old)

    dst_clone = _dest_indices(keep_clone, n_old)
    out = _scatter_rows(out, params, dst_clone, keep_clone)

    children = _split_children(params, key, cfg.split_n, rot_4d, gaussian_dim)
    base = n_old + n_clone
    for j, child in enumerate(children):
        dst = _dest_indices(keep_child, 0) * cfg.split_n + j + base
        out = _scatter_rows(out, child, dst, keep_child)

    n_needed = n_old + n_clone + cfg.split_n * n_child
    n_active = jnp.minimum(n_needed, capacity)

    zeros1 = jnp.zeros((capacity,), state.xyz_grad_accum.dtype)
    new_state = GaussianState(
        params=out,
        adam=AdamState(mu=mu, nu=nu, count=state.adam.count),
        n_active=n_active.astype(jnp.int32),
        xyz_grad_accum=zeros1,
        t_grad_accum=zeros1,
        denom=zeros1,
        max_radii2d=zeros1,
    )
    info = DensifyInfo(
        n_active=new_state.n_active, n_needed=n_needed,
        n_cloned=n_clone, n_split=n_child,
        n_pruned=jnp.sum((active & drop & ~split).astype(jnp.int32)))
    return new_state, info


@functools.partial(jax.jit, static_argnames=("cfg", "use_size_threshold"))
def prune_only(state: GaussianState, extent, *, cfg: DensifyConfig,
               use_size_threshold: bool = True):
    """Pure prune pass (reference densify_and_prune(prune_only=True) —
    here max_radii2D is live). Stats survive compaction (prune_points
    gathers them, `gaussian_model.py:421-431`)."""
    params = state.params
    capacity = params.xyz.shape[0]
    active = jnp.arange(capacity) < state.n_active
    opacity = jax.nn.sigmoid(params.opacity[:, 0])
    drop = opacity < cfg.min_opacity
    if use_size_threshold:
        drop = (drop | (state.max_radii2d > cfg.max_screen_size)
                | (jnp.max(jnp.exp(params.scaling), -1) > 0.1 * extent))
    keep = active & ~drop
    dst = _dest_indices(keep, 0)
    blank = GaussianParams(*[jnp.zeros_like(x) for x in params])
    out = _scatter_rows(blank, params, dst, keep)
    mu = _scatter_rows(blank, state.adam.mu, dst, keep)
    nu = _scatter_rows(blank, state.adam.nu, dst, keep)

    def compact1(a):
        rows = jnp.arange(capacity, dtype=jnp.int32)
        safe = jnp.where(keep, dst, capacity + rows)
        return jnp.zeros_like(a).at[safe].set(a, mode="drop",
                                              unique_indices=True)

    n_keep = jnp.sum(keep.astype(jnp.int32))
    new_state = GaussianState(
        params=out, adam=AdamState(mu, nu, state.adam.count),
        n_active=n_keep,
        xyz_grad_accum=compact1(state.xyz_grad_accum),
        t_grad_accum=compact1(state.t_grad_accum),
        denom=compact1(state.denom),
        max_radii2d=compact1(state.max_radii2d),
    )
    return new_state, n_keep


@jax.jit
def reset_opacity(state: GaussianState) -> GaussianState:
    """op <- inverse_sigmoid(min(sigmoid(op), 0.01)), opacity Adam moments
    zeroed (`gaussian_model.py:371-389`)."""
    op = jax.nn.sigmoid(state.params.opacity)
    new_op = jnp.log(jnp.minimum(op, 0.01) / (1.0 - jnp.minimum(op, 0.01)))
    return state._replace(
        params=state.params._replace(opacity=new_op),
        adam=state.adam._replace(
            mu=state.adam.mu._replace(opacity=jnp.zeros_like(new_op)),
            nu=state.adam.nu._replace(opacity=jnp.zeros_like(new_op))))


@jax.jit
def add_densification_stats(
    state: GaussianState,
    viewspace_grad_norm: jax.Array,  # (P,) batch-normalized ||dL/dmean2d[:2]||
    t_grad: jax.Array,               # (P,) batch-normalized |dL/dt|
    visible: jax.Array,              # (P,) bool
    radii: jax.Array,                # (P,) int32
) -> GaussianState:
    """Accumulate per-point gradient stats + screen radii
    (`gaussian_model.py:579-589`, `train.py:233-238`)."""
    vis = visible
    return state._replace(
        xyz_grad_accum=state.xyz_grad_accum + jnp.where(vis, viewspace_grad_norm, 0.0),
        t_grad_accum=state.t_grad_accum + jnp.where(vis, t_grad, 0.0),
        denom=state.denom + vis.astype(state.denom.dtype),
        max_radii2d=jnp.maximum(state.max_radii2d,
                                jnp.where(vis, radii.astype(jnp.float32), 0.0)))


def grow_capacity(state: GaussianState, new_capacity: int) -> GaussianState:
    """Host-side capacity growth (recompile boundary): pad every per-point
    array; padding rows are inert (zero opacity grads, inactive mask)."""
    old = state.params.xyz.shape[0]
    extra = new_capacity - old
    if extra <= 0:
        return state

    def pad(a):
        if a.ndim == 0 or a.shape[0] != old:
            return a
        return jnp.concatenate(
            [a, jnp.zeros((extra,) + a.shape[1:], a.dtype)], axis=0)

    pad_params = lambda p: GaussianParams(*[pad(x) for x in p])
    # Keep padding quats valid (identity) so activations stay finite.
    def fix_quats(p: GaussianParams) -> GaussianParams:
        q = p.rotation.at[old:, 0].set(1.0)
        qr = p.rotation_r.at[old:, 0].set(1.0)
        return p._replace(rotation=q, rotation_r=qr,
                          scaling=p.scaling.at[old:].set(-10.0),
                          opacity=p.opacity.at[old:].set(-9.21))

    return GaussianState(
        params=fix_quats(pad_params(state.params)),
        adam=AdamState(pad_params(state.adam.mu), pad_params(state.adam.nu),
                       state.adam.count),
        n_active=state.n_active,
        xyz_grad_accum=pad(state.xyz_grad_accum),
        t_grad_accum=pad(state.t_grad_accum),
        denom=pad(state.denom),
        max_radii2d=pad(state.max_radii2d),
    )


def shrink_capacity(state: GaussianState, new_capacity: int) -> GaussianState:
    """Host-side capacity SHRINK (recompile boundary) — the inverse of
    grow_capacity, for after the densify window when pruning has left
    n_active far below capacity: every downstream stage (preprocess,
    sort, grad reduce) is capacity-static, so a pruned cloud keeps paying
    peak-capacity cost until the shapes shrink. Live rows are always the
    compacted prefix (densify_and_prune's cumsum compaction), so this is
    a pure slice. No-op if the new capacity would drop live rows."""
    old = state.params.xyz.shape[0]
    if new_capacity >= old or new_capacity < int(state.n_active):
        return state

    def cut(a):
        if a.ndim == 0 or a.shape[0] != old:
            return a
        return a[:new_capacity]

    cut_params = lambda p: GaussianParams(*[cut(x) for x in p])  # noqa: E731
    return GaussianState(
        params=cut_params(state.params),
        adam=AdamState(cut_params(state.adam.mu), cut_params(state.adam.nu),
                       state.adam.count),
        n_active=state.n_active,
        xyz_grad_accum=cut(state.xyz_grad_accum),
        t_grad_accum=cut(state.t_grad_accum),
        denom=cut(state.denom),
        max_radii2d=cut(state.max_radii2d),
    )
