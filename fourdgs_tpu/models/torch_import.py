"""Import the reference's torch checkpoints (.pth) into this framework.

A reference training run saves `torch.save((gaussians.capture(), iter),
chkpntN.pth)` (`/root/reference/train.py:226-228`); `capture()` packs the
raw (pre-activation) parameter tensors + densify statistics + the torch
Adam `state_dict()` (`gaussian_model.py:99-136`). The tensor layouts map
1:1 onto `GaussianParams` (same raw semantics), the Adam moments map by
param-group NAME (`gaussian_model.py:336-351`), and the env map transposes
(3, R, R) -> (R, R, 3). A migrating user's checkpoints therefore resume
here directly — both as `loaded_pth` cloud init (fresh optimizer, the
reference `create_from_pth` semantics, `gaussian_model.py:302-329`) and as
`start_checkpoint` full resume.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from .gaussians import (AdamState, GaussianParams, GaussianState,
                        capacity_for, empty_params)

# capture() tuple field offsets (gaussian_model.py:115-136, 4D layout).
_4D_FIELDS = ("active_sh_degree", "xyz", "f_dc", "f_rest", "scaling",
              "rotation", "opacity", "max_radii2d", "xyz_grad_accum",
              "t_grad_accum", "denom", "opt_state", "spatial_lr_scale",
              "t", "scaling_t", "rotation_r", "rot_4d", "env_map",
              "active_sh_degree_t")
# 3D layout (gaussian_model.py:100-114) — no t/scaling_t/rotation_r.
_3D_FIELDS = ("active_sh_degree", "xyz", "f_dc", "f_rest", "scaling",
              "rotation", "opacity", "max_radii2d", "xyz_grad_accum",
              "denom", "opt_state", "spatial_lr_scale")

# torch param-group name -> GaussianParams field (gaussian_model.py:336-351).
_GROUP_FIELD = {"xyz": "xyz", "f_dc": "f_dc", "f_rest": "f_rest",
                "opacity": "opacity", "scaling": "scaling",
                "rotation": "rotation", "t": "t", "scaling_t": "scaling_t",
                "rotation_r": "rotation_r"}


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def load_reference_pth(path: str) -> Tuple[dict, int]:
    """torch.load a reference checkpoint -> (named capture dict, iter)."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    capture, iteration = payload if isinstance(payload, tuple) and \
        len(payload) == 2 and isinstance(payload[1], int) else (payload, 0)
    fields = _4D_FIELDS if len(capture) == len(_4D_FIELDS) else _3D_FIELDS
    if len(capture) != len(fields):
        raise ValueError(
            f"unrecognized capture tuple of length {len(capture)} in {path}")
    return dict(zip(fields, capture)), int(iteration)


def _param_rows(cap: dict, n: int, duration: float) -> GaussianParams:
    """Raw tensors from the capture dict, 3D checkpoints padded with the
    4D defaults (scale_t = log sqrt(duration/5), t uniform-mid)."""
    if "t" in cap:
        t = _np(cap["t"]).reshape(n, 1)
        st = _np(cap["scaling_t"]).reshape(n, 1)
        rr = _np(cap["rotation_r"]).reshape(n, 4)
    else:
        t = np.zeros((n, 1), np.float32)
        st = np.full((n, 1), np.log(np.sqrt(max(duration, 1e-6) / 5)),
                     np.float32)
        rr = np.tile(np.asarray([[1, 0, 0, 0]], np.float32), (n, 1))
    return GaussianParams(
        xyz=_np(cap["xyz"]).reshape(n, 3), t=t,
        scaling=_np(cap["scaling"]).reshape(n, 3), scaling_t=st,
        rotation=_np(cap["rotation"]).reshape(n, 4), rotation_r=rr,
        f_dc=_np(cap["f_dc"]).reshape(n, 1, 3),
        f_rest=_np(cap["f_rest"]).reshape(n, -1, 3),
        opacity=_np(cap["opacity"]).reshape(n, 1))


def _adam_from_state_dict(opt_state: Dict[str, Any], n: int,
                          template: GaussianParams,
                          capacity: int) -> Optional[AdamState]:
    """Map torch Adam state_dict moments onto AdamState by group name."""
    try:
        groups = opt_state["param_groups"]
        state = opt_state["state"]
    except (KeyError, TypeError):
        return None
    mu = {f: np.zeros_like(np.asarray(getattr(template, f)))
          for f in _GROUP_FIELD.values()}
    nu = {f: np.zeros_like(np.asarray(getattr(template, f)))
          for f in _GROUP_FIELD.values()}
    step = 0
    for g in groups:
        field = _GROUP_FIELD.get(g.get("name"))
        if field is None or not g.get("params"):
            continue
        st = state.get(g["params"][0])
        if st is None:
            continue
        shp = mu[field].shape
        mu[field][:n] = _np(st["exp_avg"]).reshape((n,) + shp[1:])
        nu[field][:n] = _np(st["exp_avg_sq"]).reshape((n,) + shp[1:])
        s = st.get("step", 0)
        step = max(step, int(_np(s).item() if hasattr(s, "item") else s))
    import jax.numpy as jnp
    pad = lambda a: jnp.asarray(a)  # noqa: E731
    mk = lambda d: GaussianParams(**{f: pad(d[f]) for f in  # noqa: E731
                                     GaussianParams._fields})
    return AdamState(mk(mu), mk(nu), jnp.asarray(step, jnp.int32))


def import_reference_pth(path: str, *, duration: float = 1.0,
                         capacity_slack: float = 1.3,
                         with_optimizer: bool = True
                         ) -> Tuple[GaussianState, dict]:
    """Reference .pth -> padded GaussianState (+ meta: iteration,
    active SH degrees, spatial_lr_scale, env_map as (R, R, 3) or None)."""
    import jax.numpy as jnp

    cap, iteration = load_reference_pth(path)
    raw = _param_rows(cap, _np(cap["xyz"]).shape[0], duration)
    n = raw.xyz.shape[0]
    capacity = capacity_for(n, capacity_slack)
    sh_channels = 1 + raw.f_rest.shape[1]

    base = empty_params(capacity, sh_channels)
    params = GaussianParams(*[
        jnp.asarray(np.concatenate(
            [np.asarray(r, np.float32),
             np.asarray(b)[n:capacity]], axis=0))
        for r, b in zip(raw, base)])

    adam = None
    if with_optimizer:
        adam = _adam_from_state_dict(cap.get("opt_state") or {}, n,
                                     params, capacity)
    if adam is None:
        zeros = GaussianParams(*[jnp.zeros_like(x) for x in params])
        adam = AdamState(zeros, GaussianParams(
            *[jnp.zeros_like(x) for x in params]), jnp.zeros((), jnp.int32))

    stat = lambda key: jnp.zeros(capacity, jnp.float32).at[:n].set(  # noqa: E731
        _np(cap[key]).reshape(-1)[:n]) if key in cap else \
        jnp.zeros(capacity, jnp.float32)
    gauss = GaussianState(
        params=params, adam=adam, n_active=jnp.asarray(n, jnp.int32),
        xyz_grad_accum=stat("xyz_grad_accum"),
        t_grad_accum=stat("t_grad_accum"),
        denom=stat("denom"), max_radii2d=stat("max_radii2d"))

    env = cap.get("env_map")
    meta = {
        "iteration": iteration,
        "active_sh_degree": int(cap.get("active_sh_degree", 0)),
        "active_sh_degree_t": int(cap.get("active_sh_degree_t", 0) or 0),
        "spatial_lr_scale": float(cap.get("spatial_lr_scale", 1.0)),
        "env_map": None if env is None else _np(env).transpose(1, 2, 0),
        "rot_4d": bool(cap.get("rot_4d", "rotation_r" in cap)),
    }
    return gauss, meta


def export_reference_pth(path: str, gauss: GaussianState, *,
                         iteration: int = 0, active_sh_degree: int = 3,
                         active_sh_degree_t: int = 2, rot_4d: bool = True,
                         spatial_lr_scale: float = 1.0,
                         env_map: Optional[np.ndarray] = None) -> None:
    """Write a REFERENCE-format torch checkpoint (the 4D capture() tuple,
    `gaussian_model.py:115-136`) so a cloud trained here loads in the
    upstream code via `--start_checkpoint` / `create_from_pth`. Only the
    live rows are written; the optimizer state_dict is left empty (the
    reference re-runs training_setup and overwrites it on restore)."""
    import torch

    n = int(gauss.n_active)
    tt = lambda a, *shape: torch.from_numpy(  # noqa: E731
        np.asarray(a, np.float32)[:n].reshape(*shape).copy())
    p = gauss.params
    capture = (
        int(active_sh_degree),
        tt(p.xyz, n, 3), tt(p.f_dc, n, 1, 3),
        tt(p.f_rest, n, -1, 3), tt(p.scaling, n, 3),
        tt(p.rotation, n, 4), tt(p.opacity, n, 1),
        tt(gauss.max_radii2d, n),
        tt(gauss.xyz_grad_accum, n, 1), tt(gauss.t_grad_accum, n, 1),
        tt(gauss.denom, n, 1),
        {},                       # optimizer state (reference rebuilds)
        float(spatial_lr_scale),
        tt(p.t, n, 1), tt(p.scaling_t, n, 1), tt(p.rotation_r, n, 4),
        bool(rot_4d),
        None if env_map is None else torch.from_numpy(
            np.asarray(env_map, np.float32).transpose(2, 0, 1).copy()),
        int(active_sh_degree_t),
    )
    torch.save((capture, int(iteration)), path)
