"""Rigid and motion losses from the REAL train step vs a torch oracle
replicating the reference formulas exactly (`train.py:131-159`):
velocity = Δμ(t+0.1) from the 4D covariance, brute-force 20-NN with the
query point as its own zero-contribution neighbor, weights exp(-100·d),
Lrigid = Σ w·‖Δv‖ / k / n, Lmotion = mean ‖v‖."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from fourdgs_tpu.data.cameras import Camera, stack_cameras  # noqa: E402
from fourdgs_tpu.engine.step import StepConfig, make_train_step  # noqa: E402
from fourdgs_tpu.models.gaussians import activate, init_from_pcd  # noqa: E402
from fourdgs_tpu.ops.preprocess import RenderOptions  # noqa: E402


def test_rigid_motion_match_reference_formula(rng, monkeypatch):
    # build_scaling_rotation_4d allocates on device='cuda'; shim it out.
    _zeros = torch.zeros
    monkeypatch.setattr(
        torch, "zeros",
        lambda *a, **k: _zeros(*a, **{x: v for x, v in k.items()
                                      if x != "device"}))
    n, hw = 48, 16
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    pts[:, 2] += 4.0
    gauss = init_from_pcd(pts, rng.random((n, 3)).astype(np.float32),
                          sh_channels=48, capacity=64)
    # Randomize rotations/scales so the 4D covariance is nontrivial.
    p = gauss.params
    q = rng.normal(size=(64, 4)).astype(np.float32)
    qr = rng.normal(size=(64, 4)).astype(np.float32)
    gauss = gauss._replace(params=p._replace(
        rotation=jnp.asarray(q), rotation_r=jnp.asarray(qr),
        scaling=jnp.asarray(rng.normal(-1.5, 0.3, (64, 3)).astype(
            np.float32)),
        scaling_t=jnp.asarray(rng.normal(-0.5, 0.3, (64, 1)).astype(
            np.float32))))

    opts = RenderOptions(height=hw, width=hw, gaussian_dim=4, rot_4d=True,
                         time_duration=1.0)
    cfg = StepConfig(sh_degree=3, sh_degree_t=2, lambda_rigid=1.0,
                     lambda_motion=1.0)
    step = make_train_step(opts, cfg, capacity=2048, max_per_tile=256,
                           chunk=16, batch_size=1)
    cam = Camera(uid=0, rot=np.eye(3), trans=np.zeros(3), fovx=1.0,
                 fovy=1.0, width=hw, height=hw, timestamp=0.5)
    arrays = jax.tree.map(jnp.asarray, stack_cameras([cam]))
    gt = jnp.asarray(rng.random((1, hw, hw, 3)), jnp.float32)
    alpha = jnp.ones((1, hw, hw), jnp.float32)
    intr = jnp.asarray([[hw / 2.0] * 4], jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    _, _, metrics = step(gauss, None, jnp.int32(1), arrays, gt, alpha,
                         intr, bg)

    # ---- torch oracle on the ACTIVATED parameters -------------------
    act = activate(gauss.params, gauss.n_active)
    xyz = torch.from_numpy(np.asarray(act.means3d).copy())[:n]
    scales = torch.from_numpy(np.asarray(act.scales))[:n]
    scales_t = torch.from_numpy(np.asarray(act.scales_t))[:n, None]
    rots = torch.from_numpy(np.asarray(act.rotations))[:n]
    rots_r = torch.from_numpy(np.asarray(act.rotations_r))[:n]

    import importlib.util
    import sys
    import types
    for name in ("pointops2", "pointops2.functions",
                 "pointops2.functions.pointops"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["pointops2.functions.pointops"].furthestsampling = None
    sys.modules["pointops2.functions.pointops"].knnquery = None
    spec = importlib.util.spec_from_file_location(
        "_ref_gu", "/root/reference/utils/general_utils.py")
    gu = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gu)

    s4 = torch.cat([scales, scales_t], dim=-1)
    L = gu.build_scaling_rotation_4d(s4, rots, rots_r)
    cov4 = L @ L.transpose(1, 2)
    vel = cov4[:, :3, 3] / cov4[:, 3, 3:4] * 0.1      # Δμ at t + 0.1

    k = 20
    d2 = ((xyz[:, None] - xyz[None]) ** 2).sum(-1)
    dist, idx = torch.topk(d2, k, largest=False)      # includes self
    weight = torch.exp(-100.0 * torch.sqrt(dist))
    vel_dist = torch.norm(vel[idx] - vel[:, None], dim=-1)
    lrigid = float((weight * vel_dist).sum() / k / n)
    lmotion = float(vel.norm(dim=1).mean())

    assert float(metrics.rigid) == pytest.approx(lrigid, rel=2e-4)
    assert float(metrics.motion) == pytest.approx(lmotion, rel=1e-5)
