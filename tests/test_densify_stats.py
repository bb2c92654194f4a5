"""Batched densification statistics must equal the reference's sequential
per-camera accumulation with visibility-count renormalization
(`train.py:104-183`): per camera grad-norms of the NDC tap summed, then
scaled by batch_size / visibility_count for visible points."""

import jax
import jax.numpy as jnp
import numpy as np

from fourdgs_tpu.data.cameras import Camera, stack_cameras
from fourdgs_tpu.engine.step import StepConfig, make_train_step
from fourdgs_tpu.models.gaussians import activate, init_from_pcd
from fourdgs_tpu.ops.preprocess import RenderOptions
from fourdgs_tpu.render import render
from fourdgs_tpu.utils.losses import photometric_loss

B, HW, P_CAP = 2, 32, 64


def _setup(rng):
    pts = rng.uniform(-1, 1, (40, 3)).astype(np.float32)
    pts[:, 2] += 4.0
    gauss = init_from_pcd(pts, rng.random((40, 3)).astype(np.float32),
                          sh_channels=48, capacity=P_CAP)
    cams = [Camera(uid=i, rot=np.eye(3), trans=np.zeros(3), fovx=1.0,
                   fovy=1.0, width=HW, height=HW,
                   # different views so visibility differs per camera
                   timestamp=0.1 + 0.8 * i) for i in range(B)]
    gt = rng.random((B, HW, HW, 3)).astype(np.float32)
    return gauss, cams, gt


def test_batch_stats_match_reference_semantics(rng):
    gauss, cams, gt_np = _setup(rng)
    opts = RenderOptions(height=HW, width=HW, gaussian_dim=4, rot_4d=True,
                         time_duration=1.0)
    cfg = StepConfig(sh_degree=3, sh_degree_t=2)
    kw = dict(capacity=2048, max_per_tile=256, chunk=16)

    arrays = jax.tree.map(jnp.asarray, stack_cameras(cams))
    gt = jnp.asarray(gt_np)
    alpha = jnp.ones((B, HW, HW), jnp.float32)
    intr = jnp.tile(jnp.asarray([[16.0, 16.0, 16.0, 16.0]]), (B, 1))
    bg = jnp.zeros(3, jnp.float32)

    step = make_train_step(opts, cfg, batch_size=B, **kw)
    new_gauss, _, _ = step(gauss, None, jnp.int32(1), arrays, gt, alpha,
                           intr, bg)

    # ---- reference-style manual accumulation --------------------------
    act = activate(gauss.params, gauss.n_active)
    sh_mask = None  # step 1 -> degree 0; emulate via mask from the step
    from fourdgs_tpu.engine.step import sh_annealing_mask
    sh_mask = sh_annealing_mask(jnp.int32(1), cfg, opts, act.sh.shape[1])

    grads_per_cam, vis_per_cam, tgrads = [], [], []
    for i in range(B):
        cam_i = jax.tree.map(lambda a: a[i], arrays)

        def loss_one(tap, t_param):
            out = render(
                means3d=act.means3d, t=t_param, scales=act.scales,
                scales_t=act.scales_t, rotations=act.rotations,
                rotations_r=act.rotations_r, opacity=act.opacity,
                sh=act.sh, active=act.active, camera=cam_i, bg=bg,
                opts=opts, sh_mask=sh_mask, mean2d_tap=tap, **kw)
            # reference: per-camera loss / batch_size. fast=True matches
            # the step's production loss mode — this test checks the
            # batch-renormalization SEMANTICS, not loss numerics (the
            # fast-vs-exact gap is covered in test_losses).
            l, _, _ = photometric_loss(out.color, gt[i], 0.2, fast=True)
            return l / B, out.visible

        tap0 = jnp.zeros((P_CAP, 2))
        (g_tap, g_t), vis = jax.grad(
            lambda tap, tp: loss_one(tap, tp)[0], argnums=(0, 1))(
                tap0, act.t), loss_one(tap0, act.t)[1]
        grads_per_cam.append(np.linalg.norm(np.asarray(g_tap), axis=-1))
        tgrads.append(np.asarray(g_t))
        vis_per_cam.append(np.asarray(vis))

    vis_count = np.sum(vis_per_cam, axis=0)
    vis_any = vis_count > 0
    summed = np.sum(grads_per_cam, axis=0)
    expect = np.where(vis_any, summed * B / np.maximum(vis_count, 1), 0.0)
    got = np.asarray(new_gauss.xyz_grad_accum)
    np.testing.assert_allclose(got[vis_any], expect[vis_any],
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(got[~vis_any], 0.0, atol=1e-7)
    # denom counts each visible point once per event
    np.testing.assert_array_equal(np.asarray(new_gauss.denom) > 0, vis_any)

    # t-grad stats: raw param gradient chain — act.t vs raw t differs only
    # by the slice, so compare against the summed per-camera t grads.
    t_sum = np.sum(tgrads, axis=0)
    t_expect = np.where(vis_any, t_sum * B / np.maximum(vis_count, 1), 0.0)
    got_t = np.asarray(new_gauss.t_grad_accum)
    np.testing.assert_allclose(got_t[vis_any], t_expect[vis_any],
                               rtol=1e-4, atol=1e-7)
