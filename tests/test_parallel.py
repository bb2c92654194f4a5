"""Data-parallel sharded train step on the virtual 8-device CPU mesh:
must produce the same update as the single-device step."""

import jax
import jax.numpy as jnp
import numpy as np

from fourdgs_tpu.engine.step import StepConfig, make_train_step
from fourdgs_tpu.models.gaussians import init_from_pcd
from fourdgs_tpu.ops.preprocess import RenderOptions
from fourdgs_tpu.parallel import make_mesh, make_sharded_train_step
from fourdgs_tpu.data.cameras import Camera, stack_cameras

OPTS = RenderOptions(height=32, width=32, gaussian_dim=4, rot_4d=True,
                     time_duration=1.0)
CFG = StepConfig(sh_degree=3, sh_degree_t=2)
B = 8


def _setup(rng):
    pts = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
    pts[:, 2] += 4.0
    cols = rng.random((64, 3)).astype(np.float32)
    gauss = init_from_pcd(pts, cols, sh_channels=48, capacity=128)
    cams = [Camera(uid=i, rot=np.eye(3), trans=np.zeros(3), fovx=1.0,
                   fovy=1.0, width=32, height=32, timestamp=i / B)
            for i in range(B)]
    arrays = jax.tree.map(jnp.asarray, stack_cameras(cams))
    gt = jnp.asarray(rng.random((B, 32, 32, 3)), jnp.float32)
    alpha = jnp.ones((B, 32, 32), jnp.float32)
    intr = jnp.tile(jnp.asarray([[16.0, 16.0, 16.0, 16.0]]), (B, 1))
    bg = jnp.zeros(3, jnp.float32)
    return gauss, arrays, gt, alpha, intr, bg


def test_sharded_step_matches_single_device(rng):
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    gauss, arrays, gt, alpha, intr, bg = _setup(rng)
    kw = dict(capacity=4096, max_per_tile=256, chunk=16, batch_size=B)

    single = make_train_step(OPTS, CFG, **kw)
    g1, _, m1 = single(gauss, None, jnp.int32(1), arrays, gt, alpha, intr, bg)

    mesh = make_mesh(8)
    sharded = make_sharded_train_step(OPTS, CFG, mesh, **kw)
    g2, _, m2 = sharded(gauss, None, jnp.int32(1), arrays, gt, alpha, intr, bg)

    np.testing.assert_allclose(float(m1.loss), float(m2.loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1.params.xyz),
                               np.asarray(g2.params.xyz), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1.xyz_grad_accum),
                               np.asarray(g2.xyz_grad_accum), atol=1e-5)


def test_sharded_step_pallas_backend(rng):
    """The data-sharded step with the PALLAS kernels (interpret mode):
    structural evidence that the multi-chip TPU path — tile kernels
    vmapped over the camera batch, sharded over the mesh, grads
    all-reduced by XLA — compiles and agrees with the XLA backend."""
    assert len(jax.devices()) >= 8
    gauss, arrays, gt, alpha, intr, bg = _setup(rng)
    mesh = make_mesh(8)
    kw = dict(capacity=4096, max_per_tile=256, chunk=16, batch_size=B)

    sx = make_sharded_train_step(OPTS, CFG, mesh, backend="xla", **kw)
    gx, _, mx = sx(gauss, None, jnp.int32(1), arrays, gt, alpha, intr, bg)
    sp = make_sharded_train_step(OPTS, CFG, mesh,
                                 backend="pallas_interpret", **kw)
    gp, _, mp = sp(gauss, None, jnp.int32(1), arrays, gt, alpha, intr, bg)

    np.testing.assert_allclose(float(mx.loss), float(mp.loss), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gp.params.xyz),
                               np.asarray(gx.params.xyz), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp.xyz_grad_accum),
                               np.asarray(gx.xyz_grad_accum), atol=1e-4)


def test_strips_step_matches_full_frame(rng):
    """strips=4 (one camera as 4 mesh-sharded strip renders, full-frame
    loss after reassembly) must reproduce the full-frame step: same loss,
    same parameter update, same densify stats (incl. the strip->frame NDC
    tap-gradient rescale in engine/step.py)."""
    from fourdgs_tpu.engine.trainer import camera_intrinsics
    from fourdgs_tpu.parallel.strips import strip_cameras

    n = 4
    opts = RenderOptions(height=64, width=32, gaussian_dim=4, rot_4d=True,
                         time_duration=1.0)
    pts = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
    pts[:, 2] += 4.0
    gauss = init_from_pcd(pts, rng.random((64, 3)).astype(np.float32),
                          sh_channels=48, capacity=128)
    cam = Camera(uid=0, rot=np.eye(3), trans=np.zeros(3), fovx=1.0,
                 fovy=1.0, width=32, height=64, timestamp=0.3)
    gt = jnp.asarray(rng.random((1, 64, 32, 3)), jnp.float32)
    alpha = jnp.ones((1, 64, 32), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)

    full_arrays = jax.tree.map(jnp.asarray, stack_cameras([cam]))
    full_intr = jnp.asarray([camera_intrinsics(cam)])
    scams = strip_cameras(cam, n)
    strip_arrays = jax.tree.map(jnp.asarray, stack_cameras(scams))
    strip_intr = jnp.asarray(np.stack([camera_intrinsics(s)
                                       for s in scams]))

    kw = dict(capacity=4096, max_per_tile=256, chunk=16, batch_size=1)
    single = make_train_step(opts, CFG, **kw)
    g1, _, m1 = single(gauss, None, jnp.int32(1), full_arrays, gt, alpha,
                       full_intr, bg)

    for step_fn in (
            make_train_step(opts, CFG, strips=n, **kw),
            make_sharded_train_step(opts, CFG, make_mesh(n), strips=n,
                                    **kw)):
        g2, _, m2 = step_fn(gauss, None, jnp.int32(1), strip_arrays, gt,
                            alpha, strip_intr, bg)
        np.testing.assert_allclose(float(m1.loss), float(m2.loss),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(m1.psnr), float(m2.psnr),
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(g1.params.xyz),
                                   np.asarray(g2.params.xyz), atol=1e-5)
        np.testing.assert_allclose(np.asarray(g1.xyz_grad_accum),
                                   np.asarray(g2.xyz_grad_accum),
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(g1.max_radii2d),
                                   np.asarray(g2.max_radii2d), atol=1e-4)


def test_sharded_step_rejects_bad_batch(rng):
    mesh = make_mesh(8)
    try:
        make_sharded_train_step(OPTS, CFG, mesh, capacity=1024,
                                max_per_tile=128, chunk=16, batch_size=3)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
