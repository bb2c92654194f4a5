"""End-to-end trainer smoke test on a tiny synthetic Blender scene:
loss decreases, densify events run, eval + checkpoint round-trip."""

import json
import os

import numpy as np
from PIL import Image

from fourdgs_tpu.config import TrainConfig, load_config
from fourdgs_tpu.engine.trainer import Trainer


def _write_scene(root, n_frames=6, size=32):
    os.makedirs(root / "train", exist_ok=True)
    rng = np.random.default_rng(7)
    frames = []
    for i in range(n_frames):
        theta = 2 * np.pi * i / n_frames
        # camera on a circle looking at the origin
        pos = np.array([2.5 * np.sin(theta), 0.0, 2.5 * np.cos(theta)])
        fwd = -pos / np.linalg.norm(pos)
        right = np.cross(np.array([0, 1, 0]), fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        c2w = np.eye(4)
        # OpenGL convention: -z forward, +y up
        c2w[:3, 0] = right
        c2w[:3, 1] = up
        c2w[:3, 2] = -fwd
        c2w[:3, 3] = pos
        frames.append({"file_path": f"train/r_{i}",
                       "transform_matrix": c2w.tolist(),
                       "time": i / max(n_frames - 1, 1)})
        img = np.zeros((size, size, 4), np.uint8)
        # a moving bright square
        c = 8 + i * 2
        img[10:22, c - 6: c + 6, :3] = [255, 80, 40]
        img[..., 3] = 255
        Image.fromarray(img, "RGBA").save(root / "train" / f"r_{i}.png")
    for split in ("train", "test"):
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.9, "frames": frames}, f)


def _config(tmp_path) -> TrainConfig:
    cfg = load_config(overrides=dict(
        gaussian_dim=4, rot_4d=True, time_duration=[0.0, 1.0],
        num_pts=256, batch_size=2, exhaust_test=False))
    cfg.model.source_path = str(tmp_path)
    cfg.model.model_path = str(tmp_path / "out")
    cfg.model.resolution = 1
    cfg.model.eval = True
    cfg.pipeline.eval_shfs_4d = True
    cfg.optimization.densify_from_iter = 4
    cfg.optimization.densification_interval = 6
    cfg.optimization.opacity_reset_interval = 1000
    cfg.optimization.iterations = 24
    cfg.test_iterations = [24]
    cfg.save_iterations = [24]
    return cfg


def test_train_smoke(tmp_path):
    _write_scene(tmp_path)
    cfg = _config(tmp_path)
    tr = Trainer(cfg, verbose=False)

    losses = []
    tr.train(on_step=lambda it, m: losses.append(float(m.loss)))
    assert len(losses) == 24
    assert np.isfinite(losses).all()
    # training reduces the loss on this trivially-overfittable scene
    assert np.mean(losses[-6:]) < np.mean(losses[:6])

    # eval + best checkpoint happened
    assert tr.best_psnr > 0
    assert os.path.exists(os.path.join(cfg.model.model_path, "chkpnt24.pkl"))

    # checkpoint round-trip restores state exactly
    t2 = Trainer(cfg, scene=tr.scene, verbose=False)
    t2.load(os.path.join(cfg.model.model_path, "chkpnt24.pkl"))
    assert t2.step == 24
    np.testing.assert_allclose(np.asarray(t2.gauss.params.xyz),
                               np.asarray(tr.gauss.params.xyz))


def test_train_rigid_motion_losses(tmp_path):
    _write_scene(tmp_path, n_frames=4)
    cfg = _config(tmp_path)
    cfg.optimization.iterations = 4
    cfg.optimization.lambda_rigid = 1.0
    cfg.optimization.lambda_motion = 0.1
    cfg.optimization.densify_from_iter = 1000
    cfg.test_iterations = []
    cfg.save_iterations = []
    tr = Trainer(cfg, verbose=False)
    mets = []
    tr.train(on_step=lambda it, m: mets.append(m))
    assert all(np.isfinite(float(m.loss)) for m in mets)
    assert float(mets[-1].motion) >= 0


def test_train_lazy_dataloader_mode(tmp_path):
    """DyNeRF-style lazy image loading (dataloader=True): images fetched,
    composited and resized at batch time (reference CameraDataset)."""
    _write_scene(tmp_path, n_frames=4)
    cfg = _config(tmp_path)
    cfg.model.dataloader = True
    cfg.optimization.iterations = 4
    cfg.optimization.densify_from_iter = 1000
    cfg.test_iterations = [4]
    cfg.save_iterations = []
    tr = Trainer(cfg, verbose=False)
    assert tr.scene.train_cameras[0].image is None
    losses = []
    tr.train(on_step=lambda it, m: losses.append(float(m.loss)))
    assert len(losses) == 4 and np.isfinite(losses).all()
    assert tr.best_psnr > 0


def test_resume_is_bit_exact(tmp_path):
    """Checkpoint at iter k, continue to k+n; vs a fresh trainer resumed
    from the checkpoint trained the same n iters: identical parameters
    (deterministic data order via restored RNG state)."""
    _write_scene(tmp_path, n_frames=6)
    cfg = _config(tmp_path)
    cfg.optimization.iterations = 8
    cfg.optimization.densify_from_iter = 3
    cfg.optimization.densification_interval = 4
    cfg.test_iterations = []
    cfg.save_iterations = []
    tr = Trainer(cfg, verbose=False)
    tr.train(num_iterations=4)
    ck = str(tmp_path / "mid.pkl")
    tr.save(ck)
    tr.train(num_iterations=8)

    t2 = Trainer(cfg, scene=tr.scene, verbose=False)
    t2.load(ck)
    t2.train(num_iterations=8)
    np.testing.assert_allclose(np.asarray(t2.gauss.params.xyz),
                               np.asarray(tr.gauss.params.xyz), atol=0)
    np.testing.assert_allclose(np.asarray(t2.gauss.adam.mu.opacity),
                               np.asarray(tr.gauss.adam.mu.opacity), atol=0)


def test_trainer_uses_sharded_step_on_mesh(tmp_path):
    """With 8 CPU devices and batch_size 8, the trainer trains through the
    sharded data-parallel step."""
    import jax
    assert len(jax.devices()) >= 8
    _write_scene(tmp_path, n_frames=8)
    cfg = _config(tmp_path)
    cfg.batch_size = 8
    cfg.data_axis = 8
    cfg.optimization.iterations = 3
    cfg.optimization.densify_from_iter = 1000
    cfg.test_iterations = []
    cfg.save_iterations = []
    logs = []
    tr = Trainer(cfg, verbose=True)
    tr.log = lambda m: logs.append(m)
    losses = []
    tr.train(on_step=lambda it, m: losses.append(float(m.loss)))
    assert any("sharded train step over 8 devices" in m for m in logs)
    assert len(losses) == 3 and np.isfinite(losses).all()


def test_seed_determinism(tmp_path):
    """Same seed -> bit-identical loss trajectory and final parameters
    across two independent Trainer instances (reference safe_state
    seeding, train.py:347-352; here the whole step is jitted XLA, so
    determinism is exact, not just statistical)."""
    _write_scene(tmp_path)

    def run():
        cfg = _config(tmp_path)
        cfg.model.model_path = ""          # no artifacts
        cfg.test_iterations = []
        cfg.optimization.iterations = 12
        tr = Trainer(cfg, verbose=False)
        losses = []
        tr.train(on_step=lambda it, m: losses.append(float(m.loss)))
        return losses, np.asarray(tr.gauss.params.xyz)

    l1, x1 = run()
    l2, x2 = run()
    assert l1 == l2                        # bit-exact trajectory
    np.testing.assert_array_equal(x1, x2)


def test_eval_infer_fast_path(tmp_path):
    """render_cli --fast: the eval renderer's packed-row inference path
    must match the exact eval render within bf16 rounding."""
    _write_scene(tmp_path, n_frames=4)
    cfg = _config(tmp_path)
    tr = Trainer(cfg, verbose=False)
    tr.backend = "pallas_interpret"
    cam = tr.scene.train_cameras[0]
    color_e, depth_e, alpha_e = tr.render_view(cam)
    tr.eval_infer = True
    tr._eval_fn = None
    color_i, depth_i, alpha_i = tr.render_view(cam)
    np.testing.assert_allclose(np.asarray(color_i), np.asarray(color_e),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(alpha_i), np.asarray(alpha_e),
                               atol=2e-2)


def test_gt_device_cache_matches_host_path(tmp_path):
    """The device-resident GT cache must reproduce the host-loading
    path bit-exactly (same fetch_gt outputs, gathered on device)."""
    import jax.numpy as jnp
    from fourdgs_tpu.engine.trainer import fetch_gt
    _write_scene(tmp_path)
    cfg = _config(tmp_path)
    cfg.optimization.iterations = 3

    tr = Trainer(cfg, verbose=False)
    tr._maybe_build_gt_cache()
    assert tr._gt_cache is not None

    idx = [0, 2]
    _, gt_i, al_i, _ = tr._batch_arrays(idx)
    assert al_i is None                       # cache marker
    gt_c, al_c = tr._gt_fetch(*tr._gt_cache, jnp.asarray(gt_i))
    white = cfg.model.white_background
    for row, i in enumerate(idx):
        img_h, al_h = fetch_gt(tr.scene.train_cameras[i], white)
        np.testing.assert_array_equal(np.asarray(gt_c[row]), img_h)
        np.testing.assert_array_equal(np.asarray(al_c[row]), al_h)
