"""Strip-sharded single-frame rendering: strips joined == full frame, and
a sharded strip render over the CPU mesh matches too."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from fourdgs_tpu.ops.preprocess import RenderOptions
from fourdgs_tpu.parallel import make_mesh
from fourdgs_tpu.parallel.strips import (join_strips, strip_batch_arrays,
                                         strip_cameras, strip_options)
from fourdgs_tpu.render import render

from utils import look_at_camera, random_scene

OPTS = RenderOptions(height=64, width=48, gaussian_dim=4, rot_4d=True,
                     time_duration=1.0)
N_STRIPS = 4


def _render_kwargs():
    return dict(capacity=4096, max_per_tile=256, chunk=16)


def test_strips_match_full_frame(rng):
    scene = {k: jnp.asarray(v) for k, v in random_scene(rng, p=48).items()}
    cam = look_at_camera(width=OPTS.width, height=OPTS.height)
    bg = jnp.asarray([0.2, 0.1, 0.3], jnp.float32)

    full = render(**scene, camera=jax.tree.map(jnp.asarray, cam.arrays()),
                  bg=bg, opts=OPTS, **_render_kwargs())

    sopts = strip_options(OPTS, N_STRIPS)
    arrays = jax.tree.map(jnp.asarray, strip_batch_arrays(cam, N_STRIPS))

    def one(c):
        out = render(**scene, camera=c, bg=bg, opts=sopts, **_render_kwargs())
        return out.color, out.alpha

    colors, alphas = jax.vmap(one)(arrays)
    np.testing.assert_allclose(np.asarray(join_strips(colors)),
                               np.asarray(full.color), atol=2e-5)
    np.testing.assert_allclose(np.asarray(join_strips(alphas)),
                               np.asarray(full.alpha), atol=2e-5)


def test_strips_sharded_gradients(rng):
    """Strip-sharded loss over the device mesh == single-device loss+grads."""
    scene_np = random_scene(rng, p=32)
    scene = {k: jnp.asarray(v) for k, v in scene_np.items()}
    cam = look_at_camera(width=OPTS.width, height=OPTS.height)
    bg = jnp.zeros(3, jnp.float32)
    tgt = jnp.asarray(rng.random((OPTS.height, OPTS.width, 3)), jnp.float32)

    sopts = strip_options(OPTS, 8)
    arrays = jax.tree.map(jnp.asarray, strip_batch_arrays(cam, 8))
    tgt_strips = tgt.reshape(8, OPTS.height // 8, OPTS.width, 3)

    def strip_loss(means3d, cams, tgts):
        def one(c, t):
            out = render(**{**scene, "means3d": means3d}, camera=c, bg=bg,
                         opts=sopts, **_render_kwargs())
            return jnp.sum((out.color - t) ** 2)
        return jnp.sum(jax.vmap(one)(cams, tgts))

    def full_loss(means3d):
        out = render(**{**scene, "means3d": means3d},
                     camera=jax.tree.map(jnp.asarray, cam.arrays()),
                     bg=bg, opts=OPTS, **_render_kwargs())
        return jnp.sum((out.color - tgt) ** 2)

    mesh = make_mesh(8)
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    cam_shard = type(arrays)(*([shard] * len(arrays)))
    sharded = jax.jit(
        jax.value_and_grad(strip_loss),
        in_shardings=(rep, cam_shard, shard),
        out_shardings=(rep, rep))

    v1, g1 = sharded(scene["means3d"], arrays, tgt_strips)
    v2, g2 = jax.value_and_grad(full_loss)(scene["means3d"])
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-4)


def test_trainer_eval_strips_matches_full_frame(rng, tmp_path):
    """Trainer.evaluate/render_view must shard eval frames over strips
    when cfg.strips > 1 and reassemble to the SAME image the full-frame
    eval path produces (VERDICT r4 item 7)."""
    import os
    from fourdgs_tpu.config import load_config
    from fourdgs_tpu.engine.trainer import Trainer

    fixture = os.path.join(os.path.dirname(__file__), "fixtures",
                           "synth_gate")
    cfg = load_config(None)
    cfg.model.source_path = fixture
    cfg.model.white_background = True
    cfg.model.eval = True
    cfg.gaussian_dim = 4
    cfg.rot_4d = True
    cfg.time_duration = (0.0, 1.0)
    cfg.num_pts = 300
    cfg.batch_size = 1
    cfg.seed = 0
    cfg.test_iterations = []
    cfg.save_iterations = []
    cfg.optimization.iterations = 2

    tr = Trainer(cfg, verbose=False)
    cam = tr.scene.test_cameras[0]
    color_full, depth_full, alpha_full = tr.render_view(cam)

    tr.cfg.strips = 4
    assert cam.height % 4 == 0
    color_s, depth_s, alpha_s = tr.render_view(cam)
    assert color_s.shape == color_full.shape

    # The eval strips must equal the CANONICAL strips render — the same
    # strip_cameras construction the sharded train step blends and
    # differentiates (engine/step.py) — exactly.
    from fourdgs_tpu.engine.trainer import camera_intrinsics
    from fourdgs_tpu.models.gaussians import activate
    from fourdgs_tpu.render import render as render_fn

    sopts = strip_options(tr.opts, 4)
    act = activate(tr.gauss.params, tr.gauss.n_active)
    strips_ref = []
    for s in strip_cameras(cam, 4):
        out = render_fn(
            means3d=act.means3d, t=act.t, scales=act.scales,
            scales_t=act.scales_t, rotations=act.rotations,
            rotations_r=act.rotations_r, opacity=act.opacity, sh=act.sh,
            active=act.active,
            camera=jax.tree.map(jnp.asarray, s.arrays()), bg=tr.bg,
            opts=sopts, capacity=tr.inst_capacity,
            max_per_tile=tr.tile_capacity, backend=tr.backend)
        strips_ref.append(np.clip(np.asarray(out.color), 0.0, 1.0))
    np.testing.assert_allclose(np.asarray(color_s),
                               np.concatenate(strips_ref, axis=0),
                               atol=3e-5)

    # Against the full-frame eval, agreement is looser: strip cameras
    # carry the full frame's fovy into preprocess's guard-band clamping
    # (reference forward.cu limy), so rect clamping of off-strip
    # gaussians can differ by a tile — same behavior as the strips
    # TRAIN path, bounded small.
    np.testing.assert_allclose(np.asarray(color_s),
                               np.asarray(color_full), atol=5e-3)
    np.testing.assert_allclose(np.asarray(alpha_s),
                               np.asarray(alpha_full), atol=5e-3)
