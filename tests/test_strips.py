"""Strip-sharded single-frame rendering: strips joined == full frame, and
a sharded strip render over the CPU mesh matches too."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from fourdgs_tpu.ops.preprocess import RenderOptions
from fourdgs_tpu.parallel import make_mesh
from fourdgs_tpu.parallel.strips import (join_strips, strip_batch_arrays,
                                         strip_options)
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
