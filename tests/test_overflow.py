"""Instance-capacity overflow in the aligned (Pallas) binning path:
whole-gaussian truncation — the render must equal rendering only the
gaussians whose full instance runs fit in the budget, and num_rendered
must still report the true demand for the host growth signal."""

import jax
import jax.numpy as jnp
import numpy as np

from fourdgs_tpu.ops import binning
from fourdgs_tpu.ops.preprocess import RenderOptions, preprocess
from fourdgs_tpu.render import render

from utils import look_at_camera, random_scene

OPTS = RenderOptions(height=48, width=40, gaussian_dim=4, rot_4d=True,
                     time_duration=1.0)


def test_pallas_overflow_is_whole_gaussian_truncation(rng):
    scene = {k: jnp.asarray(v) for k, v in random_scene(rng, p=48).items()}
    cam = look_at_camera(width=OPTS.width, height=OPTS.height).arrays()
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)

    # True demand.
    proc = preprocess(**scene, camera=cam, opts=OPTS)
    offsets = np.cumsum(np.asarray(proc.tiles_touched))
    total = int(offsets[-1])
    assert total > 64

    cap = 64
    # Gaussians fully inside the budget (inclusive offsets <= cap).
    n_fit = int(np.searchsorted(offsets, cap, side="right"))
    active_trunc = np.zeros(48, bool)
    active_trunc[:n_fit] = True
    # only gaussians with instances count... preserve original active flags
    active_trunc &= np.asarray(scene["active"])

    out_overflow = render(**scene, camera=cam, bg=bg, opts=OPTS,
                          capacity=cap, backend="pallas_interpret")
    assert int(out_overflow.num_rendered) == total  # host growth signal

    scene_trunc = dict(scene)
    scene_trunc["active"] = jnp.asarray(active_trunc)
    out_ref = render(**scene_trunc, camera=cam, bg=bg, opts=OPTS,
                     capacity=4096, backend="pallas_interpret")

    np.testing.assert_allclose(np.asarray(out_overflow.color),
                               np.asarray(out_ref.color),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_overflow.alpha),
                               np.asarray(out_ref.alpha),
                               rtol=1e-4, atol=1e-5)


def test_aligned_bins_counts_match_truncation(rng):
    scene = {k: jnp.asarray(v) for k, v in random_scene(rng, p=48).items()}
    cam = look_at_camera(width=OPTS.width, height=OPTS.height).arrays()
    proc = preprocess(**scene, camera=cam, opts=OPTS)
    cap = 64
    abins = binning.bin_gaussians_aligned(proc, OPTS, cap, 16)
    # Every tile's claimed count must be consistent with the (truncated)
    # gaussians present: total counted <= cap.
    assert int(jnp.sum(abins.tile_count)) <= cap
    # And ids in each tile's live range are valid gaussians.
    gid = np.asarray(abins.gauss_id)
    starts = np.asarray(abins.tile_start)
    counts = np.asarray(abins.tile_count)
    for t in range(OPTS.num_tiles):
        live = gid[starts[t]: starts[t] + counts[t]]
        assert (live < 48).all()
