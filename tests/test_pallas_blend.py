"""Pallas tile kernels (interpreter mode on the CPU mesh) vs the XLA
blend path and the brute-force oracle: forward values and gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from fourdgs_tpu.ops.preprocess import RenderOptions
from fourdgs_tpu.ops.reference_renderer import render_reference
from fourdgs_tpu.render import render

from utils import look_at_camera, random_scene

OPTS = RenderOptions(height=48, width=40, gaussian_dim=4, rot_4d=True,
                     time_duration=1.0)
KW = dict(capacity=2048, max_per_tile=256, chunk=16)


def _as_jnp(scene):
    return {k: jnp.asarray(v) for k, v in scene.items()}


def test_pallas_forward_matches_xla(rng):
    scene = _as_jnp(random_scene(rng, p=56))
    cam = look_at_camera(width=OPTS.width, height=OPTS.height).arrays()
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)

    out_x = render(**scene, camera=cam, bg=bg, opts=OPTS, backend="xla", **KW)
    out_p = render(**scene, camera=cam, bg=bg, opts=OPTS,
                   backend="pallas_interpret", **KW)

    np.testing.assert_allclose(np.asarray(out_p.color),
                               np.asarray(out_x.color), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p.depth),
                               np.asarray(out_x.depth), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_p.alpha),
                               np.asarray(out_x.alpha), rtol=1e-4, atol=1e-5)


def test_pallas_gradients_match_oracle(rng):
    scene_np = random_scene(rng, p=40)
    cam = look_at_camera(width=OPTS.width, height=OPTS.height).arrays()
    bg = jnp.asarray([0.05, 0.1, 0.15], jnp.float32)
    tgt = jnp.asarray(rng.random((OPTS.height, OPTS.width, 3)), jnp.float32)
    wd = jnp.asarray(rng.random((OPTS.height, OPTS.width)), jnp.float32)

    diff_keys = ("means3d", "t", "scales", "scales_t", "rotations",
                 "rotations_r", "opacity", "sh")
    diff = {k: jnp.asarray(scene_np[k]) for k in diff_keys}
    aux = {"active": jnp.asarray(scene_np["active"])}

    def loss_pallas(d):
        out = render(**d, **aux, camera=cam, bg=bg, opts=OPTS,
                     backend="pallas_interpret", **KW)
        return (jnp.sum((out.color - tgt) ** 2)
                + jnp.sum(out.depth * wd) + 0.7 * jnp.sum(out.alpha * wd))

    def loss_ref(d):
        color, depth, _, alpha = render_reference(
            **d, **aux, camera=cam, bg=bg, opts=OPTS)
        return (jnp.sum((color - tgt) ** 2)
                + jnp.sum(depth * wd) + 0.7 * jnp.sum(alpha * wd))

    v1, g1 = jax.value_and_grad(loss_pallas)(diff)
    v2, g2 = jax.value_and_grad(loss_ref)(diff)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for k in diff_keys:
        a, b = np.asarray(g1[k]), np.asarray(g2[k])
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-4,
                                   err_msg=f"grad mismatch for {k}")


def test_multichunk_saturation(rng):
    """Tiles with MULTIPLE 128-lane chunks and mid-list saturation: 420
    overlapping gaussians concentrated on a few central tiles force
    nchunks >= 3 with opaque front gaussians, exercising the while-loop
    double-buffering, the saturation early-exit + prefetch drain, and the
    backward's ncon-bounded back-to-front walk — paths single-chunk test
    scenes (p <= 56) never reach in interpreter mode."""
    p = 420
    scene = random_scene(rng, p=p)
    # Cluster everything over the image center; front third near-opaque.
    scene["means3d"][:, 0] = rng.uniform(-0.25, 0.25, p)
    scene["means3d"][:, 1] = rng.uniform(-0.25, 0.25, p)
    scene["means3d"][:, 2] = rng.uniform(2.0, 6.0, p)
    scene["opacity"][:] = rng.uniform(0.3, 0.95, p)
    front = scene["means3d"][:, 2] < 3.0
    scene["opacity"][front] = 0.99
    scene = _as_jnp(scene)
    cam = look_at_camera(width=OPTS.width, height=OPTS.height).arrays()
    bg = jnp.asarray([0.2, 0.4, 0.6], jnp.float32)
    kw = dict(capacity=16384, max_per_tile=1024, chunk=32)

    out_x = render(**scene, camera=cam, bg=bg, opts=OPTS, backend="xla",
                   **kw)
    out_p = render(**scene, camera=cam, bg=bg, opts=OPTS,
                   backend="pallas_interpret", **kw)
    # Sanity: the center tile really is multi-chunk deep and saturated.
    assert int(out_x.max_per_tile) > 2 * 128
    assert float(np.asarray(out_x.alpha)[20:28, 16:24].min()) > 0.999
    np.testing.assert_allclose(np.asarray(out_p.color),
                               np.asarray(out_x.color), rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_p.alpha),
                               np.asarray(out_x.alpha), rtol=2e-4,
                               atol=2e-5)

    diff = {k: scene[k] for k in ("means3d", "opacity", "sh", "scales")}
    aux = {k: scene[k] for k in scene if k not in diff}

    def loss(d, backend):
        out = render(**d, **aux, camera=cam, bg=bg, opts=OPTS,
                     backend=backend, **kw)
        return jnp.sum(out.color ** 2) + 0.3 * jnp.sum(out.depth)

    g_p = jax.grad(lambda d: loss(d, "pallas_interpret"))(diff)
    g_x = jax.grad(lambda d: loss(d, "xla"))(diff)
    for k in diff:
        a, b = np.asarray(g_p[k]), np.asarray(g_x[k])
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a / scale, b / scale, atol=3e-4,
                                   err_msg=f"multichunk grad {k}")


def test_empty_tiles_interleaved(rng):
    """Tiles with ZERO instances at the start, middle, and end of the
    grid — the edge cases of the kernels' cross-tile chunk-0 prefetch
    (a previous program prefetches only when the next tile is nonempty;
    empty tiles must neither wait nor poison the pipeline)."""
    scene = random_scene(rng, p=48)
    # Concentrate everything in the lower-right corner so the leading
    # tiles (incl. tile 0) and most interior tiles are empty.
    scene["means3d"][:, 0] = rng.uniform(0.9, 1.6, 48)
    scene["means3d"][:, 1] = rng.uniform(0.9, 1.6, 48)
    scene["means3d"][:, 2] = rng.uniform(2.0, 3.0, 48)
    scene["scales"] = (scene["scales"] * 0.2).astype(np.float32)
    scene = _as_jnp(scene)
    cam = look_at_camera(width=OPTS.width, height=OPTS.height).arrays()
    bg = jnp.asarray([0.3, 0.1, 0.2], jnp.float32)

    out_x = render(**scene, camera=cam, bg=bg, opts=OPTS, backend="xla",
                   **KW)
    out_p = render(**scene, camera=cam, bg=bg, opts=OPTS,
                   backend="pallas_interpret", **KW)
    # Sanity: the corner concentration actually leaves empty tiles AND
    # renders something.
    alpha = np.asarray(out_x.alpha)
    assert alpha[:16, :16].max() == 0.0          # tile 0 empty
    assert alpha.max() > 0.05
    np.testing.assert_allclose(np.asarray(out_p.color),
                               np.asarray(out_x.color), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p.alpha),
                               np.asarray(out_x.alpha), rtol=1e-4,
                               atol=1e-5)

    # Gradients through the same geometry (backward kernel's prefetch
    # walks back-to-front; empty and saturated tiles interleave).
    diff = {k: scene[k] for k in ("means3d", "opacity", "sh")}
    aux = {k: scene[k] for k in scene if k not in diff}

    def loss(d, backend):
        out = render(**d, **aux, camera=cam, bg=bg, opts=OPTS,
                     backend=backend, **KW)
        return jnp.sum(out.color ** 2) + jnp.sum(out.alpha)

    g_p = jax.grad(lambda d: loss(d, "pallas_interpret"))(diff)
    g_x = jax.grad(lambda d: loss(d, "xla"))(diff)
    for k in diff:
        a, b = np.asarray(g_p[k]), np.asarray(g_x[k])
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-4,
                                   err_msg=f"empty-tile grad {k}")


def test_fast_grad_reduce_close_to_exact(rng):
    """The production fast path (bf16 kernel gradient rows + packed bf16
    sort payloads) must track the exact f32 path within bf16 rounding —
    the bench/trainer run fast=True while parity tests run fast=False, so
    this is the only CPU check that the fast route is wired correctly."""
    scene_np = random_scene(rng, p=48)
    cam = look_at_camera(width=OPTS.width, height=OPTS.height).arrays()
    bg = jnp.asarray([0.05, 0.1, 0.15], jnp.float32)
    tgt = jnp.asarray(rng.random((OPTS.height, OPTS.width, 3)), jnp.float32)

    diff_keys = ("means3d", "t", "scales", "scales_t", "rotations",
                 "rotations_r", "opacity", "sh")
    diff = {k: jnp.asarray(scene_np[k]) for k in diff_keys}
    aux = {"active": jnp.asarray(scene_np["active"])}

    def loss(d, fast):
        out = render(**d, **aux, camera=cam, bg=bg, opts=OPTS,
                     backend="pallas_interpret", fast_grad_reduce=fast,
                     **KW)
        return jnp.sum((out.color - tgt) ** 2) + jnp.sum(out.alpha)

    v_f, g_f = jax.value_and_grad(loss)(diff, True)
    v_e, g_e = jax.value_and_grad(loss)(diff, False)
    np.testing.assert_allclose(float(v_f), float(v_e), rtol=1e-6)
    for k in diff_keys:
        a, b = np.asarray(g_f[k]), np.asarray(g_e[k])
        scale = max(np.abs(b).max(), 1e-3)
        d = np.abs(a - b) / scale
        # bf16 has ~2^-8 relative rounding per instance; per-gaussian sums
        # mostly average it out, but near-cancelling sums keep a few
        # percent-level outliers (same profile as scripts/tpu_verify.py's
        # full-scale fast-vs-exact check) — bound the bulk tightly and the
        # worst case loosely.
        assert d.mean() < 2e-3, f"fast-path bulk error for {k}: {d.mean()}"
        assert d.max() < 5e-2, f"fast-path outlier for {k}: {d.max()}"


def test_unroll2_matches_unroll1(rng):
    """unroll=2 (two-chunk loop steps: blockwise prefix/suffix cumsum
    carry chains + the backward one-chunk prologue for odd effective
    chunk counts) must reproduce the unroll=1 kernels on a scene deep
    enough that tiles span several 128-instance chunks of both parities."""
    from fourdgs_tpu.ops import binning, pallas_blend
    from fourdgs_tpu.ops import preprocess as pre

    scene = _as_jnp(random_scene(rng, p=360, seed_scale=0.55))
    cam = look_at_camera(width=OPTS.width, height=OPTS.height).arrays()
    proc = pre.preprocess(**scene, camera=cam, opts=OPTS)
    abins = binning.bin_gaussians_aligned(proc, OPTS, 16384,
                                          pallas_blend.CHUNK)
    feat = jnp.concatenate([proc.rgb, proc.depth[:, None], proc.flow],
                           axis=-1)
    inst = pallas_blend._build_inst_data(proc.xy, proc.conic, proc.opacity,
                                         feat, abins)

    def cfg(u):
        return pallas_blend.PallasBlendConfig(
            height=OPTS.height, width=OPTS.width, tiles_x=OPTS.tiles_x,
            tiles_y=OPTS.tiles_y, interpret=True, unroll=u)

    acc1, tf1, ncon1, raw1 = pallas_blend.blend_forward_pallas(
        cfg(1), inst, abins.tile_start, abins.tile_count)
    acc2, tf2, ncon2, raw2 = pallas_blend.blend_forward_pallas(
        cfg(2), inst, abins.tile_start, abins.tile_count)

    # The scene must actually exercise the multi-step walk AND the odd
    # prologue: effective chunk counts (the backward's saturation-aware
    # bound) need both parities and at least one >= 2.
    k = pallas_blend.CHUNK
    nchunks = np.ceil(np.asarray(abins.tile_count) / k).astype(int)
    eff = np.minimum(
        np.ceil(np.asarray(ncon1).max(axis=1) / k).astype(int), nchunks)
    assert (eff >= 2).any(), f"scene too shallow: eff={eff}"
    assert (eff % 2 == 1).any() and (eff % 2 == 0).any(), f"eff={eff}"

    np.testing.assert_allclose(np.asarray(acc2), np.asarray(acc1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tf2), np.asarray(tf1),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(ncon2), np.asarray(ncon1))

    rng2 = np.random.default_rng(7)
    dcot = jnp.asarray(
        rng2.normal(0.0, 1.0, (OPTS.num_tiles, 8, 256)).astype(np.float32))
    eg1 = pallas_blend.blend_backward_pallas(
        cfg(1), inst, abins.tile_start, abins.tile_count, raw1, dcot)
    eg2 = pallas_blend.blend_backward_pallas(
        cfg(2), inst, abins.tile_start, abins.tile_count, raw2, dcot)
    a, b = np.asarray(eg2), np.asarray(eg1)
    scale = np.maximum(np.abs(b).max(axis=1, keepdims=True), 1e-3)
    np.testing.assert_allclose(a / scale, b / scale, atol=3e-5)


def test_infer_path_matches_exact(rng):
    """The packed-row inference fast path must match the exact forward
    within bf16 rounding of opacity/rgb/depth (~0.5%); flow is zeros."""
    scene = _as_jnp(random_scene(rng, p=56))
    cam = look_at_camera(width=OPTS.width, height=OPTS.height).arrays()
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)

    out_e = render(**scene, camera=cam, bg=bg, opts=OPTS,
                   backend="pallas_interpret", **KW)
    out_i = render(**scene, camera=cam, bg=bg, opts=OPTS,
                   backend="pallas_interpret", infer=True, **KW)

    np.testing.assert_allclose(np.asarray(out_i.color),
                               np.asarray(out_e.color), atol=1.5e-2)
    np.testing.assert_allclose(np.asarray(out_i.alpha),
                               np.asarray(out_e.alpha), atol=1.5e-2)
    # Depth is bf16 in the packed rows: relative tolerance vs magnitude.
    d_e = np.asarray(out_e.depth)
    np.testing.assert_allclose(np.asarray(out_i.depth), d_e,
                               atol=1.5e-2 * max(1.0, np.abs(d_e).max()))
    assert np.all(np.asarray(out_i.flow) == 0.0)
    assert int(out_i.num_rendered) == int(out_e.num_rendered)
