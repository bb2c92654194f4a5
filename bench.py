#!/usr/bin/env python
"""Headline benchmark: forward+backward rays/s on one chip.

Renders a synthetic-but-realistic 100k-gaussian 4D cloud at 800x800
(DNeRF full-res workload shape) and differentiates a photometric loss
through the full pipeline (temporal conditioning -> EWA -> tile sort ->
blend -> SSIM+L1), i.e. exactly the per-iteration work of training.

The reference repo publishes no quantitative numbers (BASELINE.md) — the
qualitative claim is "real-time rendering". vs_baseline is reported
against a 1.0e6 rays/s fwd+bwd proxy (a 30k-iteration DNeRF training run
finishing in ~90 min on the reference's single GPU at this resolution).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

BASELINE_RAYS_PER_S = 1.0e6


def build_inputs(p=100_000, h=800, w=800, seed=0, scale_mu=-4.2):
    import jax
    import jax.numpy as jnp

    from fourdgs_tpu.data.cameras import Camera

    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-1.5, 1.5, (p, 3)).astype(np.float32)
    xyz[:, 2] = rng.uniform(2.0, 8.0, p)
    quat = rng.normal(size=(p, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    quat_r = rng.normal(size=(p, 4)).astype(np.float32)
    quat_r /= np.linalg.norm(quat_r, axis=1, keepdims=True)
    scene = dict(
        means3d=jnp.asarray(xyz),
        t=jnp.asarray(rng.random(p), jnp.float32),
        scales=jnp.asarray(np.exp(rng.normal(scale_mu, 0.5, (p, 3))), jnp.float32),
        scales_t=jnp.asarray(np.exp(rng.normal(-1.0, 0.3, p)), jnp.float32),
        rotations=jnp.asarray(quat),
        rotations_r=jnp.asarray(quat_r),
        opacity=jnp.asarray(rng.uniform(0.3, 0.95, p), jnp.float32),
        sh=jnp.asarray(rng.normal(0, 0.2, (p, 48, 3)), jnp.float32),
        active=jnp.ones(p, bool),
    )
    cam = Camera(uid=0, rot=np.eye(3), trans=np.zeros(3), fovx=1.0, fovy=1.0,
                 width=w, height=h, timestamp=0.5)
    tgt = jnp.asarray(rng.random((h, w, 3)), jnp.float32)
    return scene, jax.tree.map(jnp.asarray, cam.arrays()), tgt


def main():
    from fourdgs_tpu.utils.runtime import respect_platform_env
    respect_platform_env()
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from fourdgs_tpu.ops.preprocess import RenderOptions
    from fourdgs_tpu.render import render
    from fourdgs_tpu.utils.losses import photometric_loss

    if "--dynerf" in sys.argv:
        # DyNeRF workload shape (flame_salmon-class:
        # /root/reference/configs/dynerf/flame_salmon.yaml:3 — 300k init
        # points, 1352x1014 frames at resolution 2): 3x the cloud and
        # 2.7x the pixels of the DNeRF point. Budgets follow the
        # trainer's probe policy at this shape.
        p, h, w = 300_000, 1014, 1352
        label = "300k 4D gaussians, 1352x1014"
        capacity = 2 ** 21
        time_duration = 10.0
        # Real DyNeRF clouds spread over a larger extent: keep the
        # median screen footprint realistic at this focal length.
        scale_mu = -4.9
    else:
        p, h, w = 100_000, 800, 800
        label = "100k 4D gaussians, 800x800"
        # 786k tile instances: the anisotropic opacity-aware rect keeps
        # this workload at ~581k live instances (it needed 1.5M with the
        # isotropic 3-sigma rect) — same headroom policy the trainer's
        # budget probe uses.
        capacity = 3 * 2 ** 18
        time_duration = 1.0
        scale_mu = -4.2
    opts = RenderOptions(height=h, width=w, gaussian_dim=4, rot_4d=True,
                         time_duration=time_duration)
    scene, cam, tgt = build_inputs(p=p, h=h, w=w, scale_mu=scale_mu)
    bg = jnp.zeros(3, jnp.float32)
    max_per_tile = 4096
    backend = "pallas" if jax.default_backend() != "cpu" else "xla"

    # Steady-state budgets, the trainer's own policy (probe once at a
    # generous capacity, then size instance capacity to measured x
    # instance_slack and the aligned dummy budget to measured pad x 1.3
    # — trainer.py:_maybe_grow / the adaptive dummy watch). Every
    # capacity-scaled stage (main sort, instance gather, grad buffers,
    # reduce sort) runs at the budget production converges to, not at
    # the first-guess worst case.
    from fourdgs_tpu.ops import binning as _binning
    from fourdgs_tpu.ops import preprocess as _pre
    from fourdgs_tpu.ops.pallas_blend import CHUNK as _K

    @jax.jit
    def _probe(s):
        proc = _pre.preprocess(
            **{k: s[k] for k in ("means3d", "t", "scales", "scales_t",
                                 "rotations", "rotations_r", "opacity",
                                 "sh", "active")},
            camera=cam, opts=opts)
        ab = _binning.bin_gaussians_aligned(
            jax.lax.stop_gradient(proc), opts, capacity, _K)
        return ab.num_rendered, ab.total_len, ab.dropped

    nr0, tl0, drop0 = (int(x) for x in _probe(scene))
    assert drop0 == 0, f"probe capacity too small ({nr0} instances)"
    capacity = min(capacity, -(-int(nr0 * 1.2) // 65536) * 65536)
    pad0 = tl0 - nr0
    dummy_cap = max(_K, -(-int(pad0 * 1.3) // _K) * _K)

    diff_keys = ("means3d", "t", "scales", "scales_t", "rotations",
                 "rotations_r", "opacity", "sh")

    def loss_fn(diff, aux):
        out = render(**diff, **aux, camera=cam, bg=bg, opts=opts,
                     capacity=capacity, max_per_tile=max_per_tile, chunk=32,
                     backend=backend, fast_grad_reduce=(backend == "pallas"),
                     dummy_cap=dummy_cap)
        loss, _, _ = photometric_loss(out.color, tgt,
                                      fast=(backend == "pallas"))
        return loss, (out.num_rendered, out.max_per_tile)

    diff = {k: scene[k] for k in diff_keys}
    aux = {k: scene[k] for k in scene if k not in diff_keys}

    # Timing methodology: ITERS iterations run inside ONE jitted
    # lax.scan, every iteration on perturbed inputs (a fresh timestamp /
    # nudged means), and every gradient leaf reduced into the carry so
    # nothing is dead code. This measures steady-state device time per
    # iteration — host dispatch here crosses a serializing TPU tunnel
    # (~10 ms/call, an environment artifact; production dispatch is
    # ~50 us and overlaps device work). min over REPS distinct calls.
    # The tunnel's result cache is PERSISTENT ACROSS PROCESSES and keyed
    # on (program, inputs): any timing call that repeats a historical
    # (identical HLO, identical inputs) pair is replayed in ~0 ms. Every
    # rep therefore carries a process-unique input salt.
    #
    # The reported number is the MEDIAN of REPS calls (one warm-up call
    # discarded), with the relative spread (max-min)/median recorded in
    # the JSON — min-of-3 was found to flatter by ~5% vs the
    # steady-state median the driver actually reproduces (VERDICT r4).
    ITERS, REPS = 16, 7
    salt = (time.time_ns() % 997) * 1e-7

    def timed_scan(step):
        @jax.jit
        def run(eps):
            def body(c, i):
                return c + step(i.astype(jnp.float32) * 1e-5 + eps), 0
            return jax.lax.scan(body, 0.0, jnp.arange(ITERS))[0]

        jax.block_until_ready(run(jnp.float32(salt)))   # compile + warm
        times = []
        vals = set()
        for r in range(REPS):
            t0 = time.perf_counter()
            v = float(jax.block_until_ready(
                run(jnp.float32((r + 1) * 1e-4 + salt))))
            times.append((time.perf_counter() - t0) / ITERS)
            vals.add(v)
        assert len(vals) == REPS, f"reps not distinct: {vals} (replay?)"
        med = float(np.median(times))
        assert med > 1e-4, f"implausible {med*1e3:.3f} ms/iter (replay?)"
        # The serializing TPU tunnel occasionally stalls a single rep by
        # SECONDS (observed 54x median); the median is robust to that,
        # but (max-min)/median is not. Spread is computed over the reps
        # within 3x the median; stalled reps are counted and reported
        # rather than silently folded into a meaningless 5000% figure.
        good = [t for t in times if t < 3 * med]
        spread = (max(good) - min(good)) / med
        return med, spread, REPS - len(good)

    if "--render" in sys.argv:
        # Forward-only mode: the reference's headline claim is real-time
        # RENDERING (README.md:1,14); this measures frames/s on one chip
        # through the inference fast path (packed bf16-pair instance
        # rows + 1-pass transmittance — ~0.4% opacity/color rounding,
        # oracle-tested vs the exact path in tests/test_pallas_blend.py).
        def fwd_step(eps):
            cam2 = cam._replace(timestamp=cam.timestamp + eps)
            out = render(**diff, **aux, camera=cam2, bg=bg, opts=opts,
                         capacity=capacity, max_per_tile=max_per_tile,
                         chunk=32, backend=backend,
                         infer=(backend == "pallas"))
            return (jnp.mean(out.color) + jnp.mean(out.depth)
                    + jnp.mean(out.alpha))

        med, spread, stalls = timed_scan(fwd_step)
        fps = 1.0 / med
        line = {
            "metric": f"render frames/s/chip ({label})",
            "value": round(fps, 2),
            "unit": "frames/s",
            "vs_baseline": round(fps * h * w / BASELINE_RAYS_PER_S, 3),
            "spread_pct": round(100 * spread, 1),
        }
        if stalls:
            line["stalled_reps"] = stalls
        print(json.dumps(line))
        return

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    # Sanity: no budget overflow at this workload shape.
    (loss, (nr, mpt)), grads = jax.jit(grad_fn)(diff, aux)
    jax.block_until_ready(grads)
    assert int(nr) <= capacity, f"instance overflow {int(nr)}"
    assert int(mpt) <= max_per_tile, f"tile overflow {int(mpt)}"

    def grad_step(eps):
        d2 = {**diff, "means3d": diff["means3d"] + eps}
        (loss, _), grads = grad_fn(d2, aux)
        return loss + sum(jnp.mean(g) for g in jax.tree.leaves(grads))

    med, spread, stalls = timed_scan(grad_step)
    rays_per_s = h * w / med
    line = {
        "metric": f"fwd+bwd rays/s/chip ({label})",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 3),
        "spread_pct": round(100 * spread, 1),
    }
    if stalls:
        line["stalled_reps"] = stalls
    print(json.dumps(line))


if __name__ == "__main__":
    main()
