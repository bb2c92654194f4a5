#!/usr/bin/env python
"""Render a trained checkpoint's test/train views to PNG + metrics JSON.

    python render_cli.py --config configs/dnerf/lego.yaml \
        --checkpoint output/dnerf/lego/chkpnt_best.pkl [--split test]

Plays the role of the reference eval pipeline (training_report renders,
`train.py:302-342`) as a standalone tool, adding the depth colormap dump
(`utils/image_utils.py:21`-style grayscale ramp).
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", default=None,
                    help="checkpoint path (.pkl, or a reference .pth)")
    ap.add_argument("--load_iteration", type=int, default=None,
                    help="resolve chkpnt<N>.pkl from the config's "
                         "model_path; -1 = latest (reference Scene "
                         "load_iteration, scene/__init__.py:40-47)")
    ap.add_argument("--split", default="test", choices=["test", "train"])
    ap.add_argument("--out", default=None)
    ap.add_argument("--max_views", type=int, default=0)
    ap.add_argument("--viewer", action="store_true",
                    help="serve the checkpoint to a SIBR-protocol live "
                         "viewer instead of writing files")
    ap.add_argument("--viewer_port", type=int, default=6009)
    ap.add_argument("--viewer_time", type=float, default=0.0,
                    help="timestamp rendered in viewer mode")
    ap.add_argument("--fast", action="store_true",
                    help="packed-row inference fast path (bf16 "
                         "opacity/color rounding ~0.4%%; no flow)")
    ap.add_argument("--export_pth", default=None,
                    help="write a reference-format torch checkpoint "
                         "(loads in the upstream repo)")
    ap.add_argument("--export_ply", default=None,
                    help="also export the gaussian cloud as PLY")
    ap.add_argument("--video_frames", type=int, default=0,
                    help="render a time sweep (N frames over the scene's "
                         "time_duration) from the first camera")
    args = ap.parse_args(argv)

    from fourdgs_tpu.utils.runtime import respect_platform_env
    respect_platform_env()
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    import numpy as np
    from PIL import Image

    from fourdgs_tpu.config import load_config
    from fourdgs_tpu.engine.trainer import Trainer, fetch_gt
    from fourdgs_tpu.utils import losses as loss_lib
    import jax.numpy as jnp

    cfg = load_config(args.config)
    if args.checkpoint is None:
        if args.load_iteration is None or not cfg.model.model_path:
            print("error: --checkpoint or --load_iteration (with a "
                  "model_path in the config) required",
                  file=__import__("sys").stderr)
            return 2
        from fourdgs_tpu.utils.image import search_for_max_iteration
        it = (search_for_max_iteration(cfg.model.model_path, "chkpnt")
              if args.load_iteration < 0 else args.load_iteration)
        args.checkpoint = os.path.join(cfg.model.model_path,
                                       f"chkpnt{it}.pkl")
        print(f"loading iteration {it}: {args.checkpoint}")
    if not os.path.exists(args.checkpoint):
        print(f"error: checkpoint not found: {args.checkpoint}",
              file=__import__("sys").stderr)
        return 2
    trainer = Trainer(cfg)
    trainer.eval_infer = bool(args.fast)
    trainer.load(args.checkpoint)

    if args.viewer:
        return serve_viewer(trainer, args)

    out_dir = args.out or os.path.join(
        cfg.model.model_path or ".", f"renders_{args.split}")
    os.makedirs(out_dir, exist_ok=True)

    cams = (trainer.scene.test_cameras if args.split == "test"
            else trainer.scene.train_cameras)
    if args.max_views:
        cams = cams[: args.max_views]

    metrics = []
    for i, cam in enumerate(cams):
        # render_view grows budgets + re-renders on overflow: densified
        # checkpoints never silently truncate.
        color, depth, alpha = trainer.render_view(cam)
        gt, _ = fetch_gt(cam, cfg.model.white_background)
        psnr = float(loss_lib.psnr(color, jnp.asarray(gt)))
        ssim = float(loss_lib.ssim(color, jnp.asarray(gt)))
        msssim = float(loss_lib.msssim(color[None], jnp.asarray(gt)[None]))
        metrics.append({"view": cam.image_name or str(i), "psnr": psnr,
                        "ssim": ssim, "msssim": msssim,
                        "timestamp": cam.timestamp})
        rgb8 = (np.clip(np.asarray(color), 0, 1) * 255).astype(np.uint8)
        Image.fromarray(rgb8).save(os.path.join(out_dir, f"{i:05d}.png"))
        d = np.asarray(depth)
        dmax = max(float(d.max()), 1e-6)
        Image.fromarray((np.clip(d / dmax, 0, 1) * 255).astype(np.uint8)
                        ).save(os.path.join(out_dir, f"{i:05d}_depth.png"))
        print(f"[{i + 1}/{len(cams)}] psnr {psnr:.2f}", flush=True)

    summary = {
        "psnr": float(np.mean([m["psnr"] for m in metrics])) if metrics else 0,
        "ssim": float(np.mean([m["ssim"] for m in metrics])) if metrics else 0,
        "msssim": float(np.mean([m["msssim"] for m in metrics])) if metrics else 0,
        "views": metrics,
    }
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "views"}))

    if args.video_frames > 0:
        import dataclasses
        vdir = os.path.join(out_dir, "time_sweep")
        os.makedirs(vdir, exist_ok=True)
        base = cams[0] if cams else trainer.scene.train_cameras[0]
        t0, t1 = trainer.time_duration
        for k in range(args.video_frames):
            ts = t0 + (t1 - t0) * k / max(args.video_frames - 1, 1)
            cam_k = dataclasses.replace(base, timestamp=ts)
            color, *_ = trainer.render_view(cam_k)
            rgb8 = (np.clip(np.asarray(color), 0, 1) * 255).astype(np.uint8)
            Image.fromarray(rgb8).save(
                os.path.join(vdir, f"t_{k:04d}.png"))
        print(f"time sweep: {args.video_frames} frames -> {vdir}")

    if args.export_ply:
        from fourdgs_tpu.models.ply_io import export_gaussians_ply
        export_gaussians_ply(args.export_ply, trainer.gauss,
                             gaussian_dim=cfg.gaussian_dim,
                             rot_4d=cfg.rot_4d)
        print(f"exported cloud -> {args.export_ply}")
    if args.export_pth:
        from fourdgs_tpu.models.torch_import import export_reference_pth
        env_tex = (np.asarray(trainer.env.texture)
                   if trainer.env is not None else None)
        export_reference_pth(
            args.export_pth, trainer.gauss, iteration=int(trainer.step),
            rot_4d=cfg.rot_4d,
            spatial_lr_scale=float(trainer.spatial_lr_scale),
            env_map=env_tex)
        print(f"exported reference checkpoint -> {args.export_pth}")
    return 0


def serve_viewer(trainer, args):
    """Serve the loaded checkpoint to a SIBR-protocol viewer: renders at
    the trainer's compiled resolution, resizes to the client's request
    (avoids a recompile per window size)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from fourdgs_tpu.data.cameras import camera_from_matrices
    from fourdgs_tpu.viewer import ViewerServer

    w, h = trainer.opts.width, trainer.opts.height
    server = ViewerServer(port=args.viewer_port)
    print(f"viewer: SIBR protocol on 127.0.0.1:{args.viewer_port} "
          f"(rendering {w}x{h} @ t={args.viewer_time}); ctrl-C to stop")

    def render_fn(req):
        arrays = jax.tree.map(jnp.asarray, camera_from_matrices(
            w, h, req.fovx, req.fovy, req.viewmatrix, req.full_proj,
            timestamp=args.viewer_time))
        focal = np.asarray(arrays.focal)
        intr = jnp.asarray(
            np.array([focal[0], focal[1], w / 2, h / 2], np.float32))
        color, _, _ = trainer.render_arrays(arrays, intr)
        img = np.asarray(color)
        if (req.width, req.height) != (w, h):
            img = np.asarray(Image.fromarray(
                (np.clip(img, 0, 1) * 255).astype(np.uint8)).resize(
                    (req.width, req.height))) / 255.0
        return img

    try:
        while True:
            served = server.poll(render_fn)
            del served
            if server.conn is None:
                time.sleep(0.05)
    except KeyboardInterrupt:
        print("viewer: stopped")
    finally:
        server.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
