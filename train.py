#!/usr/bin/env python
"""Training CLI, mirroring the reference entry point
(`/root/reference/train.py:354-404`):

    python train.py --config configs/dnerf/lego.yaml [overrides]

Precedence: dataclass defaults < CLI flags < YAML (YAML applied last,
same as the reference's OmegaConf merge at train.py:381-390; use
--override KEY=VALUE for post-YAML tweaks).
"""

from __future__ import annotations

import argparse
import os
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="TPU-native 4D gaussian splatting")
    p.add_argument("--config", type=str, default=None, help="YAML config")
    p.add_argument("--source_path", "-s", type=str, default=None)
    p.add_argument("--model_path", "-m", type=str, default=None)
    p.add_argument("--resolution", "-r", type=int, default=None)
    p.add_argument("--iterations", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--test_iterations", nargs="+", type=int, default=None)
    p.add_argument("--save_iterations", nargs="+", type=int, default=None)
    p.add_argument("--start_checkpoint", type=str, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--eval", action="store_true", default=None)
    # Reference top-level flags (/root/reference/train.py:361-376); YAML
    # still wins when the config sets the same key (reference precedence).
    p.add_argument("--gaussian_dim", type=int, default=None)
    p.add_argument("--time_duration", nargs=2, type=float, default=None)
    p.add_argument("--num_pts", type=int, default=None)
    p.add_argument("--num_pts_ratio", type=float, default=None)
    p.add_argument("--rot_4d", action="store_true", default=None)
    p.add_argument("--force_sh_3d", action="store_true", default=None)
    p.add_argument("--exhaust_test", action="store_true", default=None)
    p.add_argument("--checkpoint_iterations", nargs="+", type=int,
                   default=None)
    p.add_argument("--debug_from", type=int, default=None,
                   help="iteration from which pipeline.debug engages")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--detect_anomaly", action="store_true",
                   help="jax_debug_nans (reference --detect_anomaly)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler trace of iterations 10-20")
    p.add_argument("--override", nargs="*", default=[],
                   help="dotted KEY=VALUE post-YAML overrides, e.g. "
                        "optimization.lambda_rigid=0.5")
    return p.parse_args(argv)


def build_config(args):
    from fourdgs_tpu.config import apply_yaml, load_config

    # Reference precedence (`/root/reference/train.py:381-390`): argparse
    # defaults < CLI flags < YAML (the YAML is merged LAST). --override
    # stays after everything for explicit post-YAML tweaks.
    cfg = load_config(None)
    if args.source_path is not None:
        cfg.model.source_path = args.source_path
    if args.model_path is not None:
        cfg.model.model_path = args.model_path
    if args.resolution is not None:
        cfg.model.resolution = args.resolution
    if args.iterations is not None:
        cfg.optimization.iterations = args.iterations
    if args.batch_size is not None:
        cfg.batch_size = args.batch_size
    if args.test_iterations is not None:
        cfg.test_iterations = args.test_iterations
    if args.save_iterations is not None:
        cfg.save_iterations = args.save_iterations
    if args.start_checkpoint is not None:
        cfg.start_checkpoint = args.start_checkpoint
    if args.seed is not None:
        cfg.seed = args.seed
    if args.eval:
        cfg.model.eval = True
    if args.gaussian_dim is not None:
        cfg.gaussian_dim = args.gaussian_dim
    if args.time_duration is not None:
        cfg.time_duration = tuple(args.time_duration)
    if args.num_pts is not None:
        cfg.num_pts = args.num_pts
    if args.num_pts_ratio is not None:
        cfg.num_pts_ratio = args.num_pts_ratio
    if args.rot_4d:
        cfg.rot_4d = True
    if args.force_sh_3d:
        cfg.force_sh_3d = True
    if args.exhaust_test:
        cfg.exhaust_test = True
    if args.checkpoint_iterations is not None:
        cfg.checkpoint_iterations = args.checkpoint_iterations
    if args.debug_from is not None:
        cfg.debug_from = args.debug_from
    if args.config:
        apply_yaml(cfg, args.config)
    for kv in args.override:
        key, _, value = kv.partition("=")
        obj = cfg
        parts = key.split(".")
        for part in parts[:-1]:
            obj = getattr(obj, part)
        cur = getattr(obj, parts[-1])
        import yaml as _yaml
        setattr(obj, parts[-1], type(cur)(_yaml.safe_load(value))
                if cur is not None else _yaml.safe_load(value))
    return cfg


def main(argv=None):
    args = parse_args(argv)
    cfg = build_config(args)
    if not cfg.model.source_path:
        print("error: --config or --source_path required", file=sys.stderr)
        return 2
    if cfg.start_checkpoint and not os.path.exists(cfg.start_checkpoint):
        print(f"error: checkpoint not found: {cfg.start_checkpoint}",
              file=sys.stderr)
        return 2

    from fourdgs_tpu.utils.runtime import respect_platform_env
    respect_platform_env()
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    if args.detect_anomaly:
        jax.config.update("jax_debug_nans", True)

    from fourdgs_tpu.engine.trainer import Trainer

    trainer = Trainer(cfg, verbose=not args.quiet)
    if args.profile_dir:
        def on_step(it, metrics):
            if it == 10:
                trainer.start_trace(args.profile_dir)
            elif it == 20:
                trainer.stop_trace()
        trainer.train(on_step=on_step)
    else:
        trainer.train()
    if trainer.scene.test_cameras:
        trainer.evaluate()
    if cfg.model.model_path:
        trainer.save(os.path.join(cfg.model.model_path, "chkpnt_final.pkl"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
