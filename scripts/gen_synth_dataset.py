#!/usr/bin/env python
"""Generate the full-size synthetic dynamic-scene benchmark dataset
(datasets/synth_quality): 120 train / 20 test views at 400x400, GT
oracle-rendered from a known moving scene (fourdgs_tpu/data/synth.py).
Skips regeneration when the manifest matches. Runs on CPU by default
(the oracle is O(P*pixels); ~15 min on 4 cores, seconds on TPU)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="datasets/synth_quality")
    p.add_argument("--n_train", type=int, default=120)
    p.add_argument("--n_test", type=int, default=20)
    p.add_argument("--size", type=int, default=400)
    p.add_argument("--points_scale", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true", default=True,
                   help="force the CPU backend (default)")
    p.add_argument("--tpu", dest="cpu", action="store_false")
    p.add_argument("--dynerf", action="store_true",
                   help="DyNeRF-modality dataset (fixed multi-camera "
                        "rig, video frames over [0,10], RGBA + sky; "
                        "see data/synth.py:generate_dataset_dynerf)")
    p.add_argument("--n_cams", type=int, default=15)
    p.add_argument("--n_frames", type=int, default=60)
    args = p.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.dynerf:
        from fourdgs_tpu.data.synth import generate_dataset_dynerf
        out = generate_dataset_dynerf(
            args.out if args.out != "datasets/synth_quality"
            else "datasets/synth_dynerf",
            n_cams=args.n_cams, n_frames=args.n_frames,
            n_test_frames=args.n_test, width=args.size, height=args.size,
            points_scale=args.points_scale, seed=args.seed, verbose=True)
    else:
        from fourdgs_tpu.data.synth import generate_dataset
        out = generate_dataset(
            args.out, n_train=args.n_train, n_test=args.n_test,
            width=args.size, height=args.size,
            points_scale=args.points_scale, seed=args.seed, verbose=True)
    print("dataset ready:", out)


if __name__ == "__main__":
    main()
