#!/usr/bin/env python
"""Summarize a training run's metrics.jsonl into the markdown record
used by docs/TRAINING.md: eval-PSNR curve, points growth, wall-clock,
truncated-step count. Usage:

    python scripts/training_record.py output/synth_quality
"""
import json
import sys


def main(model_dir):
    rows = []
    with open(f"{model_dir}/metrics.jsonl") as f:
        for line in f:
            rows.append(json.loads(line))

    evals = [(r["step"], r["eval_psnr"]) for r in rows if "eval_psnr" in r]
    steps = [r for r in rows if "loss" in r]
    truncated = [(r["step"], r["instances_dropped"]) for r in rows
                 if r.get("instances_dropped")]

    has_reg = any(r.get("rigid") or r.get("motion") for r in steps)
    reg_hdr = " rigid | motion |" if has_reg else ""
    print("| iteration | test PSNR | points | train PSNR (batch) "
          f"| wall (s) |{reg_hdr}")
    print("|---|---|---|---|---|" + ("---|---|" if has_reg else ""))
    for it, psnr in evals:
        nearest = min(steps, key=lambda r: abs(r["step"] - it))
        reg = (f" {nearest.get('rigid', 0):.2e} "
               f"| {nearest.get('motion', 0):.2e} |" if has_reg else "")
        print(f"| {it} | {psnr:.2f} | {int(nearest['total_points'])} "
              f"| {nearest['psnr']:.2f} | {nearest['wall_s']:.0f} |{reg}")
    if steps:
        last = steps[-1]
        n_iter = last["step"]
        print(f"\n- iterations recorded: {n_iter}, final loss "
              f"{last['loss']:.4f}, wall {last['wall_s']:.0f} s "
              f"({n_iter / last['wall_s']:.2f} it/s incl. eval/compiles)")
        pts = [int(r["total_points"]) for r in steps]
        print(f"- points: {pts[0]} -> peak {max(pts)} -> final {pts[-1]}")
    print(f"- truncated steps: {len(truncated)}"
          + (f" {truncated}" if truncated else " (every step rendered the"
             " full instance list)"))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "output/synth_quality")
