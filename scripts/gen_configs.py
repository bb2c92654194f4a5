#!/usr/bin/env python
"""Generate configs/{dnerf,dynerf}/*.yaml with the reference's exact keys
and per-scene hyper-parameters (`/root/reference/configs`), paths pointed
at this repo's data/ and output/ roots."""

import copy
import os

import yaml

BASE_DNERF = {
    "gaussian_dim": 4,
    "time_duration": [0.0, 1.0],
    "num_pts": 100_000,
    "num_pts_ratio": 1.0,
    "rot_4d": True,
    "force_sh_3d": False,
    "batch_size": 2,
    "exhaust_test": True,
    "ModelParams": {
        "sh_degree": 3, "source_path": "", "model_path": "",
        "images": "images", "resolution": 2, "white_background": False,
        "data_device": "tpu", "eval": True, "extension": ".png",
        "num_extra_pts": 0, "loaded_pth": "", "frame_ratio": 1,
        "dataloader": False,
    },
    "PipelineParams": {
        "convert_SHs_python": False, "compute_cov3D_python": False,
        "debug": False, "env_map_res": 0,
        "env_optimize_until": 1000000000, "env_optimize_from": 0,
        "eval_shfs_4d": True,
    },
    "OptimizationParams": {
        "iterations": 30_000, "position_lr_init": 0.00016,
        "position_t_lr_init": -1.0, "position_lr_final": 0.0000016,
        "position_lr_delay_mult": 0.01, "position_lr_max_steps": 30_000,
        "feature_lr": 0.0025, "opacity_lr": 0.05, "scaling_lr": 0.005,
        "rotation_lr": 0.001, "percent_dense": 0.01, "lambda_dssim": 0.2,
        "thresh_opa_prune": 0.005, "densification_interval": 100,
        "opacity_reset_interval": 3000, "densify_from_iter": 500,
        "densify_until_iter": 15_000, "densify_grad_threshold": 0.0002,
        "densify_grad_t_threshold": 0.0002 / 40,
        "densify_until_num_points": -1, "final_prune_from_iter": -1,
        "sh_increase_interval": 1000, "lambda_opa_mask": 0.0,
        "lambda_rigid": 0.0, "lambda_motion": 0.0,
    },
}

DNERF_SCENES = {
    "lego": {"OptimizationParams": {"lambda_rigid": 1.0}},
    "bouncingballs": {"OptimizationParams": {
        "iterations": 20_000, "position_lr_max_steps": 15_000,
        "densification_interval": 200, "densify_until_iter": 10_000}},
    "hellwarrior": {"batch_size": 1},
    "hook": {"num_pts": 300_000, "batch_size": 8},
    "jumpingjacks": {"num_pts": 300_000, "batch_size": 16},
    "mutant": {"num_pts": 300_000, "batch_size": 8},
    "standup": {"num_pts": 300_000, "batch_size": 8},
    "trex": {"num_pts": 300_000, "batch_size": 24},
}

DYNERF_BASE_DELTA = {
    "time_duration": [0.0, 10.0],
    "num_pts": 300_000,
    "batch_size": 4,
    "ModelParams": {"dataloader": True},
}

DYNERF_SCENES = {
    "flame_salmon": {"PipelineParams": {"env_map_res": 500,
                                        "env_optimize_until": 5000}},
    "coffee_martini": {"PipelineParams": {"env_map_res": 500,
                                          "env_optimize_until": 5000}},
    "cook_spinach": {},
    "cut_roasted_beef": {},
    "sear_steak": {},
    "flame_steak": {"OptimizationParams": {"opacity_reset_interval": 10000}},
}


def merge(base, delta):
    out = copy.deepcopy(base)
    for k, v in delta.items():
        if isinstance(v, dict):
            out[k] = merge(out.get(k, {}), v)
        else:
            out[k] = v
    return out


def emit(root, family, scenes, base):
    os.makedirs(os.path.join(root, family), exist_ok=True)
    for scene, delta in scenes.items():
        cfg = merge(base, delta)
        cfg["ModelParams"]["source_path"] = f"data/{family}/{scene}"
        cfg["ModelParams"]["model_path"] = f"output/{family}/{scene}"
        with open(os.path.join(root, family, f"{scene}.yaml"), "w") as f:
            yaml.safe_dump(cfg, f, sort_keys=False)


if __name__ == "__main__":
    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    emit(root, "dnerf", DNERF_SCENES, BASE_DNERF)
    emit(root, "dynerf", DYNERF_SCENES, merge(BASE_DNERF, DYNERF_BASE_DELTA))
    print("configs written")
