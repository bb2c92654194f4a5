"""Shared test helpers: random scenes and torch-free oracles."""

import math

import numpy as np

from fourdgs_tpu.data.cameras import Camera


def random_scene(rng, p=64, gaussian_dim=4, time_duration=(0.0, 1.0),
                 seed_scale=0.35, dtype=np.float32):
    """A random cloud of 4D gaussians in front of the default camera."""
    xyz = rng.uniform(-1.0, 1.0, (p, 3))
    xyz[:, 2] = rng.uniform(2.0, 6.0, p)  # in front of a camera at origin
    t = rng.uniform(time_duration[0], time_duration[1], (p,))
    scales = np.exp(rng.normal(math.log(seed_scale), 0.3, (p, 3)))
    scales_t = np.exp(rng.normal(math.log(0.3), 0.3, (p,)))
    q = rng.normal(size=(p, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    qr = rng.normal(size=(p, 4))
    qr /= np.linalg.norm(qr, axis=1, keepdims=True)
    opacity = rng.uniform(0.3, 0.95, (p,))
    sh = rng.normal(0.0, 0.3, (p, 48, 3))
    sh[:, 0, :] = rng.uniform(-1.0, 1.5, (p, 3))
    return dict(
        means3d=xyz.astype(dtype), t=t.astype(dtype),
        scales=scales.astype(dtype), scales_t=scales_t.astype(dtype),
        rotations=q.astype(dtype), rotations_r=qr.astype(dtype),
        opacity=opacity.astype(dtype), sh=sh.astype(dtype),
        active=np.ones(p, bool),
    )


def look_at_camera(width=64, height=64, fov=1.0, timestamp=0.5):
    """Identity-pose camera at the origin looking down +z."""
    return Camera(uid=0, rot=np.eye(3), trans=np.zeros(3),
                  fovx=fov, fovy=fov, width=width, height=height,
                  timestamp=timestamp)
