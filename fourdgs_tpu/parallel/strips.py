"""Single-frame scaling: shard one large frame's pixels across the mesh.

The reference has no intra-frame parallelism (its batch axis is whole
cameras, SURVEY §5.7). Here a frame is split into horizontal strips, and
each strip is rendered as an ordinary camera with a principal-point shift
(cy' = cy - y0) and height H/n — exactly the center-shift projection the
reference uses for real intrinsics (`graphics_utils.py:74-92`) — so the
EXISTING render path (preprocess -> binning -> Pallas blend) runs
unmodified per strip; binning and blending naturally touch only each
strip's tiles. shard_map places one strip per device; the gaussian cloud
is replicated and per-strip loss terms psum into the global loss, so
gradients all-reduce over ICI exactly like the camera-batch path.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List

import numpy as np

from ..data.cameras import Camera
from ..ops.preprocess import CameraArrays, RenderOptions


def strip_cameras(cam: Camera, n_strips: int) -> List[Camera]:
    """Split a camera into n horizontal strip cameras (top to bottom).
    Height must divide evenly (pad the image first otherwise)."""
    if cam.height % n_strips != 0:
        raise ValueError(f"height {cam.height} not divisible by {n_strips}")
    sh = cam.height // n_strips
    if cam.fl_x > 0:
        fl_x, fl_y, cx, cy = cam.fl_x, cam.fl_y, cam.cx, cam.cy
    else:
        fl_x = cam.width / (2 * math.tan(cam.fovx / 2))
        fl_y = cam.height / (2 * math.tan(cam.fovy / 2))
        cx, cy = cam.width / 2.0, cam.height / 2.0
    out = []
    for s in range(n_strips):
        out.append(dataclasses.replace(
            cam, height=sh, fl_x=fl_x, fl_y=fl_y, cx=cx, cy=cy - s * sh,
            image=None, alpha_mask=None))
    return out


def strip_batch_arrays(cam: Camera, n_strips: int) -> CameraArrays:
    """Stacked CameraArrays for the strip cameras (leading axis = strip)."""
    strips = strip_cameras(cam, n_strips)
    parts = [c.arrays() for c in strips]
    return CameraArrays(*[np.stack([getattr(p, f) for p in parts])
                          for f in CameraArrays._fields])


def strip_options(opts: RenderOptions, n_strips: int) -> RenderOptions:
    if opts.height % n_strips != 0:
        raise ValueError(f"height {opts.height} not divisible by {n_strips}")
    return opts._replace(height=opts.height // n_strips)


def split_image(img: np.ndarray, n_strips: int):
    """(H, W, ...) -> (n, H/n, W, ...) strip batch."""
    h = img.shape[0]
    return img.reshape((n_strips, h // n_strips) + img.shape[1:])


def join_strips(strips):
    """(n, H/n, W, ...) -> (H, W, ...)."""
    s = strips.shape
    return strips.reshape((s[0] * s[1],) + s[2:])
