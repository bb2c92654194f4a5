"""LPIPS perceptual metric (JAX).

Parity target: the reference's vestigial `lpipsPyTorch/` module (AlexNet /
VGG backbone features -> unit-normalize per channel -> linear-weighted
squared differences -> spatial mean; never wired into train.py,
`SURVEY.md` §2.1). Implemented here as a pure-JAX AlexNet feature stack.

Pretrained weights cannot be bundled (no network access in this
environment); load them from a local `.npz` via `load_weights`, produced
once with `scripts/convert_lpips_weights.py` from the `lpips` pip package
on any machine that has it. Until then `lpips()` raises a clear error.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# AlexNet feature config: (out_channels, kernel, stride, padding) per conv,
# with maxpool(3, 2) after convs 0, 1, 4 (torchvision layout).
_ALEX_CONVS = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
               (256, 3, 1, 1), (256, 3, 1, 1)]
_POOL_AFTER = {0, 1}
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_WEIGHTS: Optional[Dict[str, np.ndarray]] = None


def load_weights(path: str) -> None:
    """Load converted LPIPS(alex) weights: conv{i}_w (HWIO), conv{i}_b,
    lin{i}_w (1x1xCx1) for i in 0..4."""
    global _WEIGHTS
    data = np.load(path)
    _WEIGHTS = {k: np.asarray(data[k]) for k in data.files}


def weights_available(search: str = "") -> bool:
    global _WEIGHTS
    if _WEIGHTS is not None:
        return True
    for cand in (search, os.environ.get("FOURDGS_LPIPS_WEIGHTS", ""),
                 os.path.join(os.path.dirname(os.path.dirname(
                     os.path.dirname(os.path.abspath(__file__)))),
                     "weights", "lpips_alex.npz")):
        if cand and os.path.exists(cand):
            load_weights(cand)
            return True
    return False


def _maxpool(x, k=3, s=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID")


def _alexnet_features(x, w):
    """x: (B, H, W, 3) in [-1, 1] normalized; returns 5 feature maps."""
    feats = []
    h = x
    for i, (cout, k, s, p) in enumerate(_ALEX_CONVS):
        kern = jnp.asarray(w[f"conv{i}_w"])      # (k, k, cin, cout)
        dn = jax.lax.conv_dimension_numbers(h.shape, kern.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        h = jax.lax.conv_general_dilated(
            h, kern, (s, s), [(p, p), (p, p)], dimension_numbers=dn)
        h = h + jnp.asarray(w[f"conv{i}_b"])
        h = jax.nn.relu(h)
        feats.append(h)
        if i in _POOL_AFTER:
            h = _maxpool(h)
    return feats


def lpips(img1: jax.Array, img2: jax.Array) -> jax.Array:
    """LPIPS(alex) distance between (H, W, 3) or (B, H, W, 3) images in
    [0, 1]. Requires converted weights (see module docstring)."""
    if not weights_available():
        raise RuntimeError(
            "LPIPS weights not found. Convert them once with "
            "scripts/convert_lpips_weights.py (needs the `lpips` pip "
            "package elsewhere) and set FOURDGS_LPIPS_WEIGHTS or place "
            "them at weights/lpips_alex.npz.")
    w = _WEIGHTS
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)

    def norm_input(x):
        return (x * 2.0 - 1.0 - shift) / scale

    f1 = _alexnet_features(norm_input(img1), w)
    f2 = _alexnet_features(norm_input(img2), w)
    total = 0.0
    for i, (a, b) in enumerate(zip(f1, f2)):
        a = a / jnp.sqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-10)
        b = b / jnp.sqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-10)
        d = (a - b) ** 2
        lin = jnp.asarray(w[f"lin{i}_w"]).reshape(1, 1, 1, -1)
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1), axis=(1, 2))
    return jnp.mean(total)
