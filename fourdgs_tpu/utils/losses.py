"""Image losses: L1/L2, windowed SSIM, and multi-scale SSIM.

Behavioral parity with the reference (`utils/loss_utils.py`): SSIM uses an
11x11 gaussian window (sigma 1.5) built as the outer product of a 1D
kernel, zero "same" padding, C1 = 0.01^2, C2 = 0.03^2
(`loss_utils.py:24-64`). Here the separable structure is kept explicit —
two depthwise 1D convolutions instead of one 2D conv — which XLA maps
onto the TPU convolution units far better than an 11x11 dense window.

Images are channel-last (H, W, C) or batched (B, H, W, C) float in [0, 1]
(the reference is channel-first torch; layout only).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

_C1 = 0.01 ** 2
_C2 = 0.03 ** 2

# torchmetrics MultiScaleStructuralSimilarityIndexMeasure defaults
# (the reference's msssim metric, `loss_utils.py:66-71`).
_MSSSIM_BETAS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean((pred - target) ** 2)


@functools.lru_cache(maxsize=8)
def _gaussian_kernel1d(window_size: int, sigma: float) -> np.ndarray:
    x = np.arange(window_size) - window_size // 2
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


@functools.lru_cache(maxsize=16)
def _band_matrix(n: int, window_size: int, sigma: float) -> np.ndarray:
    """(n, n) banded matrix B with B[i, j] = g[j - i + pad]: B @ x is the
    1D 'same'-zero-padded gaussian blur along an n-length axis."""
    g = _gaussian_kernel1d(window_size, sigma)
    pad = window_size // 2
    m = np.zeros((n, n), np.float32)
    idx = np.arange(n)
    for o in range(-pad, pad + 1):
        j = idx + o
        ok = (j >= 0) & (j < n)
        m[idx[ok], j[ok]] = g[o + pad]
    return m


def _bf16_split(v: jax.Array):
    """v -> (hi, lo) bf16 with hi + lo ≈ v (compensated split). The
    optimization_barrier is load-bearing: without it XLA's algebraic
    simplifier pushes the narrowing convert into the subtraction and
    folds `lo` to EXACTLY ZERO (bf16(v - f32(bf16(v))) -> bf16(v) -
    bf16(v)), silently degrading every 3-pass split to a single bf16
    pass (~2^-9 error; observed as SSIM values outside [-1, 1] blowing
    up the training loss). Whether the rewrite fires depends on the
    surrounding program, so isolated unit tests pass while the fused
    train step misbehaves — keep the barrier."""
    hi = jax.lax.optimization_barrier(v.astype(jnp.bfloat16))
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _band_split3(b: jax.Array, x: jax.Array, sub: int) -> jax.Array:
    """b @ x contracting b's axis 1 with x's axis `sub`, as THREE bf16
    MXU passes (both operands split hi+lo, the lo*lo term dropped —
    ~2^-17 relative vs ~2x the cost of HIGHEST's six passes). The
    contracted axis lands on x's output axis 0."""
    bh, bl = _bf16_split(b)
    xh, xl = _bf16_split(x)
    dn = (((1,), (sub,)), ((), ()))
    kw = dict(preferred_element_type=jnp.float32)
    out = jax.lax.dot_general(bh, xh, dn, **kw)
    out += jax.lax.dot_general(bh, xl, dn, **kw)
    out += jax.lax.dot_general(bl, xh, dn, **kw)
    return out


def _blur(img: jax.Array, window_size: int, sigma: float,
          fast: bool = False) -> jax.Array:
    """Separable gaussian blur, zero 'same' padding. img: (B, H, W, C).

    Each 1D pass is a banded-matrix contraction on the MXU rather than a
    depthwise conv: with C=3 channels on the lane axis a grouped NHWC conv
    uses 3/128 of the vector unit, while the (H, H)/(W, W) band matmuls
    run at full systolic-array rate. Default is f32-exact via HIGHEST
    (SSIM values are oracle-compared at 1e-5); `fast` uses a 3-bf16-pass
    split (~2^-17 on values; AD of the split leaves ~1e-2 outliers in
    per-pixel loss grads — same class as the kernels' fast mode)."""
    _, h, w, _ = img.shape
    bh = jnp.asarray(_band_matrix(h, window_size, sigma))
    bw = jnp.asarray(_band_matrix(w, window_size, sigma))
    if fast:
        out = jnp.moveaxis(_band_split3(bh, img, 1), 0, 1)
        return jnp.moveaxis(_band_split3(bw, out, 2), 0, 2)
    kw = dict(precision=jax.lax.Precision.HIGHEST,
              preferred_element_type=jnp.float32)
    out = jnp.einsum("hk,bkwc->bhwc", bh, img, **kw)
    return jnp.einsum("wk,bhkc->bhwc", bw, out, **kw)


def _ssim_maps(img1, img2, window_size, sigma, fast=False):
    """Per-pixel (ssim, cs) maps for batched NHWC images."""
    mu1 = _blur(img1, window_size, sigma, fast)
    mu2 = _blur(img2, window_size, sigma, fast)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _blur(img1 * img1, window_size, sigma, fast) - mu1_sq
    sigma2_sq = _blur(img2 * img2, window_size, sigma, fast) - mu2_sq
    sigma12 = _blur(img1 * img2, window_size, sigma, fast) - mu1_mu2
    cs = (2 * sigma12 + _C2) / (sigma1_sq + sigma2_sq + _C2)
    ssim = ((2 * mu1_mu2 + _C1) / (mu1_sq + mu2_sq + _C1)) * cs
    return ssim, cs


def _ensure_batched(img: jax.Array):
    if img.ndim == 3:
        return img[None], True
    return img, False


def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11,
         sigma: float = 1.5, size_average: bool = True,
         fast: bool = False) -> jax.Array:
    """Mean SSIM (reference `loss_utils.py:34-64` semantics)."""
    img1, _ = _ensure_batched(img1)
    img2, _ = _ensure_batched(img2)
    m, _ = _ssim_maps(img1, img2, window_size, sigma, fast)
    if size_average:
        return jnp.mean(m)
    return jnp.mean(m, axis=(1, 2, 3))


def msssim(img1: jax.Array, img2: jax.Array, window_size: int = 11,
           sigma: float = 1.5) -> jax.Array:
    """Multi-scale SSIM, 5 scales, torchmetrics-default betas and
    relu-normalized cs terms; 2x2 average-pool downsampling."""
    img1, _ = _ensure_batched(img1)
    img2, _ = _ensure_batched(img2)
    n_scales = len(_MSSSIM_BETAS)
    vals = []
    for i in range(n_scales):
        s_map, cs_map = _ssim_maps(img1, img2, window_size, sigma)
        vals.append(jnp.mean(s_map if i == n_scales - 1 else cs_map,
                             axis=(1, 2, 3)))
        if i < n_scales - 1:
            img1 = _avg_pool2(img1)
            img2 = _avg_pool2(img2)
    vals = [jax.nn.relu(v) for v in vals]
    out = jnp.ones_like(vals[0])
    for v, b in zip(vals, _MSSSIM_BETAS):
        out = out * v ** b
    return jnp.mean(out)


def _avg_pool2(img: jax.Array) -> jax.Array:
    """2x2 stride-2 average pool (NHWC), matching F.avg_pool2d (floor)."""
    b, h, w, c = img.shape
    img = img[:, : h // 2 * 2, : w // 2 * 2]
    img = img.reshape(b, h // 2, 2, w // 2, 2, c)
    return img.mean(axis=(2, 4))


def psnr(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Per-image PSNR, mean over the batch (`utils/image_utils.py:17-19`)."""
    pred, _ = _ensure_batched(pred)
    target, _ = _ensure_batched(target)
    mse = jnp.mean((pred - target) ** 2, axis=(1, 2, 3))
    return jnp.mean(20.0 * jnp.log10(1.0 / jnp.sqrt(mse)))


def photometric_loss(pred: jax.Array, target: jax.Array,
                     lambda_dssim: float = 0.2, fast: bool = False):
    """(1-λ)·L1 + λ·(1-SSIM) (`train.py:115-117`). Returns (loss, l1, 1-ssim)."""
    ll1 = l1_loss(pred, target)
    lssim = 1.0 - ssim(pred, target, fast=fast)
    return (1.0 - lambda_dssim) * ll1 + lambda_dssim * lssim, ll1, lssim


def opacity_mask_loss(alpha: jax.Array, gt_alpha_mask: jax.Array) -> jax.Array:
    """Sky opacity BCE: mean over -sky·log(1-alpha), sky = 1-mask
    (`train.py:120-128`)."""
    o = jnp.clip(alpha, 1e-6, 1.0 - 1e-6)
    sky = 1.0 - gt_alpha_mask
    return jnp.mean(-sky * jnp.log(1.0 - o))
