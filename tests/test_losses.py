"""Losses vs a torch oracle that replicates the reference formulas
(`utils/loss_utils.py`) exactly."""

import math

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from fourdgs_tpu.utils import losses


def _torch_ssim(img1, img2, window_size=11):
    """Reference _ssim (loss_utils.py:44-64), channel-first torch."""
    sigma = 1.5
    gauss = torch.tensor(
        [math.exp(-(x - window_size // 2) ** 2 / (2 * sigma ** 2))
         for x in range(window_size)])
    g1 = (gauss / gauss.sum()).unsqueeze(1)
    window2d = g1.mm(g1.t()).float().unsqueeze(0).unsqueeze(0)
    c = img1.size(-3)
    window = window2d.expand(c, 1, window_size, window_size).contiguous()
    pad = window_size // 2
    mu1 = F.conv2d(img1, window, padding=pad, groups=c)
    mu2 = F.conv2d(img2, window, padding=pad, groups=c)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = F.conv2d(img1 * img1, window, padding=pad, groups=c) - mu1_sq
    s2 = F.conv2d(img2 * img2, window, padding=pad, groups=c) - mu2_sq
    s12 = F.conv2d(img1 * img2, window, padding=pad, groups=c) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return m.mean().item()


def test_ssim_matches_reference_formula(rng):
    a = rng.random((1, 37, 45, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    ours = float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))
    theirs = _torch_ssim(torch.from_numpy(a).permute(0, 3, 1, 2),
                         torch.from_numpy(b).permute(0, 3, 1, 2))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_ssim_identical_is_one(rng):
    a = rng.random((32, 32, 3)).astype(np.float32)
    assert abs(float(losses.ssim(jnp.asarray(a), jnp.asarray(a))) - 1.0) < 1e-5


def test_msssim_sanity(rng):
    a = rng.random((1, 180, 200, 3)).astype(np.float32)
    same = float(losses.msssim(jnp.asarray(a), jnp.asarray(a)))
    assert abs(same - 1.0) < 1e-4
    noisy1 = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    noisy2 = np.clip(a + rng.normal(0, 0.2, a.shape), 0, 1).astype(np.float32)
    m1 = float(losses.msssim(jnp.asarray(a), jnp.asarray(noisy1)))
    m2 = float(losses.msssim(jnp.asarray(a), jnp.asarray(noisy2)))
    assert 0 < m2 < m1 < 1.0


def test_psnr(rng):
    a = rng.random((8, 8, 3)).astype(np.float32)
    b = np.clip(a + 0.1, 0, 1).astype(np.float32)
    mse = np.mean((a - b) ** 2)
    expect = 20 * np.log10(1.0 / np.sqrt(mse))
    np.testing.assert_allclose(float(losses.psnr(jnp.asarray(a), jnp.asarray(b))),
                               expect, rtol=1e-5)


def test_l1_and_photometric(rng):
    a = rng.random((16, 16, 3)).astype(np.float32)
    b = rng.random((16, 16, 3)).astype(np.float32)
    l1 = float(losses.l1_loss(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(l1, np.abs(a - b).mean(), rtol=1e-6)
    loss, ll1, lssim = losses.photometric_loss(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(
        float(loss), 0.8 * float(ll1) + 0.2 * float(lssim), rtol=1e-6)


def test_opacity_mask_loss():
    alpha = jnp.full((4, 4), 0.5)
    mask = jnp.zeros((4, 4))  # all sky
    val = float(losses.opacity_mask_loss(alpha, mask))
    np.testing.assert_allclose(val, -np.log(0.5), rtol=1e-5)
    # fully foreground -> no penalty
    assert float(losses.opacity_mask_loss(alpha, jnp.ones((4, 4)))) == 0.0


def test_fast_ssim_close_to_exact(rng):
    """The 3-bf16-pass blur split (production loss mode) tracks the
    HIGHEST-precision SSIM within ~2^-17 on values; loss gradients stay
    in the same tolerance class as the kernels' fast mode."""
    import jax
    import jax.numpy as jnp

    a = jnp.asarray(rng.random((64, 72, 3)), jnp.float32)
    b = jnp.asarray(rng.random((64, 72, 3)), jnp.float32)
    s_hi = float(losses.ssim(a, b))
    s_f = float(losses.ssim(a, b, fast=True))
    # SSIM lives in [-1, 1]; absolute tolerance (random-noise images sit
    # near 0, inflating relative error).
    assert abs(s_hi - s_f) < 1e-5

    g_hi = jax.grad(lambda x: losses.photometric_loss(x, b)[0])(a)
    g_f = jax.grad(
        lambda x: losses.photometric_loss(x, b, fast=True)[0])(a)
    scale = float(jnp.max(jnp.abs(g_hi)))
    d = np.abs(np.asarray(g_hi - g_f)) / scale
    # Same bulk bound as the kernels' fast mode
    # (test_fast_grad_reduce_close_to_exact): the split's AD truncates
    # cotangents to bf16 in the transposed dots.
    assert d.mean() < 2e-3, d.mean()
    assert d.max() < 3e-2, d.max()


def test_fast_ssim_not_folded_under_jit(rng):
    """Regression: XLA's algebraic simplifier used to fold the blur
    split's compensation term to exactly zero (pushing the bf16 convert
    into `v - f32(bf16(v))`), silently degrading the 3-pass split to a
    single bf16 pass. On smooth near-white renders the resulting sigma
    error drove SSIM denominators through zero — training losses of
    -80..+40. The folding only fires inside larger fused programs, so
    this test jits fast+exact together and checks a smooth image pair
    (the failing class); `_bf16_split`'s barrier is the fix."""
    import jax
    import jax.numpy as jnp

    x = np.linspace(0, 1, 160, dtype=np.float32)
    xx, yy = np.meshgrid(x, x)
    blob = np.exp(-((xx - 0.5) ** 2 + (yy - 0.55) ** 2) / 0.01)
    a = 1.0 - 0.5 * np.stack([blob, blob * 0.8, blob * 0.6], -1)
    b = np.clip(a + 0.02 * rng.standard_normal(a.shape), 0, 1)
    a = jnp.asarray(a, jnp.float32)[None]
    b = jnp.asarray(b, jnp.float32)[None]

    @jax.jit
    def both(a, b):
        return losses.ssim(a, b, fast=True), losses.ssim(a, b)

    s_f, s_hi = [float(v) for v in both(a, b)]
    assert -1.0 <= s_f <= 1.0, s_f
    # Small-sigma regions amplify the split's ~2^-17 blur error; the
    # folding bug produced |errors| of 20-100 here.
    assert abs(s_f - s_hi) < 1e-3, (s_f, s_hi)

    # The split's lo term must survive compilation (non-zero for
    # non-bf16-representable inputs).
    @jax.jit
    def lo_mag(v):
        _, lo = losses._bf16_split(v)
        return jnp.abs(lo.astype(jnp.float32)).max()

    v = jnp.asarray(rng.random((256,)) + 0.5, jnp.float32)
    assert float(lo_mag(v)) > 0.0


def _msssim_oracle_f64(img1, img2):
    """Independent float64 MS-SSIM oracle (scipy, plain loops): the
    published Wang'03 algorithm with torchmetrics' default parameters
    (11x11 gaussian sigma 1.5, 5 scales, betas, relu-normalized cs,
    floor 2x2 avg-pool) and this repo's documented 'same' zero padding.
    torchmetrics itself is not installable in this environment
    (VERDICT r3 item 8) — this verifies the production implementation's
    banded-MXU numerics against trivially-readable reference math."""
    from scipy.ndimage import convolve1d

    betas = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)
    x = np.arange(11) - 5
    g = np.exp(-(x ** 2) / (2.0 * 1.5 ** 2))
    g = g / g.sum()

    def blur(im):
        out = convolve1d(im, g, axis=0, mode="constant")
        return convolve1d(out, g, axis=1, mode="constant")

    def ssim_cs(a, b):
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        mu1 = np.stack([blur(a[..., c]) for c in range(3)], -1)
        mu2 = np.stack([blur(b[..., c]) for c in range(3)], -1)
        s1 = np.stack([blur((a * a)[..., c]) for c in range(3)], -1) - mu1 ** 2
        s2 = np.stack([blur((b * b)[..., c]) for c in range(3)], -1) - mu2 ** 2
        s12 = np.stack([blur((a * b)[..., c]) for c in range(3)], -1) - mu1 * mu2
        cs = (2 * s12 + c2) / (s1 + s2 + c2)
        ssim = ((2 * mu1 * mu2 + c1) / (mu1 ** 2 + mu2 ** 2 + c1)) * cs
        return ssim.mean(), cs.mean()

    def pool(im):
        h, w = im.shape[0] // 2 * 2, im.shape[1] // 2 * 2
        im = im[:h, :w]
        return 0.25 * (im[0::2, 0::2] + im[1::2, 0::2]
                       + im[0::2, 1::2] + im[1::2, 1::2])

    a, b = img1.astype(np.float64), img2.astype(np.float64)
    vals = []
    for i in range(5):
        s, cs = ssim_cs(a, b)
        vals.append(s if i == 4 else cs)
        if i < 4:
            a, b = pool(a), pool(b)
    out = 1.0
    for v, beta in zip(vals, betas):
        out *= max(v, 0.0) ** beta
    return out


def test_msssim_matches_independent_f64_oracle(rng):
    import jax.numpy as jnp

    # Structured pair (smooth blobs + noise) and a pure-noise pair.
    x = np.linspace(0, 1, 192, dtype=np.float32)
    xx, yy = np.meshgrid(x, x)
    blob = np.exp(-((xx - 0.45) ** 2 + (yy - 0.6) ** 2) / 0.02)
    a1 = 1.0 - 0.6 * np.stack([blob, 0.7 * blob, 0.4 * blob], -1)
    b1 = np.clip(a1 + 0.05 * rng.standard_normal(a1.shape), 0, 1)
    a2 = rng.random((192, 192, 3)).astype(np.float32)
    b2 = rng.random((192, 192, 3)).astype(np.float32)
    for a, b in ((a1, b1), (a2, b2)):
        got = float(losses.msssim(jnp.asarray(a, jnp.float32)[None],
                                  jnp.asarray(b, jnp.float32)[None]))
        want = _msssim_oracle_f64(a, b)
        assert abs(got - want) < 2e-4, (got, want)
