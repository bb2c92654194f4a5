"""LPIPS module: architecture shape-check with synthetic weights (the
real pretrained weights require the offline converter)."""

import numpy as np
import pytest

from fourdgs_tpu.utils import lpips as lp


def _synthetic_weights(rng):
    w = {}
    cin = 3
    for i, (cout, k, *_rest) in enumerate(lp._ALEX_CONVS):
        w[f"conv{i}_w"] = rng.normal(0, 0.05, (k, k, cin, cout)).astype(
            np.float32)
        w[f"conv{i}_b"] = np.zeros(cout, np.float32)
        w[f"lin{i}_w"] = rng.random(cout).astype(np.float32)
        cin = cout
    return w


def test_lpips_with_synthetic_weights(rng):
    lp._WEIGHTS = _synthetic_weights(rng)
    try:
        a = rng.random((64, 64, 3)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.2, a.shape), 0, 1).astype(np.float32)
        same = float(lp.lpips(a, a))
        diff = float(lp.lpips(a, b))
        assert same < 1e-6
        assert diff > same
        assert np.isfinite(diff)
    finally:
        lp._WEIGHTS = None


def test_lpips_matches_torch_forward(rng):
    """Numeric architecture check: the JAX LPIPS forward equals an
    independently-written torch implementation of the same network
    (AlexNet features -> channel unit-norm -> linear weights -> spatial
    mean -> layer sum, `lpipsPyTorch/modules/lpips.py` behavior) when
    both use the SAME random weights — verifies convs, padding, strides,
    pool placement, normalization, and reduction order, not just shapes."""
    import torch
    import torch.nn.functional as F

    w = _synthetic_weights(rng)
    a = rng.random((67, 73, 3)).astype(np.float32)   # non-square, odd dims
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)

    def torch_lpips(x_np, y_np):
        def feats(x_np):
            x = torch.from_numpy(x_np).permute(2, 0, 1)[None]  # (1,3,H,W)
            x = x * 2.0 - 1.0
            shift = torch.tensor(lp._SHIFT).view(1, 3, 1, 1)
            scale = torch.tensor(lp._SCALE).view(1, 3, 1, 1)
            h = (x - shift) / scale
            out = []
            for i, (cout, k, s, p) in enumerate(lp._ALEX_CONVS):
                kern = torch.from_numpy(
                    w[f"conv{i}_w"]).permute(3, 2, 0, 1)  # HWIO -> OIHW
                bias = torch.from_numpy(w[f"conv{i}_b"])
                h = F.relu(F.conv2d(h, kern, bias, stride=s, padding=p))
                out.append(h)
                if i in lp._POOL_AFTER:
                    h = F.max_pool2d(h, 3, 2)
            return out

        total = 0.0
        for i, (fa, fb) in enumerate(zip(feats(x_np), feats(y_np))):
            fa = fa / torch.sqrt((fa * fa).sum(1, keepdim=True) + 1e-10)
            fb = fb / torch.sqrt((fb * fb).sum(1, keepdim=True) + 1e-10)
            lin = torch.from_numpy(w[f"lin{i}_w"]).view(1, -1, 1, 1)
            total = total + ((fa - fb) ** 2 * lin).sum(1).mean()
        return float(total)

    lp._WEIGHTS = w
    try:
        got = float(lp.lpips(a, b))
        want = torch_lpips(a, b)
        assert want > 0
        np.testing.assert_allclose(got, want, rtol=2e-4)
    finally:
        lp._WEIGHTS = None


def test_lpips_errors_without_weights(rng):
    lp._WEIGHTS = None
    a = rng.random((32, 32, 3)).astype(np.float32)
    with pytest.raises(RuntimeError, match="LPIPS weights"):
        lp.lpips(a, a)
