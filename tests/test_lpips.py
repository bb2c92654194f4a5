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


def test_lpips_errors_without_weights(rng):
    lp._WEIGHTS = None
    a = rng.random((32, 32, 3)).astype(np.float32)
    with pytest.raises(RuntimeError, match="LPIPS weights"):
        lp.lpips(a, a)
