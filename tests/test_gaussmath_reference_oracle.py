"""Rotation builders and LR schedule vs the REFERENCE's own torch
general_utils (imported read-only with a pointops2 stub — that module
pulls in a CUDA extension we don't need for these functions)."""

import importlib.util
import os
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "utils", "general_utils.py")),
    reason="reference not mounted")

from fourdgs_tpu.models.gaussians import expon_lr  # noqa: E402
from fourdgs_tpu.ops import gaussmath as gm  # noqa: E402


def _ref_general_utils():
    # Stub the CUDA-only pointops2 import chain.
    for name in ("pointops2", "pointops2.functions",
                 "pointops2.functions.pointops"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
    sys.modules["pointops2.functions.pointops"].furthestsampling = None
    sys.modules["pointops2.functions.pointops"].knnquery = None
    spec = importlib.util.spec_from_file_location(
        "_ref_general_utils", os.path.join(REF, "utils", "general_utils.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_rotor4d_matches_reference_build_rotation_4d(rng):
    gu = _ref_general_utils()
    n = 40
    left = rng.normal(size=(n, 4)).astype(np.float32)
    right = rng.normal(size=(n, 4)).astype(np.float32)
    want = gu.build_rotation_4d(torch.from_numpy(left),
                                torch.from_numpy(right)).numpy()
    ln = left / np.linalg.norm(left, axis=1, keepdims=True)
    rn = right / np.linalg.norm(right, axis=1, keepdims=True)
    ours = np.asarray(gm.rotor4d_to_rotmat(jnp.asarray(ln),
                                           jnp.asarray(rn)))
    np.testing.assert_allclose(ours, want, atol=1e-5)


def test_scaling_rotation_4d_matches_reference(rng, monkeypatch):
    gu = _ref_general_utils()
    orig_zeros = torch.zeros
    monkeypatch.setattr(
        torch, "zeros",
        lambda *a, **k: orig_zeros(*a, **{x: v for x, v in k.items()
                                          if x != "device"}))
    n = 24
    s = rng.random((n, 4)).astype(np.float32) + 0.1
    left = rng.normal(size=(n, 4)).astype(np.float32)
    right = rng.normal(size=(n, 4)).astype(np.float32)
    want_l = gu.build_scaling_rotation_4d(
        torch.from_numpy(s), torch.from_numpy(left),
        torch.from_numpy(right)).numpy()
    want_cov = want_l @ want_l.transpose(0, 2, 1)
    ln = left / np.linalg.norm(left, axis=1, keepdims=True)
    rn = right / np.linalg.norm(right, axis=1, keepdims=True)
    ours_cov = np.asarray(gm.build_cov4d(
        jnp.asarray(s), jnp.asarray(ln), jnp.asarray(rn)))
    np.testing.assert_allclose(ours_cov, want_cov, atol=1e-4)


def test_build_rotation_3d_matches_reference(rng, monkeypatch):
    gu = _ref_general_utils()
    # The reference allocates on device='cuda' unconditionally
    # (general_utils.py:84); strip that on this CPU-only torch.
    orig_zeros = torch.zeros
    monkeypatch.setattr(
        torch, "zeros",
        lambda *a, **k: orig_zeros(*a, **{x: v for x, v in k.items()
                                          if x != "device"}))
    n = 32
    q = rng.normal(size=(n, 4)).astype(np.float32)
    want = gu.build_rotation(torch.from_numpy(q)).numpy()
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    ours = np.asarray(gm.quat_to_rotmat(jnp.asarray(qn)))
    np.testing.assert_allclose(ours, want, atol=1e-5)


def test_expon_lr_matches_reference(rng):
    gu = _ref_general_utils()
    f = gu.get_expon_lr_func(lr_init=1.6e-4, lr_final=1.6e-6,
                             lr_delay_steps=500, lr_delay_mult=0.01,
                             max_steps=30_000)
    for step in (0, 1, 250, 500, 5_000, 15_000, 30_000, 40_000):
        want = f(step)
        ours = float(expon_lr(step, lr_init=1.6e-4, lr_final=1.6e-6,
                              lr_delay_steps=500, lr_delay_mult=0.01,
                              max_steps=30_000))
        assert ours == pytest.approx(want, rel=1e-6), step
