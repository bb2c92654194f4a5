"""The reference's python-oracle renderer flags (`compute_cov3D_python`,
`convert_SHs_python`, `gaussian_renderer/__init__.py:73-147`) routed through
Trainer._render_eval: for 4D the cov oracle precomputes the conditional
covariance + mean offset, folds the temporal marginal into opacity, and
prefilters marginal <= 0.05.

Geometry (alpha/depth) must agree exactly across all four flag combos; color
agrees within each SH-direction convention (the reference python paths
evaluate SH at the time-shifted means, its CUDA path at unshifted —
`gaussian_renderer/__init__.py:100-104` vs `forward.cu:480-487`)."""

import numpy as np
import pytest

from fourdgs_tpu.engine.trainer import Trainer

from test_trainer import _config, _write_scene


def _render_combo(cfg, scene, cov, shs):
    cfg.pipeline.compute_cov3D_python = cov
    cfg.pipeline.convert_SHs_python = shs
    tr = Trainer(cfg, scene=scene, verbose=False)
    cam = tr.scene.test_cameras[0]
    color, depth, alpha = tr.render_view(cam)
    return np.asarray(color), np.asarray(depth), np.asarray(alpha)


@pytest.mark.parametrize("rot_4d", [True, False])
def test_oracle_combos_4d(tmp_path, rot_4d):
    _write_scene(tmp_path, n_frames=4)
    cfg = _config(tmp_path)
    cfg.rot_4d = rot_4d
    cfg.model.model_path = ""
    tr0 = Trainer(cfg, verbose=False)
    scene = tr0.scene

    base = _render_combo(cfg, scene, False, False)
    cov = _render_combo(cfg, scene, True, False)
    sh = _render_combo(cfg, scene, False, True)
    both = _render_combo(cfg, scene, True, True)

    # Identical geometry across every combo (same conditional covariance /
    # marginal / prefilter math, precomputed vs fused).
    for other in (cov, sh, both):
        np.testing.assert_allclose(other[1], base[1], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(other[2], base[2], rtol=1e-5, atol=1e-6)

    # Same SH-direction convention => identical colors:
    #  - cov-only evaluates SH inside preprocess at the pre-shifted means;
    #    cov+SHs evaluates in python at the same shifted means.
    np.testing.assert_allclose(both[0], cov[0], rtol=1e-5, atol=1e-6)
    if not rot_4d:
        # Separable mode has no mean offset: every combo shares unshifted
        # SH directions, so all four must agree in color too.
        np.testing.assert_allclose(cov[0], base[0], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(sh[0], base[0], rtol=1e-5, atol=1e-6)
    else:
        # Shifted vs unshifted SH directions: small but nonzero color
        # difference is expected; images stay finite and close.
        assert np.isfinite(cov[0]).all() and np.isfinite(sh[0]).all()
        assert np.max(np.abs(sh[0] - base[0])) < 0.25


def test_oracle_cov3d_3d_mode(tmp_path):
    _write_scene(tmp_path, n_frames=4)
    cfg = _config(tmp_path)
    cfg.gaussian_dim = 3
    cfg.rot_4d = False
    cfg.model.model_path = ""
    tr0 = Trainer(cfg, verbose=False)
    base = _render_combo(cfg, tr0.scene, False, False)
    cov = _render_combo(cfg, tr0.scene, True, False)
    for i in range(3):
        np.testing.assert_allclose(cov[i], base[i], rtol=1e-5, atol=1e-6)
