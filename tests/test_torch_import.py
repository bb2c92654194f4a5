"""Reference .pth checkpoint import (models/torch_import.py): the torch
capture() tuple (gaussian_model.py:99-136) maps losslessly onto the padded
GaussianState, including Adam moments by param-group name and the env map
transpose."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from fourdgs_tpu.models.torch_import import (  # noqa: E402
    import_reference_pth, load_reference_pth)


def _fake_capture_4d(rng, n=37, sh=16, env_res=8):
    t = lambda *s: torch.from_numpy(  # noqa: E731
        rng.normal(size=s).astype(np.float32))
    params = {
        "xyz": t(n, 3), "f_dc": t(n, 1, 3), "f_rest": t(n, sh - 1, 3),
        "opacity": t(n, 1), "scaling": t(n, 3), "rotation": t(n, 4),
        "t": t(n, 1), "scaling_t": t(n, 1), "rotation_r": t(n, 4),
    }
    group_order = ["xyz", "f_dc", "f_rest", "opacity", "scaling",
                   "rotation", "t", "scaling_t", "rotation_r"]
    opt_state = {
        "state": {i: {"step": torch.tensor(123.0),
                      "exp_avg": params[g] * 0.01,
                      "exp_avg_sq": params[g].abs() * 0.001}
                  for i, g in enumerate(group_order)},
        "param_groups": [{"name": g, "params": [i]}
                         for i, g in enumerate(group_order)],
    }
    capture = (
        2,                      # active_sh_degree
        params["xyz"], params["f_dc"], params["f_rest"],
        params["scaling"], params["rotation"], params["opacity"],
        t(n),                   # max_radii2D
        t(n, 1).abs(),          # xyz_gradient_accum
        t(n, 1).abs(),          # t_gradient_accum
        t(n, 1).abs(),          # denom
        opt_state,
        4.5,                    # spatial_lr_scale
        params["t"], params["scaling_t"], params["rotation_r"],
        True,                   # rot_4d
        t(3, env_res, env_res),  # env_map
        1,                      # active_sh_degree_t
    )
    return capture, params


def test_import_4d_roundtrip(tmp_path, rng):
    capture, params = _fake_capture_4d(rng)
    path = str(tmp_path / "chkpnt100.pth")
    torch.save((capture, 100), path)

    cap, iteration = load_reference_pth(path)
    assert iteration == 100 and cap["rot_4d"] is True

    gauss, meta = import_reference_pth(path, duration=1.0)
    n = 37
    assert int(gauss.n_active) == n
    assert gauss.params.xyz.shape[0] >= n          # padded capacity
    for field in ("xyz", "t", "scaling", "scaling_t", "rotation",
                  "rotation_r", "f_dc", "f_rest", "opacity"):
        got = np.asarray(getattr(gauss.params, field))[:n]
        want = params[field].numpy().reshape(got.shape)
        np.testing.assert_allclose(got, want, rtol=1e-6,
                                   err_msg=f"param {field}")
        # Adam moments rode along by group name.
        np.testing.assert_allclose(
            np.asarray(getattr(gauss.adam.mu, field))[:n], want * 0.01,
            rtol=1e-5, err_msg=f"adam mu {field}")
    assert int(gauss.adam.count) == 123
    # Densify stats and meta.
    assert np.asarray(gauss.denom)[:n].min() >= 0
    assert meta["iteration"] == 100
    assert meta["active_sh_degree"] == 2
    assert meta["spatial_lr_scale"] == pytest.approx(4.5)
    assert meta["env_map"].shape == (8, 8, 3)
    # Padding rows stay neutral (near-zero opacity).
    pad_opa = np.asarray(gauss.params.opacity)[n:]
    assert (pad_opa < -5).all()


def test_import_3d_layout(tmp_path, rng):
    n, sh = 11, 16
    t = lambda *s: torch.from_numpy(  # noqa: E731
        rng.normal(size=s).astype(np.float32))
    capture = (1, t(n, 3), t(n, 1, 3), t(n, sh - 1, 3), t(n, 3), t(n, 4),
               t(n, 1), t(n), t(n, 1).abs(), t(n, 1).abs(), {}, 2.0)
    path = str(tmp_path / "chkpnt3d.pth")
    torch.save((capture, 50), path)
    gauss, meta = import_reference_pth(path, duration=2.0)
    assert int(gauss.n_active) == n
    assert meta["rot_4d"] is False and meta["env_map"] is None
    # 4D defaults were synthesized for the missing temporal params.
    st = np.asarray(gauss.params.scaling_t)[:n]
    np.testing.assert_allclose(st, np.log(np.sqrt(2.0 / 5)), rtol=1e-5)
    # No optimizer state in the dict -> fresh Adam.
    assert int(gauss.adam.count) == 0
    assert float(np.abs(np.asarray(gauss.adam.mu.xyz)).max()) == 0.0


def test_export_import_roundtrip(tmp_path, rng):
    """export_reference_pth(import(x)) preserves the live rows exactly."""
    capture, params = _fake_capture_4d(rng)
    src = str(tmp_path / "src.pth")
    torch.save((capture, 77), src)
    gauss, meta = import_reference_pth(src, duration=1.0)

    from fourdgs_tpu.models.torch_import import export_reference_pth
    dst = str(tmp_path / "dst.pth")
    export_reference_pth(dst, gauss, iteration=meta["iteration"],
                         active_sh_degree=meta["active_sh_degree"],
                         active_sh_degree_t=meta["active_sh_degree_t"],
                         rot_4d=meta["rot_4d"],
                         spatial_lr_scale=meta["spatial_lr_scale"],
                         env_map=meta["env_map"])
    gauss2, meta2 = import_reference_pth(dst, duration=1.0)
    assert meta2["iteration"] == 77
    assert meta2["spatial_lr_scale"] == pytest.approx(4.5)
    n = int(gauss.n_active)
    assert int(gauss2.n_active) == n
    for field in ("xyz", "t", "scaling", "scaling_t", "rotation",
                  "rotation_r", "f_dc", "f_rest", "opacity"):
        np.testing.assert_array_equal(
            np.asarray(getattr(gauss2.params, field))[:n],
            np.asarray(getattr(gauss.params, field))[:n],
            err_msg=f"roundtrip {field}")
    np.testing.assert_allclose(meta2["env_map"], meta["env_map"], rtol=1e-7)
    # The exported tuple is the reference 4D layout (19 fields).
    cap, _ = load_reference_pth(dst)
    assert cap["rot_4d"] is True and len(cap) == 19
