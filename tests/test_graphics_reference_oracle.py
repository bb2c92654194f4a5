"""Camera matrix builders vs the REFERENCE's own graphics_utils
(read-only import). graphics_utils returns matrices in M @ [x; 1] form —
the row-vector transpose only happens where Camera STORES them
(`scene/cameras.py:65-71`) — so the comparison is direct."""

import importlib.util
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "utils", "graphics_utils.py")),
    reason="reference not mounted")

from fourdgs_tpu.data import cameras as cam_lib  # noqa: E402


def _ref_graphics():
    spec = importlib.util.spec_from_file_location(
        "_ref_graphics_utils", os.path.join(REF, "utils",
                                            "graphics_utils.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_world_to_view_matches_reference(rng):
    gu = _ref_graphics()
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    rot = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    trans = rng.normal(size=3)
    want = gu.getWorld2View2(rot, trans)
    ours = cam_lib.world_to_view(rot, trans)
    np.testing.assert_allclose(ours, want, atol=1e-6)


def test_projection_matrix_matches_reference():
    gu = _ref_graphics()
    znear, zfar = 0.01, 100.0
    fovx, fovy = 0.9, 0.7
    want = gu.getProjectionMatrix(znear, zfar, fovx, fovy).numpy()
    ours = cam_lib.projection_matrix(znear, zfar, fovx, fovy)
    np.testing.assert_allclose(ours, want, atol=1e-6)


def test_projection_center_shift_matches_reference():
    gu = _ref_graphics()
    znear, zfar = 0.01, 100.0
    cx, cy, fl_x, fl_y, w, h = 310.0, 260.0, 600.0, 590.0, 640, 512
    want = gu.getProjectionMatrixCenterShift(
        znear, zfar, cx, cy, fl_x, fl_y, w, h).numpy()
    ours = cam_lib.projection_matrix_center_shift(
        znear, zfar, cx, cy, fl_x, fl_y, w, h)
    np.testing.assert_allclose(ours, want, atol=1e-6)


def test_fov_focal_matches_reference():
    gu = _ref_graphics()
    assert cam_lib.fov2focal(0.8, 640) == pytest.approx(
        gu.fov2focal(0.8, 640))
    assert cam_lib.focal2fov(500.0, 480) == pytest.approx(
        gu.focal2fov(500.0, 480))
