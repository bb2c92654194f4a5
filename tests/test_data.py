"""Data layer: PLY round-trip, Blender-JSON scene loading, COLMAP parsing,
resolution policy."""

import json
import os
import struct

import numpy as np
from PIL import Image

from fourdgs_tpu.data import colmap as colmap_io
from fourdgs_tpu.data import scene as scene_lib
from fourdgs_tpu.data.pointcloud import read_ply, write_ply


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(17, 3)).astype(np.float32)
    cols = (rng.random((17, 3)) * 255)
    times = rng.random((17, 1)).astype(np.float32)
    path = str(tmp_path / "pc.ply")
    write_ply(path, pts, cols, times=times)
    pcd = read_ply(path)
    np.testing.assert_allclose(pcd.points, pts, rtol=1e-6)
    np.testing.assert_allclose(pcd.colors,
                               cols.astype(np.uint8) / 255.0, atol=1e-6)
    np.testing.assert_allclose(pcd.times, times, rtol=1e-6)


def _write_blender_dataset(root, n_frames=3, size=16, with_time=True):
    os.makedirs(root / "train", exist_ok=True)
    frames = []
    rng = np.random.default_rng(1)
    for i in range(n_frames):
        c2w = np.eye(4)
        c2w[:3, 3] = [0, 0, 4 + i * 0.1]
        frame = {"file_path": f"train/r_{i}",
                 "transform_matrix": c2w.tolist()}
        if with_time:
            frame["time"] = i / max(n_frames - 1, 1)
        frames.append(frame)
        img = (rng.random((size, size, 4)) * 255).astype(np.uint8)
        img[..., 3] = 255
        img[0, 0, 3] = 128  # some transparency -> alpha mask kept
        Image.fromarray(img, "RGBA").save(root / "train" / f"r_{i}.png")
    for split in ("train", "test"):
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.8, "frames": frames}, f)


def test_blender_scene(tmp_path, rng):
    _write_blender_dataset(tmp_path)
    info = scene_lib.load_scene(
        str(tmp_path), white_background=True, num_pts=500,
        time_duration=(0.0, 1.0), resolution=1)
    assert len(info.train_cameras) == 3
    assert len(info.test_cameras) == 3
    cam = info.train_cameras[0]
    assert cam.image.shape == (16, 16, 3)
    assert cam.alpha_mask is not None
    assert cam.timestamp == 0.0
    assert info.train_cameras[2].timestamp == 1.0
    assert info.point_cloud.points.shape == (500, 3)
    assert np.abs(info.point_cloud.points).max() <= 1.3
    assert info.radius > 0
    # random ply cached on disk and reloaded identically
    info2 = scene_lib.load_scene(
        str(tmp_path), white_background=True, num_pts=500,
        time_duration=(0.0, 1.0), resolution=1)
    np.testing.assert_allclose(info2.point_cloud.points,
                               info.point_cloud.points, atol=1e-7)


def test_blender_lazy_mode(tmp_path):
    _write_blender_dataset(tmp_path)
    info = scene_lib.load_scene(
        str(tmp_path), white_background=False, num_pts=100,
        time_duration=(0.0, 1.0), resolution=1, dataloader=True)
    cam = info.train_cameras[0]
    assert cam.image is None and cam.meta_only
    assert cam.width == 16 and cam.height == 16


def test_resolution_policy():
    (w, h), s = scene_lib.compute_resolution_scale(800, 600, 2)
    assert (w, h) == (400, 300) and s == 2
    (w, h), s = scene_lib.compute_resolution_scale(3200, 1600, -1)
    assert (w, h) == (1600, 800)
    (w, h), s = scene_lib.compute_resolution_scale(800, 600, -1)
    assert (w, h) == (800, 600)


def _write_colmap_model(sparse):
    os.makedirs(sparse, exist_ok=True)
    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 32, 24))  # PINHOLE
        f.write(struct.pack("<dddd", 30.0, 30.0, 16.0, 12.0))
    with open(os.path.join(sparse, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", 2))
        for i in range(2):
            f.write(struct.pack("<idddddddi", i + 1, 1, 0, 0, 0,
                                0.1 * i, 0, 4.0, 1))
            f.write(f"img_{i}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ddq", 1.0, 2.0, -1))
    with open(os.path.join(sparse, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", 2))
        for i in range(2):
            f.write(struct.pack("<QdddBBBd", i, 0.1 * i, 0.2, 0.3,
                                200, 100, 50, 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 1, 0))


def test_colmap_binary_parsers(tmp_path):
    sparse = str(tmp_path / "sparse" / "0")
    _write_colmap_model(sparse)
    cams, imgs = colmap_io.read_model(sparse)
    assert cams[1].model == "PINHOLE"
    assert cams[1].width == 32
    assert imgs[1].name == "img_0.png"
    np.testing.assert_allclose(imgs[2].tvec, [0.1, 0, 4.0])
    xyz, rgb, err = colmap_io.read_points3d(sparse)
    assert xyz.shape == (2, 3)
    assert rgb[0].tolist() == [200, 100, 50]


def test_colmap_scene(tmp_path):
    sparse = str(tmp_path / "sparse" / "0")
    _write_colmap_model(sparse)
    img_dir = tmp_path / "images"
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    for i in range(2):
        arr = (rng.random((24, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"img_{i}.png")
    info = scene_lib.load_scene(str(tmp_path), eval_holdout=False,
                                resolution=1)
    assert len(info.train_cameras) == 2
    assert info.train_cameras[0].image.shape == (24, 32, 3)
    assert info.point_cloud.points.shape == (2, 3)
    # every-8th holdout
    info2 = scene_lib.load_scene(str(tmp_path), eval_holdout=True,
                                 resolution=1)
    assert len(info2.test_cameras) == 1 and len(info2.train_cameras) == 1


def test_colmap_parser_matches_reference_loader(tmp_path):
    """Parse the same binary model with the REFERENCE's colmap_loader
    (read-only import) and with ours — identical camera/image/point
    records (cross-validates both the fixture and the rewrite)."""
    import importlib.util
    ref_path = "/root/reference/scene/colmap_loader.py"
    if not os.path.exists(ref_path):
        import pytest
        pytest.skip("reference not mounted")
    spec = importlib.util.spec_from_file_location("_ref_colmap", ref_path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    sparse = str(tmp_path / "sparse" / "0")
    _write_colmap_model(sparse)

    ref_cams = ref.read_intrinsics_binary(os.path.join(sparse, "cameras.bin"))
    ref_imgs = ref.read_extrinsics_binary(os.path.join(sparse, "images.bin"))
    ref_xyz, ref_rgb, ref_err = ref.read_points3D_binary(
        os.path.join(sparse, "points3D.bin"))

    cams, imgs = colmap_io.read_model(sparse)
    xyz, rgb, err = colmap_io.read_points3d(sparse)

    assert set(cams) == set(ref_cams) and set(imgs) == set(ref_imgs)
    for cid, rc in ref_cams.items():
        assert cams[cid].model == rc.model
        assert cams[cid].width == rc.width and cams[cid].height == rc.height
        np.testing.assert_allclose(cams[cid].params, rc.params)
    for iid, ri in ref_imgs.items():
        np.testing.assert_allclose(imgs[iid].qvec, ri.qvec)
        np.testing.assert_allclose(imgs[iid].tvec, ri.tvec)
        assert imgs[iid].name == ri.name
        assert imgs[iid].camera_id == ri.camera_id
    np.testing.assert_allclose(xyz, ref_xyz)
    np.testing.assert_array_equal(rgb, ref_rgb)
    np.testing.assert_allclose(err.reshape(-1), ref_err.reshape(-1))
