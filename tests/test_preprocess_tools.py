"""Tests for COLMAP/RealityCapture extractors, rectify_mesh, pose paths."""

import os
import struct

import numpy as np

from scanerf_tpu.data import io as data_io
from scanerf_tpu.preprocess import colmap, reality_capture, rectify_mesh
from scanerf_tpu.utils import pose_paths


def write_fake_colmap(tmp_path):
    sp = tmp_path / "sparse" / "0"
    sp.mkdir(parents=True)
    # cameras.bin: one SIMPLE_PINHOLE camera
    with open(sp / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 0, 640, 480))
        f.write(struct.pack("<3d", 500.0, 320.0, 240.0))
    # images.bin: two images, identity-ish poses
    with open(sp / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 2))
        for i, name in enumerate([b"a.png", b"b.png"]):
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<4d", 1.0, 0.0, 0.0, 0.0))  # qvec identity
            f.write(struct.pack("<3d", 0.1 * i, 0.0, 1.0))
            f.write(struct.pack("<i", 1))
            f.write(name + b"\x00")
            f.write(struct.pack("<Q", 0))
    return str(tmp_path)


def test_colmap_extractor(tmp_path):
    d = write_fake_colmap(tmp_path)
    n = colmap.extract_colmap_camera(d, copy_images=False)
    assert n == 2
    ks, c2ws, H, W = data_io.read_campara(os.path.join(d, "camera.log"), True)
    assert (H, W) == (480, 640)
    np.testing.assert_allclose(ks[0, 0, 0], 500.0)
    # identity quaternion -> identity rotation; center = -R^T t = -t
    np.testing.assert_allclose(c2ws[0][:, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(c2ws[0][:, 3], [0.0, 0.0, -1.0], atol=1e-6)


def test_bundler_reader(tmp_path):
    p = tmp_path / "bundler.out"
    with open(p, "w") as f:
        f.write("# Bundle file v0.3\n")
        f.write("1 0\n")
        f.write("800.0 0 0\n")
        f.write("1 0 0\n0 1 0\n0 0 1\n")
        f.write("0 0 -2\n")
    focals, c2ws = reality_capture.read_bundler(str(p))
    assert focals[0] == 800.0
    assert c2ws.shape == (1, 3, 4)
    # rotation stays orthonormal after the axis flips/global transforms
    R = c2ws[0][:, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)


def test_rectify_mesh(tmp_path):
    from scanerf_tpu.geometry import ply

    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    mp = str(tmp_path / "mesh.ply")
    ply.write_ply(mp, verts, faces)
    ks = np.array([[[100.0, 0, 32], [0, 100, 24], [0, 0, 1]]], np.float32)
    c2ws = np.tile(np.eye(3, 4, dtype=np.float32)[None], (1, 1, 1))
    cp = str(tmp_path / "camera.log")
    data_io.write_campara(cp, ks, c2ws, 48, 64)

    rectify_mesh.rectify_mesh(mp, cp, angle=(0, 0, 0), mesh_center=(0, 0, 0), scale=2.0)
    v2, _ = ply.read_ply(str(tmp_path / "mesh_align.ply"))
    np.testing.assert_allclose(v2, verts * 2, atol=1e-5)
    ks2, c2ws2 = data_io.read_campara(str(tmp_path / "camera_align.log"))
    np.testing.assert_allclose(c2ws2[0][:, 3], [0, 0, 0], atol=1e-6)
    assert os.path.exists(str(tmp_path / "align_info.txt"))


def test_pose_paths(tmp_path):
    a = np.eye(3, 4, dtype=np.float32)
    b = np.eye(3, 4, dtype=np.float32)
    b[:, 3] = [1, 0, 0]
    path = pose_paths.interpolate_poses(a, b, 5)
    assert path.shape == (5, 3, 4)
    np.testing.assert_allclose(path[0][:, 3], a[:, 3], atol=1e-6)
    np.testing.assert_allclose(path[-1][:, 3], b[:, 3], atol=1e-6)
    for P in path:  # orthonormal rotations throughout
        R = P[:, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)

    sph = pose_paths.pose_spherical(30.0, -45.0, 4.0)
    np.testing.assert_allclose(np.linalg.norm(sph[:, 3]), 4.0, atol=1e-5)
    # looks at the origin
    np.testing.assert_allclose(
        sph[:, 2], -sph[:, 3] / np.linalg.norm(sph[:, 3]), atol=1e-5
    )

    circ = pose_paths.circular_path(a, num=8)
    assert circ.shape == (8, 3, 4)

    k = np.array([[100.0, 0, 32], [0, 100, 24], [0, 0, 1]], np.float32)
    pose_paths.write_render_path(str(tmp_path / "renderPath.log"), k, path, 48, 64)
    ks2, c2ws2 = data_io.read_campara(str(tmp_path / "renderPath.log"))
    assert len(ks2) == 5


def _write_fake_colmap_with_points(tmp_path, n_views=3):
    """COLMAP model with rotated poses + 3D points for the LLFF tests."""
    rng = np.random.default_rng(0)
    sp = tmp_path / "sparse" / "0"
    sp.mkdir(parents=True)
    with open(sp / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 0, 64, 48))
        f.write(struct.pack("<3d", 80.0, 32.0, 24.0))
    c2ws = []
    with open(sp / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", n_views))
        for i in range(n_views):
            # camera on a circle looking at the origin-ish
            ang = 2 * np.pi * i / n_views
            q = np.array([np.cos(ang / 2), 0.0, np.sin(ang / 2), 0.0])
            R = colmap.qvec2rotmat(q)
            t = np.array([0.1 * i, 0.05, 2.0])
            c2w = np.eye(4)
            c2w[:3, :3] = R.T
            c2w[:3, 3] = -R.T @ t
            c2ws.append(c2w)
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<4d", *q))
            f.write(struct.pack("<3d", *t))
            f.write(struct.pack("<i", 1))
            f.write(f"im{i}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 0))
    with open(sp / "points3D.bin", "wb") as f:
        n_pts = 40
        f.write(struct.pack("<Q", n_pts))
        for p in range(n_pts):
            xyz = rng.normal(0, 0.3, 3)
            f.write(struct.pack("<QdddBBBd", p + 1, *xyz, 10, 20, 30, 0.5))
            f.write(struct.pack("<Q", n_views))
            for v in range(n_views):
                f.write(struct.pack("<2i", v + 1, 0))
    return str(tmp_path), np.stack(c2ws)


def test_llff_gen_poses_roundtrip(tmp_path):
    """COLMAP -> poses_bounds.npy -> llff_to_cameras recovers the
    original c2w poses and intrinsics (tools/poses/pose_utils.py)."""
    from scanerf_tpu.preprocess import llff

    d, c2ws_true = _write_fake_colmap_with_points(tmp_path, n_views=3)
    arr = llff.gen_poses(d)
    assert arr.shape == (3, 17)
    # near < far and both positive (cameras look toward the points)
    assert np.all(arr[:, -2] < arr[:, -1])

    poses, bds = (
        arr[:, :-2].reshape(-1, 3, 5).transpose(1, 2, 0),
        arr[:, -2:].T,
    )
    c2w, K = llff.llff_to_cameras(poses)
    np.testing.assert_allclose(K[0, 0, 0], 80.0)
    np.testing.assert_allclose(K[0, 0, 2], 32.0)
    # name sort is identity here -> same order as written
    for i in range(3):
        np.testing.assert_allclose(c2w[i], c2ws_true[i], atol=1e-8)


def test_llff_loader_and_minify(tmp_path):
    from scanerf_tpu.preprocess import llff

    d, _ = _write_fake_colmap_with_points(tmp_path, n_views=3)
    llff.gen_poses(d)
    imdir = tmp_path / "images"
    imdir.mkdir()
    import cv2

    rng = np.random.default_rng(1)
    for i in range(3):
        img = rng.integers(0, 255, (48, 64, 3), np.uint8)
        cv2.imwrite(str(imdir / f"im{i}.png"), img)
    poses, bds, imgs = llff.load_llff_data(d, factor=2)
    assert imgs.shape == (24, 32, 3, 3)
    # hwf updated to the minified resolution
    np.testing.assert_allclose(poses[:2, 4, 0], [24, 32])
    np.testing.assert_allclose(poses[2, 4, 0], 40.0)
