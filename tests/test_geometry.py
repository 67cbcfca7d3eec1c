"""PLY IO and proxy-mesh engine tests (native C++ vs NumPy oracle)."""

import numpy as np
import pytest

from scanerf_tpu.geometry import ply
from scanerf_tpu.geometry.mesh_engine import ProxyMesh, voxelize_mesh


def unit_quad(z=2.0, half=1.0):
    """Two triangles forming a quad at depth z, facing -z."""
    verts = np.array(
        [[-half, -half, z], [half, -half, z], [half, half, z], [-half, half, z]],
        np.float32,
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return verts, faces


def make_sphere_mesh(radius=1.0, n=12):
    us = np.linspace(0, np.pi, n)
    vs = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
    verts = []
    for u in us:
        for v in vs:
            verts.append(
                [radius * np.sin(u) * np.cos(v), radius * np.sin(u) * np.sin(v), radius * np.cos(u)]
            )
    verts = np.array(verts, np.float32)
    faces = []
    for i in range(n - 1):
        for j in range(2 * n):
            a = i * 2 * n + j
            b = i * 2 * n + (j + 1) % (2 * n)
            c = (i + 1) * 2 * n + j
            d = (i + 1) * 2 * n + (j + 1) % (2 * n)
            faces += [[a, b, c], [b, d, c]]
    return verts, np.array(faces, np.int32)


def test_ply_roundtrip(tmp_path):
    verts, faces = make_sphere_mesh()
    p = str(tmp_path / "m.ply")
    ply.write_ply(p, verts, faces)
    v2, f2 = ply.read_ply(p)
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    np.testing.assert_array_equal(f2, faces)


def test_native_engine_builds():
    verts, faces = unit_quad()
    m = ProxyMesh((verts, faces), grid_res=8)
    assert m._handle is not None, "native mesh engine failed to build"


def test_first_hit_quad():
    verts, faces = unit_quad(z=2.0)
    m = ProxyMesh((verts, faces), grid_res=8)
    o = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [5.0, 5.0, 0.0]], np.float32)
    d = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0], [0.0, 0.0, 1.0]], np.float32)
    t = m.render_depth(o, d)
    np.testing.assert_allclose(t[0], 2.0, atol=1e-4)
    assert t[1] == 0.0  # looking away
    assert t[2] == 0.0  # miss


def test_native_matches_numpy_oracle():
    verts, faces = make_sphere_mesh()
    m_native = ProxyMesh((verts, faces), grid_res=16)
    m_np = ProxyMesh((verts, faces), force_numpy=True)
    rng = np.random.RandomState(0)
    o = rng.randn(64, 3).astype(np.float32) * 0.1 + np.array([0, 0, -3], np.float32)
    d = np.tile(np.array([[0, 0, 1]], np.float32), (64, 1)) + rng.randn(64, 3).astype(np.float32) * 0.05
    t_nat = m_native.render_depth(o, d)
    t_np = m_np.render_depth(o, d)
    hit = t_np > 0
    assert hit.sum() > 30
    np.testing.assert_allclose(t_nat[hit], t_np[hit], atol=1e-3)
    assert (t_nat[~hit] == 0).all()


def test_render_mask_semantics():
    verts, faces = unit_quad(z=2.0)
    m = ProxyMesh((verts, faces), grid_res=8)
    # tile AABB centered at origin, half-size 1
    m.set(np.zeros(3), np.ones(3))
    o = np.array(
        [
            [0.0, 0.0, -5.0],  # mesh (z=2) behind tile exit (z=1): True
            [0.0, 0.0, 0.0],  # origin inside tile: True
            [0.0, 5.0, -5.0],  # misses tile and mesh: depth==0 -> True
        ],
        np.float32,
    )
    d = np.tile(np.array([[0, 0, 1]], np.float32), (3, 1))
    mask = m.render_mask(o, d, trust_mesh=True)
    assert mask.tolist() == [True, True, True]
    # mesh in FRONT of the tile: blocked -> False
    verts2, faces2 = unit_quad(z=-2.0)
    m2 = ProxyMesh((verts2, faces2), grid_res=8)
    m2.set(np.zeros(3), np.ones(3))
    o2 = np.array([[0.0, 0.0, -5.0]], np.float32)
    mask2 = m2.render_mask(o2, d[:1], trust_mesh=True)
    assert mask2.tolist() == [False]


def test_bg_depth_and_sampling():
    # two quads: near z=2 (inside-ish) and far z=6 (background)
    v1, f1 = unit_quad(z=2.0, half=3.0)
    v2, f2 = unit_quad(z=6.0, half=3.0)
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2 + 4])
    m = ProxyMesh((verts, faces), grid_res=16)
    m.set(np.array([0, 0, 2.0], np.float32), np.ones(3, np.float32) * 1.5)
    o = np.array([[0.0, 0.0, 0.0]], np.float32)
    d = np.array([[0.0, 0.0, 1.0]], np.float32)
    bg_z, has_bg, bounds = m.compute_bgdepth_batch(o, d)
    assert bool(has_bg[0])
    # tile exit at z=3.5; bg mesh at z=6 -> bg depth ~ 2.5 + 3.5 = 6
    np.testing.assert_allclose(bg_z[0], 6.0, atol=0.05)
    z, valid = m.background_sampling(o, d, 16, sample_range=1.0)
    assert bool(valid[0])
    assert (z[0] >= 3.5 - 1e-3).all() and (z[0] <= 6.6).all()


def test_voxelize():
    verts, faces = unit_quad(z=0.0, half=0.9)
    m = ProxyMesh((verts, faces), grid_res=8)
    occ, outside = m.voxelize(
        np.array([3, 3, 3]), np.array([-1.0, -1.0, -1.0]), np.array([2.0, 2.0, 2.0])
    )
    assert occ.shape == (8, 8, 8)
    # quad spans z=0 plane -> z-cells around index 3/4 occupied
    assert occ[:, :, 3].sum() + occ[:, :, 4].sum() > 0
    assert occ[:, :, 0].sum() == 0 and occ[:, :, 7].sum() == 0
    # numpy fallback agrees
    m2 = ProxyMesh((verts, faces), force_numpy=True)
    occ2, _ = m2.voxelize(
        np.array([3, 3, 3]), np.array([-1.0, -1.0, -1.0]), np.array([2.0, 2.0, 2.0])
    )
    np.testing.assert_array_equal(occ, occ2)


def test_voxelize_no_mesh_all_true(tmp_path):
    occ, outside = voxelize_mesh(
        np.array([2, 2, 2]), np.zeros(3), np.ones(3), model_path=""
    )
    assert occ.all() and not outside.any()


def test_scene_io_roundtrip(tmp_path):
    from scanerf_tpu.data import io

    ks = np.array([[[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]]] * 3, np.float32)
    c2ws = np.tile(np.eye(3, 4, dtype=np.float32)[None], (3, 1, 1))
    c2ws[:, :, 3] = np.arange(9).reshape(3, 3)
    p = str(tmp_path / "camera.log")
    io.write_campara(p, ks, c2ws, 48, 64)
    ks2, c2ws2, H, W = io.read_campara(p, return_shape=True)
    np.testing.assert_allclose(ks2, ks, atol=1e-5)
    np.testing.assert_allclose(c2ws2, c2ws, atol=1e-5)
    assert (H, W) == (48, 64)

    views = {0: [1, 2, 3], 1: [2, 4]}
    io.write_training_views(str(tmp_path / "tv.txt"), views)
    assert io.read_training_views(str(tmp_path / "tv.txt")) == views

    infos = [
        io.TileInfo(0, np.array([0.0, 1, 2], np.float32), np.array([3.0, 4, 5], np.float32), (32, 4096), True)
    ]
    io.write_tile_info(str(tmp_path / "ti.txt"), infos)
    out = io.read_tile_info(str(tmp_path / "ti.txt"))
    assert out[0].resolution == (32, 4096) and out[0].init_outside
    np.testing.assert_allclose(out[0].corner, [0, 1, 2])


def test_load_cameras_tat(tmp_path):
    import os

    from scanerf_tpu.data.io import load_cameras_tat

    os.makedirs(tmp_path / "pose")
    os.makedirs(tmp_path / "intrinsics")
    c2w = np.eye(4).reshape(-1)
    K = np.diag([100.0, 100.0, 1.0, 1.0]).reshape(-1)
    for i in range(3):
        with open(tmp_path / "pose" / f"{i}.txt", "w") as f:
            f.write(" ".join(str(v) for v in c2w) + "\n")
        with open(tmp_path / "intrinsics" / f"{i}.txt", "w") as f:
            f.write(" ".join(str(v) for v in K) + "\n")
    ks, c2ws = load_cameras_tat(str(tmp_path))
    assert ks.shape == (3, 3, 3) and c2ws.shape == (3, 3, 4)
    np.testing.assert_allclose(ks[0, 0, 0], 100.0)
