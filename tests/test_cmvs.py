"""CMVS interchange: Bundler round-trip, SKE parsing, cluster export."""

import os

import numpy as np

from scanerf_tpu.preprocess import cmvs


def _rand_w2c(rng, n):
    out = []
    for _ in range(n):
        a = rng.normal(size=(3, 3))
        q, _ = np.linalg.qr(a)
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        t = rng.normal(size=(3, 1))
        out.append(np.concatenate([q, t], axis=1))
    return np.asarray(out, np.float32)


def test_bundle_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n_cam, n_pts = 5, 11
    intr = np.abs(rng.normal(size=(n_cam, 3))).astype(np.float32) * 100
    w2c = _rand_w2c(rng, n_cam)
    pts = np.concatenate(
        [rng.normal(size=(n_pts, 3)), rng.integers(0, 255, (n_pts, 3))],
        axis=1).astype(np.float32)
    tracks = [
        [(int(rng.integers(0, n_cam)), j, 1.5, -2.5) for j in range(2)]
        for _ in range(n_pts)
    ]
    path = str(tmp_path / "bundle.rd.out")
    cmvs.write_bundle(path, intr, w2c, pts, tracks)
    intr2, w2c2, pts2, vis = cmvs.read_bundle(path)
    np.testing.assert_allclose(intr2, intr, rtol=1e-6)
    np.testing.assert_allclose(w2c2, w2c, rtol=1e-6)
    np.testing.assert_allclose(pts2, pts, rtol=1e-6)
    # visibility inverts the tracks
    want = [[] for _ in range(n_cam)]
    for p, track in enumerate(tracks):
        for cam_i, *_ in track:
            want[cam_i].append(p)
    assert [sorted(v) for v in vis] == [sorted(w) for w in want]


def test_w2c_c2w_inverse():
    rng = np.random.default_rng(1)
    w2c = _rand_w2c(rng, 4)
    c2w = cmvs.w2c_to_c2w(w2c)
    # composing both directions gives identity on points
    p = rng.normal(size=(7, 3))
    ph = np.concatenate([p, np.ones((7, 1))], 1)
    cam = ph @ w2c[2].T
    camh = np.concatenate([cam, np.ones((7, 1))], 1)
    back = camh @ c2w[2].T
    np.testing.assert_allclose(back, p, atol=1e-5)


def test_ske_and_cluster_export(tmp_path):
    rng = np.random.default_rng(2)
    n_cam, n_pts = 6, 40
    intr = np.tile(np.array([[120.0, 0.0, 0.0]], np.float32), (n_cam, 1))
    w2c = _rand_w2c(rng, n_cam)
    pts = np.concatenate(
        [rng.normal(size=(n_pts, 3)) * 3,
         np.zeros((n_pts, 3))], axis=1).astype(np.float32)
    # every point visible in 2 cameras
    tracks = [
        [(i % n_cam, 0, 0.0, 0.0), ((i + 1) % n_cam, 0, 0.0, 0.0)]
        for i in range(n_pts)
    ]
    data_dir = str(tmp_path)
    cmvs.write_bundle(os.path.join(data_dir, "bundle.rd.out"),
                      intr, w2c, pts, tracks)
    with open(os.path.join(data_dir, "ske.dat"), "w") as f:
        f.write("SKE\n")
        f.write(f"{n_cam} 2\n")
        f.write("3 0\n0 1 2\n")
        f.write("3 0\n3 4 5\n")

    out = cmvs.cmvs_to_training(data_dir)
    for name, members in (("0", [0, 1, 2]), ("1", [3, 4, 5]),
                          ("all", list(range(n_cam)))):
        cdir = os.path.join(out, name)
        c2ws = np.load(os.path.join(cdir, "c2ws.npy"))
        focals = np.load(os.path.join(cdir, "focals.npy"))
        bds = np.load(os.path.join(cdir, "bds.npy"))
        assert c2ws.shape == (len(members), 3, 4)
        np.testing.assert_allclose(
            c2ws, cmvs.w2c_to_c2w(w2c[np.asarray(members)]), rtol=1e-5)
        assert focals.shape == (len(members),)
        assert bds.shape == (2,) and bds[0] < bds[1]
