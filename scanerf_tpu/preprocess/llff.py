"""LLFF pose utilities: COLMAP -> poses_bounds.npy and the LLFF loader.

Rebuild of the reference's vendored LLFF subtree
(``tools/poses/pose_utils.py``): ``gen_poses`` converts a COLMAP sparse
reconstruction into the LLFF ``poses_bounds.npy`` format (camera-to-world
[3,4] in the [-u, r, -t] axis convention + hwf column + per-view near/far
depth percentiles of the visible sparse points), and ``load_llff_data``
reads such a dataset back. Differences from the reference:

- no COLMAP invocation (``colmap_wrapper.run_colmap``): this module only
  converts an EXISTING ``sparse/0`` reconstruction (run COLMAP out of
  band; the binary is not part of this framework),
- image minification is a pure-numpy box filter instead of shelling out
  to ImageMagick ``mogrify`` (``pose_utils.py:minify``).
"""

from __future__ import annotations

import os

import numpy as np

from scanerf_tpu.preprocess.colmap import (
    qvec2rotmat,
    read_cameras_binary,
    read_images_binary,
    read_points3d_binary,
)

_IMG_EXTS = (".jpg", ".jpeg", ".png", ".JPG", ".JPEG", ".PNG")


def _image_files(d: str) -> list[str]:
    return [
        os.path.join(d, f)
        for f in sorted(os.listdir(d))
        if f.endswith(_IMG_EXTS)
    ]


def load_colmap_llff(realdir: str):
    """COLMAP sparse/0 -> (poses [3,5,N], pts3d dict, perm).

    Mirrors ``pose_utils.load_colmap_data``: c2w mats in the LLFF
    [-u, r, -t] convention with the hwf column appended.
    """
    sparse = os.path.join(realdir, "sparse/0")
    camdata = read_cameras_binary(os.path.join(sparse, "cameras.bin"))
    cam = camdata[sorted(camdata.keys())[0]]
    hwf = np.array([cam.height, cam.width, cam.params[0]]).reshape(3, 1)

    imdata = read_images_binary(os.path.join(sparse, "images.bin"))
    names = [imdata[k].name for k in imdata]
    perm = np.argsort(names)
    bottom = np.array([0, 0, 0, 1.0]).reshape(1, 4)
    w2c = []
    for k in imdata:
        im = imdata[k]
        R = qvec2rotmat(im.qvec)
        t = im.tvec.reshape(3, 1)
        w2c.append(np.concatenate([np.concatenate([R, t], 1), bottom], 0))
    c2w = np.linalg.inv(np.stack(w2c))
    poses = c2w[:, :3, :4].transpose(1, 2, 0)
    poses = np.concatenate(
        [poses, np.tile(hwf[..., None], (1, 1, poses.shape[-1]))], 1
    )
    # [r, -u, t] -> [-u, r, -t] (pose_utils.py:52)
    poses = np.concatenate(
        [poses[:, 1:2], poses[:, 0:1], -poses[:, 2:3], poses[:, 3:4],
         poses[:, 4:5]], 1
    )
    pts3d = read_points3d_binary(os.path.join(sparse, "points3D.bin"))
    return poses, pts3d, perm


def save_poses_bounds(basedir: str, poses, pts3d, perm) -> np.ndarray:
    """Write ``poses_bounds.npy`` (``pose_utils.save_poses``): one row per
    view, [poses[...,i].ravel(), near, far] with near/far the 0.1/99.9
    depth percentiles of the view's visible sparse points."""
    n_views = poses.shape[-1]
    pts_arr = np.stack([p.xyz for p in pts3d.values()])
    vis_arr = np.zeros((len(pts3d), n_views), np.int64)
    for i, p in enumerate(pts3d.values()):
        for ind in p.image_ids:
            if ind - 1 >= n_views:
                raise ValueError(
                    "point visibility references image id past the pose "
                    f"count ({ind} > {n_views})")
            vis_arr[i, ind - 1] = 1

    zvals = np.sum(
        -(pts_arr[:, None, :].transpose(2, 0, 1) - poses[:3, 3:4, :])
        * poses[:3, 2:3, :],
        0,
    )  # [P, N]
    save_arr = []
    for i in perm:
        zs = zvals[:, i][vis_arr[:, i] == 1]
        close, inf = np.percentile(zs, 0.1), np.percentile(zs, 99.9)
        save_arr.append(
            np.concatenate([poses[..., i].ravel(), [close, inf]])
        )
    out = np.array(save_arr)
    np.save(os.path.join(basedir, "poses_bounds.npy"), out)
    return out


def gen_poses(basedir: str) -> np.ndarray:
    """COLMAP sparse/0 -> poses_bounds.npy (``pose_utils.gen_poses`` minus
    the COLMAP invocation)."""
    poses, pts3d, perm = load_colmap_llff(basedir)
    return save_poses_bounds(basedir, poses, pts3d, perm)


def _box_downsample(img: np.ndarray, f: int) -> np.ndarray:
    h, w = img.shape[:2]
    img = img[: h // f * f, : w // f * f]
    sh = (h // f, f, w // f, f) + img.shape[2:]
    return img.reshape(sh).mean(axis=(1, 3))


def _imread_rgb(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return img[..., ::-1]  # BGR -> RGB (LLFF stores RGB)


def minify(basedir: str, factor: int) -> str:
    """images/ -> images_{factor}/ with a box filter (numpy stand-in for
    the reference's ImageMagick ``mogrify`` call). Returns the dir."""
    import cv2

    outdir = os.path.join(basedir, f"images_{factor}")
    if os.path.exists(outdir):
        return outdir
    os.makedirs(outdir)
    for f in _image_files(os.path.join(basedir, "images")):
        img = _imread_rgb(f).astype(np.float64)
        down = _box_downsample(img, factor)
        name = os.path.splitext(os.path.basename(f))[0] + ".png"
        cv2.imwrite(
            os.path.join(outdir, name),
            down.astype(np.uint8)[..., ::-1],
        )
    return outdir


def load_llff_data(
    basedir: str, factor: int | None = None, load_imgs: bool = True
):
    """Read an LLFF-format dataset (``pose_utils.load_data``).

    Returns (poses [3,5,N], bds [2,N], imgs [H,W,3,N] float in [0,1]) —
    imgs omitted when ``load_imgs=False``.
    """
    imread = _imread_rgb
    poses_arr = np.load(os.path.join(basedir, "poses_bounds.npy"))
    poses = poses_arr[:, :-2].reshape(-1, 3, 5).transpose(1, 2, 0)
    bds = poses_arr[:, -2:].transpose(1, 0)

    if factor is not None and factor > 1:
        imgdir = minify(basedir, factor)
    else:
        factor = 1
        imgdir = os.path.join(basedir, "images")
    imgfiles = _image_files(imgdir)
    if poses.shape[-1] != len(imgfiles):
        raise ValueError(
            f"{len(imgfiles)} images vs {poses.shape[-1]} poses in {basedir}"
        )

    sh = imread(imgfiles[0]).shape
    poses[:2, 4, :] = np.array(sh[:2]).reshape(2, 1)
    poses[2, 4, :] = poses[2, 4, :] / factor
    if not load_imgs:
        return poses, bds
    imgs = np.stack(
        [imread(f)[..., :3] / 255.0 for f in imgfiles], -1
    )
    return poses, bds, imgs


def llff_to_cameras(poses: np.ndarray):
    """LLFF [3,5,N] poses -> (c2w [N,4,4] OpenCV-convention, K [N,3,3]).

    Bridge into this framework's camera.log convention (data/io.py):
    LLFF stores [-u, r, -t] columns; OpenCV wants [r, -u, t]
    (undoes pose_utils.py:52)."""
    n = poses.shape[-1]
    p = poses.transpose(2, 0, 1)  # [N, 3, 5]
    c2w = np.tile(np.eye(4), (n, 1, 1))
    # LLFF cols [-u, r, -t] -> OpenCV cols [r, -u, t]
    # (exact inverse of the pose_utils.py:52 permutation)
    c2w[:, :3, 0] = p[:, :, 1]
    c2w[:, :3, 1] = p[:, :, 0]
    c2w[:, :3, 2] = -p[:, :, 2]
    c2w[:, :3, 3] = p[:, :, 3]
    h, w, f = p[:, 0, 4], p[:, 1, 4], p[:, 2, 4]
    K = np.zeros((n, 3, 3))
    K[:, 0, 0] = f
    K[:, 1, 1] = f
    K[:, 0, 2] = w / 2.0
    K[:, 1, 2] = h / 2.0
    K[:, 2, 2] = 1.0
    return c2w, K
