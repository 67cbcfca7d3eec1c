"""Mesh/camera rigid+scale alignment (rebuild of ``preprocess/
rectify_mesh.py``): rotate the proxy mesh and cameras by Euler angles
around a chosen center, scale, and write ``mesh_align.ply`` /
``camera_align.log`` / ``align_info.txt``. Uses the in-repo PLY IO
instead of trimesh/pyembree."""

from __future__ import annotations

import os

import numpy as np

from scanerf_tpu.data import io as data_io
from scanerf_tpu.geometry import ply


def euler_rotation(angles_deg) -> np.ndarray:
    ax, ay, az = (np.deg2rad(a) for a in angles_deg)

    def Rx(t):
        return np.array(
            [[1, 0, 0], [0, np.cos(t), -np.sin(t)], [0, np.sin(t), np.cos(t)]]
        )

    def Ry(t):
        return np.array(
            [[np.cos(t), 0, np.sin(t)], [0, 1, 0], [-np.sin(t), 0, np.cos(t)]]
        )

    def Rz(t):
        return np.array(
            [[np.cos(t), -np.sin(t), 0], [np.sin(t), np.cos(t), 0], [0, 0, 1]]
        )

    return Rz(az) @ Ry(ay) @ Rx(ax)


def rectify_mesh(
    mesh_path: str,
    cam_path: str,
    angle=(-90.0, 20.0, 0.0),
    mesh_center=None,
    scale: float = 2.0,
) -> None:
    verts, faces = ply.read_ply(mesh_path)
    ks, c2ws, H, W = data_io.read_campara(cam_path, return_shape=True)

    if mesh_center is None:
        mesh_center = verts.mean(0)
    mesh_center = np.asarray(mesh_center, np.float64)

    R = euler_rotation(angle)
    verts_out = (scale * ((verts - mesh_center) @ R.T)).astype(np.float32)
    Cs = scale * ((c2ws[:, :3, 3] - mesh_center) @ R.T)
    Rs = R @ c2ws[:, :3, :3]
    c2ws_out = np.concatenate([Rs, Cs[..., None]], -1).astype(np.float32)

    mesh_dir = os.path.dirname(mesh_path)
    ply.write_ply(os.path.join(mesh_dir, "mesh_align.ply"), verts_out, faces)
    with open(os.path.join(mesh_dir, "align_info.txt"), "w") as f:
        f.write(f"center: {mesh_center[0]} {mesh_center[1]} {mesh_center[2]}\n")
        f.write(f"angle: {angle[0]} {angle[1]} {angle[2]}\n")
        f.write(f"scale: {scale}\n")
    data_io.write_campara(
        os.path.join(os.path.dirname(cam_path), "camera_align.log"),
        ks, c2ws_out, H, W,
    )


def main():
    import sys

    rectify_mesh(sys.argv[1], sys.argv[2])


if __name__ == "__main__":
    main()
