"""Proxy-mesh engine: Python facade over the native C++ grid tracer.

Rebuild of the reference's ``fastMesh`` package (``fastMesh/__init__.py``,
``fastMesh/src/fastMesh_kernel.cu``). The proxy mesh participates only in
host-side preprocessing of the TPU pipeline (occlusion masks, background
depths, tile allocation, voxelization) — never inside the jitted training
step — so the engine is a C++/OpenMP uniform-grid DDA compiled at import
time (ctypes), with a vectorized NumPy brute-force fallback for small
test meshes.

Facade semantics mirror ``fastMesh/__init__.py``:
- ``render_depth``: first-hit depth (0 = miss).
- ``render_mask``: occlusion logic
  ``((enter > t_exit_tile) & hit) | (enter == 0/-1 miss) | origin inside``
  (:25-45).
- ``compute_bgdepth_batch``: depth of mesh *behind* the tile exit, 1000
  when the ray sees sky (:55-77).
- ``background_sampling``: uniform window
  ``[max(exit, bg_depth - r/2), bg_depth + r/2]`` (:79-87 +
  ``cuda/sample_kernel.cu:17-68``).
- ``voxelize``: occupancy of a target grid via 1.5x-dilated triangle
  AABBs with optional outside-init (``cuda/include/voxelize.h``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from scanerf_tpu.geometry.ply import read_ply

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libmesh_engine.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "mesh_engine.cpp")


def _build_native() -> str | None:
    if os.path.exists(_SO_PATH) and os.path.getmtime(_SO_PATH) >= os.path.getmtime(
        _SRC_PATH
    ):
        return _SO_PATH
    try:
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
                "-std=c++17", _SRC_PATH, "-o", _SO_PATH,
            ],
            check=True,
            capture_output=True,
        )
        return _SO_PATH
    except Exception:
        return None


_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        so = _build_native()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.mesh_build.restype = ctypes.c_void_p
        lib.mesh_build.argtypes = [f32p, ctypes.c_int, i32p, ctypes.c_int, ctypes.c_int]
        lib.mesh_free.argtypes = [ctypes.c_void_p]
        lib.mesh_scene_bound.argtypes = [ctypes.c_void_p, f32p]
        lib.mesh_trace.argtypes = [
            ctypes.c_void_p, f32p, f32p, ctypes.c_int, f32p, ctypes.c_int,
        ]
        lib.mesh_voxelize.argtypes = [
            ctypes.c_void_p, i32p, f32p, f32p, u8p, ctypes.c_int, u8p,
        ]
        _lib = lib
    return _lib


def _cptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


class ProxyMesh:
    """Uniform-grid ray engine over a triangle mesh."""

    def __init__(
        self,
        path_or_mesh,
        grid_res: int = 64,
        force_numpy: bool = False,
    ):
        if isinstance(path_or_mesh, str):
            verts, faces = read_ply(path_or_mesh)
        else:
            verts, faces = path_or_mesh
        self.verts = np.ascontiguousarray(verts, np.float32)
        self.faces = np.ascontiguousarray(faces, np.int32)
        self.grid_res = grid_res
        self._handle = None
        self._lib = None if force_numpy else _get_lib()
        if self._lib is not None:
            self._handle = self._lib.mesh_build(
                _cptr(self.verts, ctypes.c_float), len(self.verts),
                _cptr(self.faces, ctypes.c_int), len(self.faces), grid_res,
            )
        # tile AABB for mask/bg queries (set by `set`)
        self.bbox_center: np.ndarray | None = None
        self.bbox_half: np.ndarray | None = None

    def __del__(self):
        if self._handle is not None and self._lib is not None:
            try:
                self._lib.mesh_free(self._handle)
            except Exception:
                pass

    # -- setup ----------------------------------------------------------

    def set(self, bbox_center, bbox_half) -> None:
        """Tile AABB used for mask/bg queries (fastMesh/__init__.py:14-16;
        the reference passes half-size as `bbox_size`)."""
        self.bbox_center = np.asarray(bbox_center, np.float32)
        self.bbox_half = np.asarray(bbox_half, np.float32)

    def get_sceneinfo(self) -> tuple[np.ndarray, np.ndarray]:
        """(scene bbox min, max)."""
        if self._handle is not None:
            out = np.zeros(6, np.float32)
            self._lib.mesh_scene_bound(self._handle, _cptr(out, ctypes.c_float))
            return out[:3], out[3:]
        pad = (self.verts.max(0) - self.verts.min(0)) * 1e-4 + 1e-6
        return self.verts.min(0) - pad, self.verts.max(0) + pad

    # -- queries --------------------------------------------------------

    def _trace(self, rays_o, rays_d, mode: int) -> np.ndarray:
        rays_o = np.ascontiguousarray(rays_o, np.float32)
        rays_d = np.ascontiguousarray(rays_d, np.float32)
        n = rays_o.shape[0]
        if self._handle is not None:
            out = np.zeros(n, np.float32)
            self._lib.mesh_trace(
                self._handle,
                _cptr(rays_o, ctypes.c_float), _cptr(rays_d, ctypes.c_float),
                n, _cptr(out, ctypes.c_float), mode,
            )
            return out
        return self._trace_numpy(rays_o, rays_d, mode)

    def _trace_numpy(self, rays_o, rays_d, mode: int) -> np.ndarray:
        """Brute-force Moller-Trumbore over all triangles (test fallback)."""
        v0 = self.verts[self.faces[:, 0]][None]  # [1, F, 3]
        v1 = self.verts[self.faces[:, 1]][None]
        v2 = self.verts[self.faces[:, 2]][None]
        o = rays_o[:, None, :]
        d = rays_d[:, None, :]
        e1, e2 = v1 - v0, v2 - v0
        p = np.cross(d, e2)
        det = np.sum(e1 * p, -1)
        inv = np.where(np.abs(det) > 1e-7, 1.0 / np.where(det == 0, 1, det), 0.0)
        tv = o - v0
        u = np.sum(tv * p, -1) * inv
        q = np.cross(tv, e1)
        v = np.sum(d * q, -1) * inv
        t = np.sum(e2 * q, -1) * inv
        hit = (np.abs(det) > 1e-7) & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t > 1e-6)
        t = np.where(hit, t, np.inf)
        tmin = t.min(axis=1)
        if mode == 1:
            return np.where(np.isfinite(tmin), tmin, -1.0).astype(np.float32)
        return np.where(np.isfinite(tmin), tmin, 0.0).astype(np.float32)

    def render_depth(self, rays_o, rays_d) -> np.ndarray:
        """First-hit depth [N]; 0 = miss (fastMesh/__init__.py:22-26)."""
        return self._trace(rays_o, rays_d, 0)

    def first_enter(self, rays_o, rays_d) -> np.ndarray:
        """Conservative first-entry t [N]; miss < 0."""
        return self._trace(rays_o, rays_d, 1)

    def _tile_bounds(self, rays_o, rays_d) -> np.ndarray:
        from scanerf_tpu.ops.intersect import ray_aabb
        import jax.numpy as jnp

        b = ray_aabb(
            jnp.asarray(rays_o), jnp.asarray(rays_d),
            jnp.asarray(self.bbox_center), jnp.asarray(self.bbox_half),
        )
        return np.asarray(b)

    def render_mask(self, rays_o, rays_d, trust_mesh: bool = False) -> np.ndarray:
        """Per-ray occlusion mask (True = trainable) —
        fastMesh/__init__.py:28-45."""
        depth = (
            self.render_depth(rays_o, rays_d)
            if trust_mesh
            else np.maximum(self.first_enter(rays_o, rays_d), 0.0)
        )
        bounds = self._tile_bounds(rays_o, rays_d)
        inside = np.all(
            np.abs(rays_o - self.bbox_center) < self.bbox_half, axis=-1
        )
        t_near = bounds[:, 0]
        return ((depth > t_near) & (t_near != -1)) | (depth == 0) | inside

    def compute_bgdepth_batch(self, rays_o, rays_d):
        """(bg_z [N], has_bg [N], bounds [N,2]) —
        fastMesh/__init__.py:54-77."""
        rays_o = np.array(rays_o, np.float32)
        depth_z = self.render_depth(rays_o, rays_d)
        bounds = self._tile_bounds(rays_o, rays_d)
        valid = bounds[:, 1] != -1
        o2 = rays_o.copy()
        o2[valid] = o2[valid] + bounds[valid, 1:2] * np.asarray(rays_d)[valid]
        bg_z = self.render_depth(o2, rays_d)
        bg_z = np.where(depth_z == 0, 1000.0, bg_z)
        has_bg = (bg_z > 0) & valid
        bg_z = np.where(valid, bg_z + bounds[:, 1], bg_z)
        return bg_z, has_bg, bounds

    def background_sampling(self, rays_o, rays_d, num_sample: int, sample_range: float):
        """Mesh-guided bg samples: uniform window around the mesh depth
        behind the tile (cuda/sample_kernel.cu:17-68). Returns
        (z_vals [N,S] with -1 sentinels, valid [N])."""
        bg_z, valid, bounds = self.compute_bgdepth_batch(rays_o, rays_d)
        start = np.maximum(bounds[:, 1], bg_z - sample_range / 2.0)
        step = sample_range / num_sample
        i = np.arange(num_sample, dtype=np.float32)
        z = start[:, None] + i[None, :] * step
        z = np.where(valid[:, None], z, -1.0).astype(np.float32)
        return z, valid

    def compute_bgdepth(self, rays_o_all, rays_d_all, H: int, W: int) -> np.ndarray:
        """Per-camera background depth maps [N_cam, H, W]
        (fastMesh/__init__.py:98-134)."""
        n_cam = rays_o_all.shape[0]
        out = np.zeros((n_cam, H, W), np.float32)
        for i in range(n_cam):
            bg_z, has_bg, _ = self.compute_bgdepth_batch(
                rays_o_all[i].reshape(-1, 3), rays_d_all[i].reshape(-1, 3)
            )
            bg_z = np.where(has_bg, bg_z, 0.0)
            out[i] = bg_z.reshape(H, W)
        return out

    # -- voxelization ---------------------------------------------------

    def voxelize(
        self,
        log2dim: np.ndarray,
        corner: np.ndarray,
        size: np.ndarray,
        init_outside: bool = False,
    ) -> tuple[np.ndarray, np.ndarray]:
        """(occupied [Rx,Ry,Rz] bool, outside [same]) —
        cuda/include/voxelize.h semantics with 1.5x triangle dilation."""
        res = (2 ** np.asarray(log2dim)).astype(np.int32)
        corner = np.asarray(corner, np.float32)
        size = np.asarray(size, np.float32)
        occ = np.zeros(tuple(res), np.uint8)
        outside = np.zeros(tuple(res), np.uint8)
        if self._handle is not None:
            self._lib.mesh_voxelize(
                self._handle, _cptr(res, ctypes.c_int),
                _cptr(corner, ctypes.c_float), _cptr(size, ctypes.c_float),
                _cptr(occ, ctypes.c_uint8), int(init_outside),
                _cptr(outside, ctypes.c_uint8),
            )
        else:
            self._voxelize_numpy(res, corner, size, occ, init_outside, outside)
        return occ.astype(bool), outside.astype(bool)

    def _voxelize_numpy(self, res, corner, size, occ, init_outside, outside):
        cell = size / res
        bmax = corner + size
        tri = self.verts[self.faces]  # [F, 3, 3]
        tmin = tri.min(1)
        tmax = tri.max(1)
        ctr = (tmin + tmax) / 2
        half = (tmax - tmin) * 0.75
        tmin, tmax = ctr - half, ctr + half
        keep = ~np.any((tmax <= corner) | (tmin >= bmax), axis=-1)
        tmin_k, tmax_k = tmin[keep], tmax[keep]
        geo_min = tmin_k.min(0) if len(tmin_k) else np.full(3, np.inf)
        geo_max = tmax_k.max(0) if len(tmax_k) else np.full(3, -np.inf)
        lo = np.clip(((tmin_k - corner) / cell).astype(int), 0, res - 1)
        hi = np.clip(((tmax_k - corner) / cell).astype(int), 0, res - 1)
        for a, b in zip(lo, hi):
            occ[a[0] : b[0] + 1, a[1] : b[1] + 1, a[2] : b[2] + 1] = 1
        if init_outside:
            xs = corner[0] + (np.arange(res[0]) + 0.5) * cell[0]
            ys = corner[1] + (np.arange(res[1]) + 0.5) * cell[1]
            zs = corner[2] + (np.arange(res[2]) + 0.5) * cell[2]
            X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
            out = (
                (X < geo_min[0]) | (Y < geo_min[1]) | (Z < geo_min[2])
                | (X > geo_max[0]) | (Y > geo_max[1]) | (Z > geo_max[2])
            )
            occ |= out.astype(np.uint8)
            outside |= out.astype(np.uint8)


def voxelize_mesh(
    log2dim,
    corner,
    size,
    model_path: str,
    init_outside: bool = False,
    grid_res: int = 64,
) -> tuple[np.ndarray, np.ndarray]:
    """Drop-in equivalent of the reference ``voxelize_mesh`` free function:
    empty ``model_path`` -> all-occupied grid (voxelize.h:111-117)."""
    res = tuple(int(2**d) for d in np.asarray(log2dim))
    if not model_path:
        return np.ones(res, bool), np.zeros(res, bool)
    mesh = ProxyMesh(model_path, grid_res=grid_res)
    return mesh.voxelize(log2dim, corner, size, init_outside)
