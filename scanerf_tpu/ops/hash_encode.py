"""Multiresolution hash encoding (Instant-NGP style) in pure JAX.

Numerical spec mirrors ``hashgrid/src/hashgrid_bg_kernel.cu``:

- input points live in [-2, 2]^3 and are normalized as (p+2)/4
  (``hashgrid_bg_kernel.cu:127``),
- per level, the cell lattice is ``res - 1`` (corner-anchored):
  ``v = u * (res-1)``; the 8 corner indices are hashed with the prime-XOR
  hash ``x*1 ^ y*2654435761 ^ z*805459861 & (H-1)``
  (``hashgrid_bg_kernel.cu:14-24``),
- trilinear interpolation of the 8 corner features
  (``hashgrid_bg_kernel.cu:26-38``).

Per-axis (anisotropic) integer resolutions per level are supported, as the
reference derives them from the tile bbox aspect (``hashgrid/__init__.py:
56-57``, ``PyHashGridBG.py:56-62``).

The forward is a batched gather; the backward (via JAX autodiff) becomes a
scatter-add into the table — exactly the semantics of the CUDA backward
kernel's atomicAdd (``hashgrid_bg_kernel.cu:195-222``), including the
analytic dL/dpoints path.

This module is the "xla" backend (exact reference hash). The TPU
production path is ``scanerf_tpu.ops.pallas.hash_encode``: a sorted-stream
Pallas kernel over a *hierarchical window* variant of this hash (same
collision ratio, different table layout — NOT numerically interchangeable
with the global prime-XOR indexing here; see that module's docstring and
PARITY.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

PRIMES = (1, 2654435761, 805459861)


def as_3d(features: jax.Array, n_features: int = 2) -> jax.Array:
    """Normalize a hash table to [L, H, F].

    The canonical TRAINING-STATE shape is flat [L, H*F]: any f32 array
    with a trailing dim of 2 that XLA materializes at a jit boundary
    gets a T(2,128) tiled layout with 8x padding (measured: 512 MB per
    per-tile table copy in the trainer's shard_fn, an instant OOM at
    city scale). State, gradients, and optimizer moments therefore stay
    flat; the [L, H, F] view exists only inside compute that needs it.
    """
    if features.ndim == 2:
        L, HF = features.shape
        return features.reshape(L, HF // n_features, n_features)
    return features


def table_rows(features: jax.Array, n_features: int = 2) -> int:
    """Hash-table row count H for either layout ([L, H, F] or flat [L, H*F])."""
    if features.ndim == 2:
        return features.shape[1] // n_features
    return features.shape[1]

# corner order matches linear_weight(): 000 001 010 011 100 101 110 111
_CORNERS = np.array(
    [
        [0, 0, 0],
        [0, 0, 1],
        [0, 1, 0],
        [0, 1, 1],
        [1, 0, 0],
        [1, 0, 1],
        [1, 1, 0],
        [1, 1, 1],
    ],
    dtype=np.int32,
)


def hash_index(loc: jax.Array, hashmap_size: int) -> jax.Array:
    """Prime-XOR spatial hash of integer coords ``[..., 3]`` -> uint32."""
    loc = loc.astype(jnp.uint32)
    h = (
        loc[..., 0] * jnp.uint32(PRIMES[0])
        ^ loc[..., 1] * jnp.uint32(PRIMES[1])
        ^ loc[..., 2] * jnp.uint32(PRIMES[2])
    )
    return h & jnp.uint32(hashmap_size - 1)


def make_level_resolutions(
    base_resolution: np.ndarray, finest_resolution: np.ndarray, n_levels: int = 16
) -> np.ndarray:
    """Geometric per-level per-axis resolutions (``PyHashGridBG.py:56-62``)."""
    base = np.asarray(base_resolution, dtype=np.float64).reshape(3)
    finest = np.asarray(finest_resolution, dtype=np.float64).reshape(3)
    b = np.exp((np.log(finest) - np.log(base)) / (n_levels - 1))
    levels = [(base * b**i).astype(np.int32) for i in range(n_levels)]
    return np.stack(levels, axis=0)  # [L, 3]


def _encode_one_level(
    points: jax.Array, table: jax.Array, resolution: jax.Array
) -> jax.Array:
    """One level: hash + trilinear gather. points [N,3] in [-2,2],
    table [H,F], resolution [3] -> [N,F]."""
    H, F = table.shape
    u = (points + 2.0) / 4.0
    v = u * (resolution.astype(points.dtype) - 1.0)  # [N, 3]
    bl = jnp.floor(v)
    off = v - bl  # [N, 3]
    bl = bl.astype(jnp.uint32)

    # per-axis hashed terms: hash(bl + c) = hx[cx] ^ hy[cy] ^ hz[cz].
    # avoids materializing [N, 8, 3] integer corner coords.
    p = [jnp.uint32(q) for q in PRIMES]
    hx = jnp.stack([bl[:, 0] * p[0], (bl[:, 0] + 1) * p[0]], axis=-1)  # [N,2]
    hy = jnp.stack([bl[:, 1] * p[1], (bl[:, 1] + 1) * p[1]], axis=-1)
    hz = jnp.stack([bl[:, 2] * p[2], (bl[:, 2] + 1) * p[2]], axis=-1)

    corners = jnp.asarray(_CORNERS)  # [8, 3], x-major order
    cxb, cyb, czb = corners[:, 0], corners[:, 1], corners[:, 2]
    h = (
        hx[:, cxb] ^ hy[:, cyb] ^ hz[:, czb]
    ) & jnp.uint32(H - 1)  # [N, 8]

    ox, oy, oz = off[:, 0:1], off[:, 1:2], off[:, 2:3]  # [N, 1]
    cx = cxb.astype(points.dtype)
    cy = cyb.astype(points.dtype)
    cz = czb.astype(points.dtype)
    w = (
        (cx * ox + (1 - cx) * (1 - ox))
        * (cy * oy + (1 - cy) * (1 - oy))
        * (cz * oz + (1 - cz) * (1 - oz))
    )  # [N, 8]

    gathered = table[h.astype(jnp.int32)]  # [N, 8, F]
    return jnp.sum(w[..., None] * gathered, axis=1)  # [N, F]


def hash_encode(
    points: jax.Array, features: jax.Array, resolutions: jax.Array
) -> jax.Array:
    """Encode points through all hash levels.

    Args:
        points: [N, 3] in [-2, 2].
        features: [L, H, F] hash tables (H a power of two).
        resolutions: [L, 3] int32 per-axis lattice resolutions.

    Returns:
        [N, L*F] interpolated features (level-major: l0f0 l0f1 l1f0 ...).

    Levels are processed under lax.scan so peak memory is one level's
    [N, 8, F] gather rather than all 16 at once (with 2M points per train
    step the fully materialized form is tens of GB). The backward pass is
    one scatter-add per level into its own table slice — the same
    semantics as the CUDA atomicAdd backward
    (``hashgrid_bg_kernel.cu:195-222``).
    """
    features = as_3d(features)
    L, H, F = features.shape
    N = points.shape[0]

    # remat: without it, autodiff saves each level's [N, 8, F] gather and
    # [N, 8] weights as scan residuals (tens of GB at 2M points/step);
    # recomputing the gather in the backward is far cheaper than spilling.
    encode_level = jax.checkpoint(_encode_one_level)

    def body(carry, xs):
        table, resolution = xs
        return carry, encode_level(points, table, resolution)

    _, out = jax.lax.scan(body, None, (features, resolutions))  # [L, N, F]
    return jnp.transpose(out, (1, 0, 2)).reshape(N, L * F)


# ---------------------------------------------------------------------------
# stochastic-corner backward (TPU scatter-count reduction)
# ---------------------------------------------------------------------------
# XLA's scatter-add on TPU processes ~12M rows/s (PERF.md); the exact
# backward scatters N*L*8 rows per step. This variant keeps the forward
# exactly trilinear but, in the backward, routes each (point, level)'s
# table gradient through ONE corner c sampled with probability w_c
# (the trilinear weight), scaled by 1/1 — i.e. the update is
# dL * 1[c] with E[1[c]] = w_c, an unbiased estimator of the exact
# per-corner updates dL * w_c — cutting scatter rows 8x. The corner is
# chosen by a deterministic hash of the point bits (new points every
# step => fresh randomization). dL/dpoints keeps the exact analytic
# form (cheap: recomputed from the forward's gathered values).

def _corner_sample_u(points: jax.Array) -> jax.Array:
    """Deterministic pseudo-random uniform in [0,1) per point from the
    float bit pattern (varies per step since ray batches vary)."""
    bits = jax.lax.bitcast_convert_type(points, jnp.uint32)  # [N, 3]
    h = (
        bits[:, 0] * jnp.uint32(0x9E3779B1)
        ^ bits[:, 1] * jnp.uint32(0x85EBCA77)
        ^ bits[:, 2] * jnp.uint32(0xC2B2AE3D)
    )
    h = h ^ (h >> 15)
    return h.astype(jnp.float32) / jnp.float32(4294967296.0)


@jax.custom_vjp
def hash_encode_stoch(points, features, resolutions):
    return hash_encode(points, features, resolutions)


def _hes_fwd(points, features, resolutions):
    return hash_encode(points, features, resolutions), (points, features, resolutions)


def _hes_bwd(res, g):
    points, features, resolutions = res
    in_shape = features.shape
    features = as_3d(features)
    L, H, F = features.shape
    N = points.shape[0]
    g = g.reshape(N, L, F)
    u_sample = _corner_sample_u(points)  # [N]

    def level_bwd(carry, xs):
        table, resolution, g_l = xs  # g_l [N, F]
        u = (points + 2.0) / 4.0
        v = u * (resolution.astype(points.dtype) - 1.0)
        bl = jnp.floor(v)
        off = v - bl
        blu = bl.astype(jnp.uint32)
        p = [jnp.uint32(q) for q in PRIMES]
        hx = jnp.stack([blu[:, 0] * p[0], (blu[:, 0] + 1) * p[0]], -1)
        hy = jnp.stack([blu[:, 1] * p[1], (blu[:, 1] + 1) * p[1]], -1)
        hz = jnp.stack([blu[:, 2] * p[2], (blu[:, 2] + 1) * p[2]], -1)
        corners = jnp.asarray(_CORNERS)
        cxb, cyb, czb = corners[:, 0], corners[:, 1], corners[:, 2]
        h = (hx[:, cxb] ^ hy[:, cyb] ^ hz[:, czb]) & jnp.uint32(H - 1)  # [N, 8]
        ox, oy, oz = off[:, 0:1], off[:, 1:2], off[:, 2:3]
        cx = cxb.astype(points.dtype)
        cy = cyb.astype(points.dtype)
        cz = czb.astype(points.dtype)
        w = (
            (cx * ox + (1 - cx) * (1 - ox))
            * (cy * oy + (1 - cy) * (1 - oy))
            * (cz * oz + (1 - cz) * (1 - oz))
        )  # [N, 8]

        # --- dTable: one sampled corner per point ---
        cdf = jnp.cumsum(w, axis=1)
        corner_id = jnp.sum(
            (cdf < u_sample[:, None] * cdf[:, -1:]).astype(jnp.int32), axis=1
        )
        corner_id = jnp.clip(corner_id, 0, 7)

        # corner selection via bit arithmetic — take_along_axis would be
        # another latency-bound row gather per (point, level)
        def corner_hash(cid):
            bx = (cid >> 2) & 1  # x-major corner order (_CORNERS)
            by = (cid >> 1) & 1
            bz = cid & 1
            sel = lambda pair, b: jnp.where(b == 1, pair[:, 1], pair[:, 0])
            return (sel(hx, bx) ^ sel(hy, by) ^ sel(hz, bz)) & jnp.uint32(H - 1)

        h_sel = corner_hash(corner_id)
        d_table = jnp.zeros((H, F), g_l.dtype).at[h_sel.astype(jnp.int32)].add(g_l)

        # --- dPoints: one UNIFORM-sampled corner (estimator 8 * f(c),
        # bounded variance; the exact form sums f over all 8 corners and
        # would regather every corner) ---
        c2 = jnp.floor(u_sample * 7.9999).astype(jnp.int32)  # [N] uniform 0..7
        h2 = corner_hash(c2)
        T_c = table[h2.astype(jnp.int32)]  # [N, F] single-corner gather
        gv = jnp.sum(T_c * g_l, axis=-1)  # [N]
        # w factorizes per axis: w = wx*wy*wz; dw/d(offset_axis) = sign*rest
        # (per-axis terms of the SAMPLED corner, all elementwise)
        b2x = ((c2 >> 2) & 1).astype(points.dtype)
        b2y = ((c2 >> 1) & 1).astype(points.dtype)
        b2z = (c2 & 1).astype(points.dtype)
        oxf, oyf, ozf = off[:, 0], off[:, 1], off[:, 2]
        wx_c = b2x * oxf + (1 - b2x) * (1 - oxf)
        wy_c = b2y * oyf + (1 - b2y) * (1 - oyf)
        wz_c = b2z * ozf + (1 - b2z) * (1 - ozf)
        sx = 2.0 * b2x - 1.0
        sy = 2.0 * b2y - 1.0
        sz = 2.0 * b2z - 1.0
        dscale = (resolution.astype(points.dtype) - 1.0) / 4.0  # d offset / d point
        dpx = 8.0 * gv * sx * wy_c * wz_c * dscale[0]
        dpy = 8.0 * gv * wx_c * sy * wz_c * dscale[1]
        dpz = 8.0 * gv * wx_c * wy_c * sz * dscale[2]
        d_points = jnp.stack([dpx, dpy, dpz], axis=-1)
        return carry + d_points, d_table

    d_points, d_tables = jax.lax.scan(
        level_bwd,
        jnp.zeros_like(points),
        (features, resolutions, jnp.transpose(g, (1, 0, 2))),
    )
    return d_points, d_tables.reshape(in_shape), None


hash_encode_stoch.defvjp(_hes_fwd, _hes_bwd)


def init_features(
    key: jax.Array, n_levels: int, log2_hashmap_size: int, n_features: int = 2
) -> jax.Array:
    """Xavier-normal init as the reference default (``PyHashGridBG.py:70-76``).

    torch.nn.init.xavier_normal_ treats the tensor as (fan_out, fan_in) =
    (L, H*F); std = sqrt(2 / (fan_in + fan_out)).
    """
    H = 2**log2_hashmap_size
    fan_in = H * n_features
    fan_out = n_levels
    std = float(np.sqrt(2.0 / (fan_in + fan_out)))
    # canonical TRAINING-STATE layout is flat [L, H*F] (see as_3d: a
    # trailing dim of 2 costs 8x layout padding at every jit boundary)
    return std * jax.random.normal(
        key, (n_levels, H * n_features), jnp.float32
    )
