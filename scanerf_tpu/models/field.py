"""Per-tile hybrid neural field: hash encoder + ShallowMLP + occupancy.

JAX rebuild of ``hashgrid/__init__.py`` (class ``HashGrid``) with static
shapes: instead of boolean-compressing valid rays (``rays_o[valid]``),
every ray is rendered and invalid lanes are masked out — the TPU-friendly
equivalent (no dynamic shapes, no recompiles).

Key semantics preserved:
- the tile bbox is DOUBLED to hold a background shell
  (``hashgrid/__init__.py:50``); the inner half is the foreground,
- fg contraction maps the inner bbox linearly to [-1, 1]
  (``contract_fore`` :394-395); bg contraction is the mip360-style
  L-infinity squash ``x * (2 - 1/|x|_inf) / |x|_inf`` over [-2, 2]
  (``contract_bg`` :397-411),
- BARF feature annealing over the 16 levels
  (``weight_feature`` :228-235): alpha(step) = clip(step/10000*8+8, 0, 16),
- foreground sampling walks the occupancy grid over the INNER bbox
  (:278-285); background uses inverse-z beyond the full bbox (:305-337),
- composition and the specular L2 regularizer match
  ``render_batch_rays`` :512-596.
"""

from __future__ import annotations

from typing import Callable

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from scanerf_tpu.models import decoder as decoder_lib
from scanerf_tpu.ops import integrate, sampling
from scanerf_tpu.ops.hash_encode import (
    hash_encode,
    hash_encode_stoch,
    init_features,
    make_level_resolutions,
    table_rows,
)

N_LEVELS = 16
N_FEATURES = 2
FEAT_DIM = N_LEVELS * N_FEATURES  # 32


@flax.struct.dataclass
class FieldParams:
    """Trainable per-tile parameters."""

    features: jax.Array  # canonical flat [L, H*F] (hash_encode.as_3d)
    decoder: dict  # ShallowMLP params


@flax.struct.dataclass
class FieldState:
    """Non-trainable per-tile field state."""

    resolutions: jax.Array  # [L, 3] int32 hash lattice resolutions
    min_bbox: jax.Array  # [3] corner of the DOUBLED bbox
    bbox_size: jax.Array  # [3] size of the DOUBLED bbox
    occupied_grid: jax.Array  # [Rx, Ry, Rz] bool over the INNER bbox


def compute_sampler_log2dim(bbox_size2: np.ndarray, sampler_log2dim: int) -> np.ndarray:
    """Anisotropic grid dims (``hashgrid/__init__.py:70``)."""
    bbox_size2 = np.asarray(bbox_size2, dtype=np.float64)
    return (
        sampler_log2dim
        - np.log2(bbox_size2.max() / bbox_size2).astype(np.int32)
    )


def create_field(
    key: jax.Array,
    bbox_corner: np.ndarray,
    bbox_size: np.ndarray,
    log2_hashmap_size: int = 24,
    grid_resolution: tuple[int, int] = (32, 2048),
    sampler_log2dim: int = 4,
    occupied_grid: np.ndarray | None = None,
    cubic_grid: bool = False,
) -> tuple[FieldParams, FieldState]:
    """Build a tile field (mirrors ``HashGrid.__init__`` :32-92).

    ``cubic_grid=True`` forces the same occupancy log2dim on every axis so
    tiles of different aspect stack into one pytree for the tile-parallel
    mesh (the reference uses anisotropic dims, :70 — quality-neutral)."""
    bbox_corner = np.asarray(bbox_corner, dtype=np.float32)
    bbox_size = np.asarray(bbox_size, dtype=np.float32)
    center = bbox_corner + bbox_size / 2.0
    size2 = bbox_size * 2.0  # background shell
    min_bbox = center - size2 / 2.0

    finest = (size2 / size2.min() * grid_resolution[1]).astype(np.int32)
    base = (size2 / size2.min() * grid_resolution[0]).astype(np.int32)
    resolutions = make_level_resolutions(base, finest, N_LEVELS)

    if cubic_grid:
        log2dims = np.array([sampler_log2dim] * 3)
    else:
        log2dims = compute_sampler_log2dim(size2, sampler_log2dim)
    grid_shape = tuple(int(2**d) for d in log2dims)
    if occupied_grid is None:
        occupied_grid = np.ones(grid_shape, dtype=bool)
    else:
        occupied_grid = np.asarray(occupied_grid, dtype=bool)
        assert occupied_grid.shape == grid_shape, (occupied_grid.shape, grid_shape)

    kf, kd = jax.random.split(key)
    params = FieldParams(
        features=init_features(kf, N_LEVELS, log2_hashmap_size, N_FEATURES),
        decoder=decoder_lib.init_decoder(kd, FEAT_DIM),
    )
    state = FieldState(
        resolutions=jnp.asarray(resolutions),
        min_bbox=jnp.asarray(min_bbox),
        bbox_size=jnp.asarray(size2),
        occupied_grid=jnp.asarray(occupied_grid),
    )
    return params, state


# ---------------------------------------------------------------------------
# geometry helpers
# ---------------------------------------------------------------------------

def inner_corner(state: FieldState) -> jax.Array:
    return state.min_bbox + state.bbox_size / 4.0


def inner_size(state: FieldState) -> jax.Array:
    return state.bbox_size / 2.0


def contract_fore(state: FieldState, x: jax.Array) -> jax.Array:
    """(``hashgrid/__init__.py:394-395``) inner bbox -> [-1, 1]."""
    return (x - state.min_bbox) / state.bbox_size * 4.0 - 2.0


def contract_bg(state: FieldState, x: jax.Array) -> jax.Array:
    """L-infinity mip360 squash over [-2, 2] (:397-411)."""
    x = (x - state.min_bbox) / state.bbox_size * 4.0 - 2.0
    linf = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    linf = jnp.maximum(linf, 1e-9)
    temp = 2.0 - 1.0 / linf  # in [1, 2] for |x|_inf in [1, inf)
    return x * (temp / linf)


def effective_backend(backend: str, H: int) -> str:
    """Resolve the hash backend for a GLOBAL table size H: the windowed
    layout needs >= one 32-window block of 512 entries; tiny tables
    (tests, toy configs) use the global-hash XLA path, which is also
    faster at such sizes. Export/pruning must use the SAME resolution so
    the table layout tag stays consistent with how it was trained."""
    if backend == "windowed" and H < 16384:
        return "xla"
    return backend


def weight_feature(step: jax.Array, dtype=jnp.float32) -> jax.Array:
    """BARF per-level annealing weights [16] (:228-235)."""
    alpha = jnp.clip(step / 10000.0 * 8.0 + 8.0, 0.0, 16.0)
    k = jnp.arange(N_LEVELS, dtype=dtype)
    return (1.0 - jnp.cos(jnp.clip(alpha - k, 0.0, 1.0) * jnp.pi)) / 2.0


# ---------------------------------------------------------------------------
# rendering
# ---------------------------------------------------------------------------

def _composite(
    out: dict[str, jax.Array],
    z: jax.Array,
    d: jax.Array,
    rays_d: jax.Array,
    valid: jax.Array,
    infinity: bool,
    train: bool,
) -> dict[str, jax.Array]:
    """Volume-render decoder outputs (:512-596 post-MLP part).

    out: dict with sigma [N,S,1], diffuse/tint/specular [N,S,3];
    z/d already masked; valid [N] bool.
    """
    weights, T_left = integrate.integrate_weights(
        out["sigma"], d, rays_d, infinity=infinity
    )
    weights = jnp.where(valid[:, None], weights, 0.0)
    T_left = jnp.where(valid, T_left, 1.0)

    depth = integrate.accumulate(weights, z[..., None])
    tint = integrate.accumulate(weights, out["tint"])
    diffuse = integrate.accumulate(weights, out["diffuse"])
    specular = integrate.accumulate(weights, out["tint"] * out["specular"])
    rgb = jnp.clip(diffuse + specular, 0.0, 1.0)

    res = {
        "rgb": rgb,
        "depth": depth,
        "diffuse": diffuse,
        "specular": specular,
        "tint": tint,
        "T_left": T_left,
        "weights": weights,
        "valid": valid,
    }
    if train:
        # specular L2 reg, mean over valid rays (:591-594)
        spec2 = integrate.accumulate(
            jax.lax.stop_gradient(weights), out["specular"] ** 2
        )
        nvalid = jnp.maximum(jnp.sum(valid.astype(spec2.dtype)), 1.0)
        res["l2_reg_specular"] = jnp.sum(
            jnp.mean(spec2, axis=-1) * valid
        ) / nvalid
    return res


def render_batch_rays(
    params: FieldParams,
    state: FieldState,
    rays_o: jax.Array,
    rays_d: jax.Array,
    z_vals: jax.Array,
    dists: jax.Array,
    valid: jax.Array,
    step: jax.Array,
    contract: Callable[[FieldState, jax.Array], jax.Array],
    infinity: bool,
    train: bool,
    stochastic_grad: bool = False,
) -> dict[str, jax.Array]:
    """Core render (:512-596) with masking instead of boolean compression.

    valid: [N] bool; invalid rays contribute zeros (T_left stays 1).
    """
    N, S = z_vals.shape
    z = jnp.where(valid[:, None], z_vals, 0.0)
    d = jnp.where(valid[:, None], dists, 0.0)

    samples = rays_o[:, None, :] + z[..., None] * rays_d[:, None, :]
    x = contract(state, samples.reshape(-1, 3))
    encode = hash_encode_stoch if stochastic_grad else hash_encode
    feats = encode(x, params.features, state.resolutions).reshape(N, S, FEAT_DIM)

    wf = jnp.repeat(weight_feature(step), 2, axis=-1)  # [32]
    viewdirs = jnp.broadcast_to(rays_d[:, None, :], (N, S, 3))
    out = decoder_lib.apply_decoder(params.decoder, feats, viewdirs, wf)
    return _composite(out, z, d, rays_d, valid, infinity, train)


def render_fore_rays(
    params: FieldParams,
    state: FieldState,
    rays_o: jax.Array,
    rays_d: jax.Array,
    num_sample: int,
    step: jax.Array,
    occlusion_mask: jax.Array | None = None,
    train: bool = True,
    num_march: int = 512,
    stochastic_grad: bool = False,
) -> dict[str, jax.Array]:
    """Foreground pass (:413-457)."""
    z_vals, dists, valid = sampling.sample_points_grid(
        rays_o,
        rays_d,
        num_sample,
        state.occupied_grid,
        inner_corner(state),
        inner_size(state),
        num_march=num_march,
    )
    if occlusion_mask is not None:
        valid = valid & occlusion_mask
    out = render_batch_rays(
        params, state, rays_o, rays_d, z_vals, dists, valid, step,
        contract_fore, infinity=False, train=train,
        stochastic_grad=stochastic_grad,
    )
    out["fore_valid"] = valid
    return out


def render_bg_rays(
    params: FieldParams,
    state: FieldState,
    rays_o: jax.Array,
    rays_d: jax.Array,
    num_sample: int,
    step: jax.Array,
    occlusion_mask: jax.Array | None = None,
    train: bool = True,
    invalid_underground: bool = False,
    bg_z: tuple[jax.Array, jax.Array, jax.Array] | None = None,
    stochastic_grad: bool = False,
) -> dict[str, jax.Array]:
    """Background pass (:459-509). ``bg_z`` overrides sampling (BS mode)."""
    if bg_z is None:
        z_vals, dists, valid = sampling.inverse_z_sampling(
            rays_o,
            rays_d,
            num_sample,
            state.min_bbox + state.bbox_size / 2.0,
            state.bbox_size,
            invalid_underground=invalid_underground,
        )
    else:
        z_vals, dists, valid = bg_z
    if occlusion_mask is not None:
        valid = valid & occlusion_mask
    out = render_batch_rays(
        params, state, rays_o, rays_d, z_vals, dists, valid, step,
        contract_bg, infinity=True, train=train,
        stochastic_grad=stochastic_grad,
    )
    out["bg_valid"] = valid
    return out


def _render_rays_windowed(
    params: FieldParams,
    state: FieldState,
    rays_o: jax.Array,
    rays_d: jax.Array,
    num_fg_sample: int,
    num_bg_sample: int,
    step: jax.Array,
    occlusion_mask: jax.Array | None,
    train: bool,
    invalid_underground: bool,
    num_march: int,
    bg_z: tuple[jax.Array, jax.Array, jax.Array] | None,
    table_axis: str | None = None,
    table_shards: int = 1,
    bwd_onehot_bf16: bool = False,
    fused_decoder: bool = False,
    compact_dead: bool = True,
) -> dict[str, jax.Array]:
    """TPU sorted-stream render: fg+bg points are merged into ONE
    windowed hash-encode call (``ops/pallas/hash_encode.py``); the
    decoder runs in the padded-sorted stream and only its 10 output
    channels are restored to ray order. Same outputs as render_rays.

    ``fused_decoder``: run the ShallowMLP inside the hash kernels
    (ops/pallas/fused_train.py) — exact same math and gradients, no
    [Np, 32] feats/d_feats round-trips or decoder dispatches. Single
    table only (sharded streams psum FEATURES across devices, which a
    post-decoder column psum cannot reproduce).

    ``table_axis``/``table_shards``: when set (and the call runs inside a
    shard_map over that mesh axis), ``params.features`` is the LOCAL
    [L, H/table_shards, F] shard of an H-sharded table (contiguous
    window-block ranges, parallel/table_parallel.py); the lookup
    restricts each device to its own blocks and one psum combines the
    per-point features — memory and lookup compute scale 1/shards, the
    rest of the pipeline runs replicated.
    """
    from scanerf_tpu.ops.pallas import hash_encode as hw

    B = rays_o.shape[0]
    Sf, Sb = num_fg_sample, num_bg_sample
    zf, df, vf = sampling.sample_points_grid(
        rays_o, rays_d, Sf, state.occupied_grid,
        inner_corner(state), inner_size(state), num_march=num_march,
    )
    if bg_z is None:
        zb, db, vb = sampling.inverse_z_sampling(
            rays_o, rays_d, Sb, state.min_bbox + state.bbox_size / 2.0,
            state.bbox_size, invalid_underground=invalid_underground,
        )
    else:
        zb, db, vb = bg_z
    if occlusion_mask is not None:
        vf = vf & occlusion_mask
        vb = vb & occlusion_mask

    zfm = jnp.where(vf[:, None], zf, 0.0)
    dfm = jnp.where(vf[:, None], df, 0.0)
    zbm = jnp.where(vb[:, None], zb, 0.0)
    dbm = jnp.where(vb[:, None], db, 0.0)

    xf = contract_fore(
        state, (rays_o[:, None, :] + zfm[..., None] * rays_d[:, None, :])
        .reshape(-1, 3))
    xb = contract_bg(
        state, (rays_o[:, None, :] + zbm[..., None] * rays_d[:, None, :])
        .reshape(-1, 3))
    x = jnp.concatenate([xf, xb], axis=0)
    dirs = jnp.concatenate([
        jnp.broadcast_to(rays_d[:, None, :], (B, Sf, 3)).reshape(-1, 3),
        jnp.broadcast_to(rays_d[:, None, :], (B, Sb, 3)).reshape(-1, 3),
    ], axis=0)

    Htab = table_rows(params.features) * table_shards
    # masked/missed rays (occlusion mask, zero occupancy span) carry
    # zero composite weight — route their Sf/Sb points to the sentinel
    # window so whole-dead chunks skip the hash kernels and the decoder
    # (the reference's boolean compression, tile.py:940). Loss-exact:
    # dead outputs were multiplied by zero before, are zeros now.
    dead = None
    if compact_dead:
        dead = jnp.concatenate([
            jnp.broadcast_to(~vf[:, None], (B, Sf)).reshape(-1),
            jnp.broadcast_to(~vb[:, None], (B, Sb)).reshape(-1),
        ])
    stream = hw.sort_pack(x, dirs, Htab, dead)
    if table_shards > 1:
        from scanerf_tpu.parallel.table_parallel import (
            complete_on_backward,
            localize_meta,
            psum_one_owner,
        )

        _, NB, _ = hw.geometry(Htab)
        assert NB % table_shards == 0, (NB, table_shards)
        dev = jax.lax.axis_index(table_axis)
        meta_loc, visited_loc = localize_meta(
            stream.meta, stream.visited, dev, NB // table_shards
        )
        # complete_on_backward: the kernel's dL/dpoints is per-device
        # PARTIAL (owned chunks only) — psum it on the way back so pose
        # gradients are complete; psum_one_owner: forward feature
        # combine whose backward is identity (one producer per point)
        pts_in = complete_on_backward(stream.pts, table_axis)
        feats_s = hw.hash_lookup_sorted(
            pts_in, meta_loc, visited_loc,
            params.features, state.resolutions, bwd_onehot_bf16,
        )
        feats_s = psum_one_owner(feats_s, table_axis)
    elif fused_decoder:
        from scanerf_tpu.ops.pallas import fused_train as ft

        slab = ft.pack_train_slab(params.decoder, weight_feature(step))
        cols = ft.hash_decode_train(
            stream.pts, stream.meta, stream.visited,
            params.features, state.resolutions, slab, bwd_onehot_bf16,
        )  # [Np, 8] — same 8 columns as the unfused branch below
    else:
        feats_s = hw.hash_lookup_sorted(
            stream.pts, stream.meta, stream.visited,
            params.features, state.resolutions, bwd_onehot_bf16,
        )  # [Np, 32]
    if table_shards > 1 or not fused_decoder:
        Np = feats_s.shape[0]
        dirs_s = stream.pts[:, 4:7, :].transpose(0, 2, 1).reshape(Np, 3)
        wf = jnp.repeat(weight_feature(step), 2, axis=-1)
        dec = decoder_lib.apply_decoder(params.decoder, feats_s, dirs_s, wf)
        # only 8 columns leave the sorted stream (sorts charge per
        # payload): tint*specular is premultiplied (accumulate is linear,
        # so the composite is unchanged) and the specular-L2's channel
        # mean rides ONE column (mean over channels commutes with
        # accumulate); the raw tint accumulation has no downstream
        # consumer
        spec2 = jnp.mean(dec["specular"] ** 2, axis=-1, keepdims=True)
        cols = jnp.concatenate(
            [dec["sigma"], dec["diffuse"], dec["tint"] * dec["specular"],
             spec2], axis=-1
        )  # [Np, 8]
    rows = hw.unsort_rows(cols, stream.pidp, stream.inv_full, x.shape[0])

    def as_parts(part, S):
        return {
            "sigma": part[:, 0:1].reshape(B, S, 1),
            "diffuse": part[:, 1:4].reshape(B, S, 3),
            "tintspec": part[:, 4:7].reshape(B, S, 3),
            "spec2": part[:, 7:8].reshape(B, S, 1),
        }

    Nf = B * Sf
    fg = _composite_premul(as_parts(rows[:Nf], Sf), zfm, dfm, rays_d, vf,
                           infinity=False, train=train)
    bg = _composite_premul(as_parts(rows[Nf:], Sb), zbm, dbm, rays_d, vb,
                           infinity=True, train=train)
    fg["fore_valid"] = vf
    bg["bg_valid"] = vb
    return _compose_fg_bg(fg, bg, rays_o, rays_d, train)


def _composite_premul(
    out: dict[str, jax.Array],
    z: jax.Array,
    d: jax.Array,
    rays_d: jax.Array,
    valid: jax.Array,
    infinity: bool,
    train: bool,
) -> dict[str, jax.Array]:
    """_composite for the windowed stream's 8-column payload
    (tint*specular premultiplied, specular^2 channel-mean carried):
    identical outputs for every consumed field."""
    weights, T_left = integrate.integrate_weights(
        out["sigma"], d, rays_d, infinity=infinity
    )
    weights = jnp.where(valid[:, None], weights, 0.0)
    T_left = jnp.where(valid, T_left, 1.0)

    depth = integrate.accumulate(weights, z[..., None])
    diffuse = integrate.accumulate(weights, out["diffuse"])
    specular = integrate.accumulate(weights, out["tintspec"])
    rgb = jnp.clip(diffuse + specular, 0.0, 1.0)
    res = {
        "rgb": rgb,
        "depth": depth,
        "diffuse": diffuse,
        "specular": specular,
        "T_left": T_left,
        "weights": weights,
        "valid": valid,
    }
    if train:
        spec2 = integrate.accumulate(
            jax.lax.stop_gradient(weights), out["spec2"]
        )[..., 0]
        nvalid = jnp.maximum(jnp.sum(valid.astype(spec2.dtype)), 1.0)
        res["l2_reg_specular"] = jnp.sum(spec2 * valid) / nvalid
    return res


def _compose_fg_bg(fg, bg, rays_o, rays_d, train):
    """fg + T*bg composite (``tile.py:674-686``)."""
    T = fg["T_left"][:, None]
    out = {
        "pred_color": fg["rgb"] + T * bg["rgb"],
        "pred_depth": fg["depth"] + T * bg["depth"],
        "pred_specular": fg["specular"] + T * bg["specular"],
        "pred_diffuse": fg["diffuse"] + T * bg["diffuse"],
        "fore_valid": fg["fore_valid"],
        "bg_valid": bg["bg_valid"],
        "fore_depth": fg["depth"],
        "T_left": fg["T_left"],
        "weights": fg["weights"],
        "rays_o": rays_o,
        "rays_d": rays_d,
    }
    if train:
        out["l2_reg_specular"] = fg["l2_reg_specular"] + bg["l2_reg_specular"]
    return out


def render_rays(
    params: FieldParams,
    state: FieldState,
    rays_o: jax.Array,
    rays_d: jax.Array,
    num_fg_sample: int,
    num_bg_sample: int,
    step: jax.Array,
    occlusion_mask: jax.Array | None = None,
    train: bool = True,
    invalid_underground: bool = False,
    num_march: int = 512,
    stochastic_grad: bool = False,
    bg_z: tuple[jax.Array, jax.Array, jax.Array] | None = None,
    backend: str = "xla",
    table_axis: str | None = None,
    table_shards: int = 1,
    bwd_onehot_bf16: bool = False,
    fused_decoder: bool = False,
    compact_dead: bool = True,
) -> dict[str, jax.Array]:
    """fg + bg composite (``tile.py:639-692``). ``bg_z`` supplies
    precomputed BS-mode background samples (z, dists, valid).

    backend: "xla" = global prime-XOR hash via XLA gather (reference
    semantics); "windowed" = merged fg+bg sorted-stream Pallas kernel
    (hierarchical window hash — the TPU production path).
    table_axis/table_shards: H-sharded tables (windowed backend only;
    see _render_rays_windowed)."""
    backend = effective_backend(
        backend, table_rows(params.features) * table_shards
    )
    if backend == "windowed":
        return _render_rays_windowed(
            params, state, rays_o, rays_d, num_fg_sample, num_bg_sample,
            step, occlusion_mask, train, invalid_underground, num_march,
            bg_z, table_axis=table_axis, table_shards=table_shards,
            bwd_onehot_bf16=bwd_onehot_bf16, fused_decoder=fused_decoder,
            compact_dead=compact_dead,
        )
    assert table_shards == 1, (
        "table parallelism requires the windowed backend")
    fg = render_fore_rays(
        params, state, rays_o, rays_d, num_fg_sample, step,
        occlusion_mask=occlusion_mask, train=train, num_march=num_march,
        stochastic_grad=stochastic_grad,
    )
    bg = render_bg_rays(
        params, state, rays_o, rays_d, num_bg_sample, step,
        occlusion_mask=occlusion_mask, train=train,
        invalid_underground=invalid_underground,
        stochastic_grad=stochastic_grad,
        bg_z=bg_z,
    )
    return _compose_fg_bg(fg, bg, rays_o, rays_d, train)


def compute_normal(
    params: FieldParams,
    state: FieldState,
    samples: jax.Array,
    step: jax.Array,
    backend: str = "xla",
) -> tuple[jax.Array, jax.Array]:
    """Normals as the negated normalized density gradient
    (``HashGrid.compute_normal``, hashgrid/__init__.py:374-392).

    samples: [..., 3] world points. Returns (normal [..., 3], sigma
    [..., 1]).
    """
    shape = samples.shape
    flat = samples.reshape(-1, 3)

    def sigma_of(p):
        # (the reference queries HE on raw points here, :370 — we apply
        # the fg contraction for consistency with the render path)
        x = contract_fore(state, p)
        return field_inference_sigma(
            params, state, x[None], step, backend=backend
        )[0, 0]

    sigma, grads = jax.vmap(jax.value_and_grad(sigma_of))(flat)
    normal = -grads / (jnp.linalg.norm(grads, axis=-1, keepdims=True) + 1e-8)
    return normal.reshape(shape), sigma.reshape(*shape[:-1], 1)


def render_normals(
    params: FieldParams,
    state: FieldState,
    rays_o: jax.Array,
    rays_d: jax.Array,
    num_sample: int,
    step: jax.Array,
    num_march: int = 512,
    backend: str = "xla",
) -> jax.Array:
    """Accumulated surface normals in [0, 1] (``TILE.render_normals``,
    tile.py:696-714)."""
    z_vals, dists, valid = sampling.sample_points_grid(
        rays_o, rays_d, num_sample,
        state.occupied_grid, inner_corner(state), inner_size(state),
        num_march=num_march,
    )
    z = jnp.where(valid[:, None], z_vals, 0.0)
    d = jnp.where(valid[:, None], dists, 0.0)
    samples = rays_o[:, None, :] + z[..., None] * rays_d[:, None, :]
    normals, sigma = compute_normal(params, state, samples, step, backend=backend)
    weights, _ = integrate.integrate_weights(sigma[..., 0], d, rays_d, infinity=False)
    weights = jnp.where(valid[:, None], weights, 0.0)
    pred = integrate.accumulate(weights, jax.lax.stop_gradient(normals))
    return (pred + 1.0) / 2.0


def field_inference_sigma(
    params: FieldParams,
    state: FieldState,
    samples: jax.Array,
    step: jax.Array,
    backend: str = "xla",
) -> jax.Array:
    """Density query for pruning (:368-372 + annealing as in :196-198).

    ``backend`` must match the layout the table was TRAINED with — a
    windowed-layout table queried through the global prime-XOR hash
    returns garbage densities (and pruning would then keep/drop the
    wrong cells)."""
    x = samples.reshape(-1, 3)
    if backend == "windowed":
        from scanerf_tpu.ops.pallas.hash_encode import hash_encode_windowed_ref

        feats = hash_encode_windowed_ref(
            x, params.features, state.resolutions
        )
    else:
        feats = hash_encode(x, params.features, state.resolutions)
    wf = jnp.repeat(weight_feature(step), 2, axis=-1)
    sig = decoder_lib.inference_sigma(params.decoder, feats * wf)
    return sig.reshape(*samples.shape[:-1], 1)
