"""Tile parallelism: one SPMD program over a ``tiles`` device-mesh axis.

TPU-native replacement for the reference's process-per-GPU orchestration
(``admm_trainer.py:187-270, 312-337``): every tile's full training state
(hash table, decoder, pose refinements, Adam moments, ADMM duals) is one
slice of a stacked pytree with a leading tile axis, sharded over the mesh.
A sync round = ``SYN_ITERS`` locally-independent train steps followed by
the ADMM consensus collective — all inside a single jit region.

Multiple tiles per device are supported the same way the reference
time-slices tiles on one GPU (``admm_trainer.py:238-250``), but without
``toCPU``/``toGPU`` swap code: the local tile dimension is simply vmapped.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scanerf_tpu.parallel import consensus as consensus_lib
from scanerf_tpu.train import tile as tile_lib
from scanerf_tpu.train.tile import TileData, TrainConfig, TrainState


@flax.struct.dataclass
class ParallelTiles:
    """Stacked per-tile training state (leading axis = tile)."""

    state: TrainState  # leaves [T, ...]
    cam_map: jax.Array  # [T, M] global camera ids, -1 padding
    confidence: jax.Array  # [T, M] per-camera confidence (1.0 default,
    # mirroring the disabled update_confidence — tile.py:354-360)


def stack_tiles(states: list[TrainState], cam_maps: np.ndarray) -> ParallelTiles:
    """Stack per-tile states into the parallel pytree."""
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
    cam_map = jnp.asarray(cam_maps, jnp.int32)
    conf = jnp.ones(cam_map.shape, jnp.float32)
    return ParallelTiles(state=stacked, cam_map=cam_map, confidence=conf)


def make_tile_mesh(devices=None, n_table: int = 1, n_rays: int = 1) -> Mesh:
    """``tiles`` mesh, optionally extended by a ``rays`` axis (per-tile
    ray-batch data parallelism — parallel/ray_parallel.py semantics:
    every rays replica draws an independent batch and gradients pmean)
    and/or a ``table`` axis (each tile's hash table + Adam moments shard
    ``n_table``-way along H). Axis order (tiles, rays, table) keeps the
    table psum innermost (most traffic -> nearest neighbors on ICI)."""
    devices = np.array(devices if devices is not None else jax.devices())
    axes = [("tiles", devices.size // (n_table * n_rays))]
    if n_rays > 1:
        axes.append(("rays", n_rays))
    if n_table > 1:
        axes.append(("table", n_table))
    assert devices.size == int(np.prod([n for _, n in axes])), (
        devices.size, axes)
    if len(axes) == 1:
        return Mesh(devices, ("tiles",))
    return Mesh(
        devices.reshape([n for _, n in axes]), tuple(n for n, _ in axes)
    )


def _is_table_leaf(x, feat_shape) -> bool:
    """A stacked-state leaf carrying per-tile hash features (the features
    themselves and their Adam mu/nu inside the optimizer state) — matched
    by exact shape: [T, L, H*F] (canonical flat) with H large makes
    collisions with any other state leaf impossible."""
    return hasattr(x, "shape") and tuple(x.shape) == tuple(feat_shape)


def state_specs(tiles: ParallelTiles, mesh: Mesh):
    """Per-leaf PartitionSpecs for the stacked ParallelTiles: everything
    shards over ``tiles``; hash-feature leaves (features + moments)
    additionally shard H over ``table`` when the mesh has that axis."""
    feat_shape = tiles.state.params.field.features.shape
    has_table = "table" in mesh.axis_names
    # dim 2 carries H (flat [T, L, H*F]) or H then F ([T, L, H, F])
    feat_spec = P(*(("tiles", None, "table") + (None,) * (len(feat_shape) - 3)))

    def spec_of(x):
        if has_table and _is_table_leaf(x, feat_shape):
            return feat_spec
        return P("tiles")

    return jax.tree_util.tree_map(spec_of, tiles)


def shard_parallel(mesh: Mesh, tiles: ParallelTiles, data: TileData):
    """Place the stacked pytrees on the mesh: tile-sharded, with hash
    features (and their optimizer moments) additionally H-sharded over
    the ``table`` axis when present."""
    specs = state_specs(tiles, mesh)
    tiles = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tiles, specs
    )
    data_sh = NamedSharding(mesh, P("tiles"))
    data = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sh), data
    )
    return tiles, data


def build_admm_round(
    mesh: Mesh,
    tc: TrainConfig,
    tx,
    n_inner: int,
    n_global_cams: int,
    update_confidence: bool = False,
    tiles_example: ParallelTiles | None = None,
):
    """Build the jitted sync-round function.

    round_fn(tiles: ParallelTiles, data: TileData[stacked], key) ->
        (tiles', (train_aux, consensus_aux))

    On a 2D ``(tiles, table)`` mesh (``make_tile_mesh(n_table=...)``),
    pass ``tiles_example`` (the stacked state — only shapes are used) so
    hash-feature leaves get ``P("tiles", None, "table", None)`` specs,
    and set ``tc.table_shards`` to the table-axis size: each per-tile
    step then runs its windowed hash lookup on the LOCAL table shard and
    psums features over ``table`` (models/field.py), while gradients and
    Adam moments for the table stay shard-local — no table gradient
    communication, 1/n_table memory per device.

    With a ``rays`` axis (``make_tile_mesh(n_rays=...)``) each replica
    along it draws an independent batch (key folded by the rays index)
    and every inner step pmeans gradients over the axis before the
    replica-identical optimizer update — the effective per-tile batch is
    ``n_rays * 2**batch_log2`` (parallel/ray_parallel.py, for when chips
    outnumber tiles; the reference can only scale a tile's batch by a
    bigger GPU, admm_trainer.py:187-270).
    """
    grad_axis = "rays" if "rays" in mesh.axis_names else None
    if grad_axis is not None:
        assert tc.ray_shards == mesh.shape["rays"], (
            tc.ray_shards, dict(mesh.shape))
    else:
        assert tc.ray_shards == 1, tc.ray_shards

    def one_tile_steps(
        state: TrainState, data: TileData, key: jax.Array, conf0: jax.Array
    ):
        def body(i, carry):
            state, _, conf = carry
            k = jax.random.fold_in(key, i)
            new_state, aux = tile_lib.train_step.__wrapped__(
                state, data, k, tc, tx, grad_axis=grad_axis
            )
            # confidence EMA (tile.py:360): conf = 0.9*conf + 0.1*score
            new_conf = 0.9 * conf + 0.1 * aux["confidence_score"]
            return new_state, aux["total_loss"], new_conf

        state, last_loss, conf = jax.lax.fori_loop(
            0, n_inner, body, (state, jnp.asarray(0.0), conf0)
        )
        return state, last_loss, conf

    def shard_fn(tiles: ParallelTiles, data: TileData, key: jax.Array):
        # local shapes: [T_local, ...]
        T_local = tiles.cam_map.shape[0]
        if grad_axis is not None:
            # independent batches per rays replica; grads pmean inside
            # train_step keeps the replicas bit-identical
            key = jax.random.fold_in(key, jax.lax.axis_index(grad_axis))
        tile_ids = jax.lax.axis_index("tiles") * T_local + jnp.arange(T_local)
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(tile_ids)

        # >1 tile per device runs SEQUENTIALLY (static unroll), exactly
        # like the reference time-slices tiles on one GPU
        # (admm_trainer.py:238-250) — and unlike vmap this keeps the
        # windowed hash pallas_call unbatched (its ANY-space feature
        # operand cannot carry a leading batch dim on TPU)
        pick = lambda tree, t: jax.tree_util.tree_map(lambda x: x[t], tree)
        outs = [
            one_tile_steps(
                pick(tiles.state, t), pick(data, t), keys[t],
                tiles.confidence[t],
            )
            for t in range(T_local)
        ]
        new_state = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[o[0] for o in outs]
        )
        losses = jnp.stack([o[1] for o in outs])
        conf = jnp.stack([o[2] for o in outs])
        if update_confidence:
            tiles = tiles.replace(confidence=conf)

        # --- consensus collective (flatten local tiles into the scatter) ---
        admm = new_state.admm
        se3 = new_state.params.se3_refine  # [T_l, M, 6]
        z, delta, overlap, aux = consensus_lib.consensus_update(
            se3,
            tiles.confidence,
            tiles.cam_map,
            admm.shared_se3,
            admm.delta_se3,
            admm.rho[0],
            n_global_cams,
            axis_name="tiles",
        )
        new_admm = admm.replace(
            shared_se3=z, delta_se3=delta, overlap_flags=overlap
        )
        new_state = new_state.replace(admm=new_admm)
        new_tiles = tiles.replace(state=new_state)
        return new_tiles, losses, aux

    if "table" in mesh.axis_names:
        assert tiles_example is not None, (
            "a (tiles, table) mesh needs tiles_example to derive the "
            "table-sharded leaf specs")
        tile_specs = state_specs(tiles_example, mesh)
        assert tc.table_shards == mesh.shape["table"], (
            tc.table_shards, dict(mesh.shape))
    else:
        tile_specs = jax.tree_util.tree_map(
            lambda _: P("tiles"), tiles_example
        ) if tiles_example is not None else P("tiles")
        assert tc.table_shards == 1, tc.table_shards

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(tile_specs, P("tiles"), P()),
        out_specs=(tile_specs, P("tiles"), P()),
        # pallas_call inside shard_map cannot express varying-mesh-axes
        # metadata on its out_shape (jax #pallas_call vma limitation) —
        # disable the check; correctness is covered by the parity tests
        check_vma=False,
    )
    return jax.jit(sharded)


def make_cam_maps(
    tile_view_lists: list[list[int]], max_poses: int
) -> np.ndarray:
    """Pack per-tile global camera id lists into a [T, MAX_POSES] int32
    array with -1 padding (the MAX_POSES cap mirrors ``cfg.MAX_POSES``)."""
    T = len(tile_view_lists)
    out = np.full((T, max_poses), -1, np.int32)
    for t, views in enumerate(tile_view_lists):
        v = np.asarray(views[:max_poses], np.int32)
        out[t, : len(v)] = v
    return out
