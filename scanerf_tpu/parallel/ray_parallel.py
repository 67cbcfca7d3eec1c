"""Ray data parallelism: scale ONE tile's batch over a ``rays`` mesh axis.

The reference scales a tile's training batch only by giving its process a
bigger GPU (one tile per device, ``admm_trainer.py:187-270``); when chips
outnumber tiles that hardware sits idle. The TPU-native extra axis is
data parallelism over the ray batch: every device on the ``rays`` axis
holds a replica of the tile's TrainState, draws an INDEPENDENT
``2**batch_log2`` patch batch (the step key folded by the device's axis
index), and gradients are ``pmean``'d over the axis before the
replica-identical optimizer update — so the effective batch is
``n_rays * 2**batch_log2`` and replicas stay bit-identical without any
parameter collective.

Objective note: each shard's loss is its own masked mean, so the DP
objective is the average of per-shard means — equal to the global masked
mean when shards carry equal valid counts (exactly the uniform-patch
sampling regime), and a well-defined reweighting otherwise.

Composes with table sharding: ``make_ray_mesh(n_table=...)`` builds a 2D
``(rays, table)`` mesh where the hash table + its Adam moments shard over
``table`` (the windowed encode psums features over that axis —
models/field.py) while everything else replicates over ``rays``. Gradient
pmean rides ``rays`` only; table gradients stay shard-local along H.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scanerf_tpu.train import tile as tile_lib
from scanerf_tpu.train.tile import TileData, TrainConfig, TrainState


def make_ray_mesh(devices=None, n_table: int = 1) -> Mesh:
    """1D ``rays`` mesh, or 2D ``(rays, table)`` when ``n_table > 1``."""
    devices = np.array(devices if devices is not None else jax.devices())
    if n_table > 1:
        assert devices.size % n_table == 0, (devices.size, n_table)
        return Mesh(
            devices.reshape(devices.size // n_table, n_table),
            ("rays", "table"),
        )
    return Mesh(devices, ("rays",))


def state_specs(state: TrainState, mesh: Mesh):
    """Per-leaf PartitionSpecs: replicated over ``rays``; hash-feature
    leaves (features + Adam moments, matched by exact shape ``[L, H*F]``)
    shard H over ``table`` when the mesh has that axis."""
    feat_shape = state.params.field.features.shape
    has_table = "table" in mesh.axis_names
    feat_spec = P(None, "table", *([None] * (len(feat_shape) - 2)))

    def spec_of(x):
        if has_table and hasattr(x, "shape") and tuple(x.shape) == tuple(
            feat_shape
        ):
            return feat_spec
        return P()

    return jax.tree_util.tree_map(spec_of, state)


def shard_dp(mesh: Mesh, state: TrainState, data: TileData):
    """Place the state (replicated / table-sharded) and data (replicated)
    on the mesh.

    The step built by ``build_dp_step`` DONATES its state; ``device_put``
    may alias the caller's buffers (same-device fast path), so callers
    that keep using the original ``state`` after stepping must pass a
    copy (``tree_map(jnp.copy, state)``)."""
    specs = state_specs(state, mesh)
    state = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs
    )
    rep = NamedSharding(mesh, P())
    data = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), data)
    return state, data


def build_dp_step(mesh: Mesh, tc: TrainConfig, tx, state_example: TrainState):
    """Build the jitted ray-data-parallel train step.

    step_fn(state, data, key) -> (state', aux) — drop-in for
    ``tile.train_step`` with an ``n_rays``-times-larger effective batch.
    ``state_example`` supplies leaf shapes for the table-sharded specs
    (only shapes are read).
    """
    if "table" in mesh.axis_names:
        assert tc.table_shards == mesh.shape["table"], (
            tc.table_shards, dict(mesh.shape))
    else:
        assert tc.table_shards == 1, tc.table_shards
    specs = state_specs(state_example, mesh)

    def dp_fn(state: TrainState, data: TileData, key: jax.Array):
        k = jax.random.fold_in(key, jax.lax.axis_index("rays"))
        return tile_lib.train_step.__wrapped__(
            state, data, k, tc, tx, grad_axis="rays"
        )

    sharded = jax.shard_map(
        dp_fn,
        mesh=mesh,
        in_specs=(specs, P(), P()),
        out_specs=(specs, P()),
        # same pallas_call-vma caveat as tile_parallel.build_admm_round
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=0)
