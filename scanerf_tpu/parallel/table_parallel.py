"""Table parallelism: shard one tile's hash table across a mesh axis.

The reference default trains 2^24-entry tables per level
(``config/default.yaml`` HASHGRID.LOG2_HASHMAP_SIZE) — with Adam moments
that is ~6 GB of f32 state per tile, which does not fit a 16 GB chip
next to the step's transients. The reference fits it on a 32 GB V100;
this module goes further and SHARDS the table (something the reference's
one-process-per-tile design cannot do at all).

The windowed hash layout makes this natural: the table is already
partitioned into window BLOCKS, the sorted point stream is block-aligned
(every 1024-point chunk lies inside one block), and block visits are
monotone. So:

- ``features`` shards along H into contiguous block ranges
  (``P(None, "table", None)``) — table, gradients, and optimizer moments
  all scale 1/n_devices,
- the (replicated) stream runs on every device, but chunks whose block
  another device owns get ``span = 0`` in their meta — the kernel skips
  their gather loops entirely and emits zeros, so lookup COMPUTE also
  balances across devices,
- each point's features are produced by exactly one device; a single
  ``psum`` over the axis combines them,
- the backward needs NO communication for the table gradient (each
  device owns its blocks); point gradients combine through shard_map's
  replicated-input transpose.

Cost: the sorts and the decoder run replicated (this axis buys MEMORY
and lookup balance, not sort throughput); combine with the ``tiles``
axis in a 2D mesh for scale-out.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scanerf_tpu.ops.pallas import hash_encode as hw


def shard_features(features: jax.Array, mesh: Mesh, axis: str = "table"):
    """Place features H-sharded over ``axis``. Works for both layouts:
    flat [L, H*F] (canonical training state — contiguous chunks of
    dim 1 are whole H-row ranges since F divides the chunk) and
    [L, H, F]."""
    spec = P(None, axis) if features.ndim == 2 else P(None, axis, None)
    return jax.device_put(features, NamedSharding(mesh, spec))


def localize_meta(meta, visited, dev_idx, nb_local):
    """Restrict a stream's meta to the device's block range
    [dev_idx*nb_local, (dev_idx+1)*nb_local).

    Chunks outside the range get span=0 (the kernel skips their windows
    and writes zeros) and a boc clamped into range (keeps the slab DMA
    in bounds and block visits monotone); owned chunks get a local boc
    and the global window id of the shard's window 0 in the meta's
    fourth field (the kernel's ``wbase``)."""
    b0 = dev_idx * nb_local
    boc = meta[:, :, 0]
    owned = (boc >= b0) & (boc < b0 + nb_local)
    boc_loc = jnp.clip(boc - b0, 0, nb_local - 1)
    span = jnp.where(owned, meta[:, :, 2], 0)
    wbase = jnp.full_like(boc, b0 * hw.WB)
    meta_loc = jnp.stack([boc_loc, meta[:, :, 1], span, wbase], axis=-1)
    visited_loc = jax.lax.dynamic_slice_in_dim(
        visited, b0, nb_local, axis=0
    )
    return meta_loc, visited_loc


# --- differentiation-correct collectives for inside-shard_map grads ----
#
# With check_vma=False, shard_map cannot track replication, and the
# default transpose of ``psum`` sums the (identical) per-device
# cotangents — scaling gradients by the axis size. Worse, the hash
# kernel's dL/dpoints is per-device PARTIAL (each device only evaluates
# its owned chunks). These two custom ops pin the correct semantics for
# the one-owner-per-point feature sum:
#
# - ``psum_one_owner``: forward psum; backward passes the (replicated)
#   cotangent through unchanged — exact, because each point's feature
#   row is produced by exactly one device (zeros elsewhere), so
#   d(sum)/d(local contribution) = identity.
# - ``complete_on_backward``: forward identity; backward psums — used on
#   the sorted-stream inputs so the partial per-device dL/dpoints
#   contributions combine into the full gradient before flowing on to
#   poses.

@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def psum_one_owner(x, axis: str):
    return jax.lax.psum(x, axis)


psum_one_owner.defvjp(
    lambda x, axis: (jax.lax.psum(x, axis), None),
    lambda axis, _, g: (g,),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def complete_on_backward(x, axis: str):
    return x


complete_on_backward.defvjp(
    lambda x, axis: (x, None),
    lambda axis, _, g: (jax.lax.psum(g, axis),),
)


def encode_table_parallel(
    x: jax.Array,
    dirs: jax.Array,
    features: jax.Array,  # [L, H, F], H sharded over ``axis``
    resolutions: jax.Array,
    mesh: Mesh,
    axis: str = "table",
):
    """Windowed hash encode with the table sharded over ``axis``.

    Returns features in ORIGINAL point order [N, L*F]. Differentiable in
    x, dirs, and features (the feature cotangent comes back with the
    same sharding — ready for a sharded optimizer).
    """
    N = x.shape[0]
    H = hw.he.table_rows(features)
    n_dev = mesh.shape[axis]
    _, NB, _ = hw.geometry(H)
    assert NB % n_dev == 0, (NB, n_dev)
    nb_local = NB // n_dev

    stream = hw.sort_pack(x, dirs, H)

    def local_fn(pts, meta, pidp, inv_full, visited, feat_local):
        idx = jax.lax.axis_index(axis)
        meta_loc, visited_loc = localize_meta(meta, visited, idx, nb_local)
        feats = hw.hash_lookup_sorted(
            pts, meta_loc, visited_loc, feat_local, resolutions
        )
        feats = jax.lax.psum(feats, axis)  # one owner per point
        return hw.unsort_rows(feats, pidp, inv_full, N)

    feat_spec = P(None, axis) if features.ndim == 2 else P(None, axis, None)
    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), feat_spec),
        out_specs=P(),
        check_vma=False,
    )(stream.pts, stream.meta, stream.pidp, stream.inv_full,
      stream.visited, features)
