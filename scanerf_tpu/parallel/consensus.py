"""ADMM pose consensus as a jitted collective over the ``tiles`` mesh axis.

TPU-native replacement for the reference's master process
(``admm_trainer.py:85-184``) + per-tile ``ConsensusManager``
(``consensus.py``). The reference ships per-tile pose vectors through
CPython shared memory to a master that computes a confidence-weighted
average per shared camera and ships consensus poses back, with spin-wait
barriers. Here the same math is one ``psum`` pair inside the SPMD program:

- each tile scatters its ``(se3, confidence)`` into a global camera-indexed
  buffer via its ``cam_map`` (global camera ids, -1 padded),
- ``psum`` over the tile axis yields the weighted sum / weight / membership
  count per global camera,
- z-update = weighted mean (``admm_trainer.py:137-155``); cameras covered
  by >1 tile are the overlap set (:149-153),
- each tile gathers its local consensus slice back and applies the
  over-relaxed dual update ``u += 1.5 * (x - z)`` (``consensus.py:40-50``),
- primal/dual residuals match ``admm_trainer.py:157-170``.

No locks, no spin-waits, no host traffic: the whole sync round is inside
jit, and the collective rides ICI.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class ConsensusAux:
    primal_residual: jax.Array  # scalar
    dual_residual: jax.Array  # scalar
    num_overlap: jax.Array  # scalar int


def consensus_update(
    se3_refine: jax.Array,  # [M, 6] local tile pose refinements
    confidence: jax.Array,  # [M] local per-camera confidence
    cam_map: jax.Array,  # [M] int32 global camera ids, -1 = padding
    shared_se3_old: jax.Array,  # [M, 6] previous z (local slice)
    delta_se3: jax.Array,  # [M, 6] scaled dual u
    rho: jax.Array,  # [6]
    n_global: int,
    axis_name: str = "tiles",
) -> tuple[jax.Array, jax.Array, jax.Array, ConsensusAux]:
    """One consensus round. Must run inside shard_map over ``axis_name``.

    Returns (shared_se3 [M,6], new_delta [M,6], overlap_flags [M], aux).

    Leading batch dims (local tiles on one device) are allowed: shapes
    [..., M, 6] / [..., M]; they are flattened into the scatter so all
    local tiles contribute before the cross-device psum.
    """
    batch_shape = cam_map.shape
    se3_refine = se3_refine.reshape(-1, 6)
    confidence = confidence.reshape(-1)
    cam_map = cam_map.reshape(-1)
    shared_se3_old = shared_se3_old.reshape(-1, 6)
    delta_se3 = delta_se3.reshape(-1, 6)

    member = (cam_map >= 0).astype(se3_refine.dtype)  # [M]
    idx = jnp.clip(cam_map, 0, n_global - 1)
    w = confidence * member  # [M]

    # scatter-add local contributions into the global camera table
    zeros6 = jnp.zeros((n_global, 6), se3_refine.dtype)
    zeros1 = jnp.zeros((n_global,), se3_refine.dtype)
    sum_wx = zeros6.at[idx].add(se3_refine * w[:, None])
    sum_w = zeros1.at[idx].add(w)
    count = zeros1.at[idx].add(member)

    sum_wx = jax.lax.psum(sum_wx, axis_name)
    sum_w = jax.lax.psum(sum_w, axis_name)
    count = jax.lax.psum(count, axis_name)

    z_global = sum_wx / jnp.maximum(sum_w, 1e-12)[:, None]  # [G, 6]
    overlap_global = count > 1.0  # [G]

    # gather the local slice back
    z_local = z_global[idx] * member[:, None]
    overlap = overlap_global[idx] & (cam_map >= 0)

    # over-relaxed dual update (consensus.py:45)
    new_delta = delta_se3 + 1.5 * (se3_refine - z_local)

    # --- residuals, matching admm_trainer.py:157-170 exactly ---
    # primal = mean over tiles of mean(|x_tile - z_tile|) over the tile's
    # cameras x 6 (:162-168); dual = mean(|z_new - z_old|) over ALL global
    # cameras x 6 (:157).
    M = batch_shape[-1]
    n_local_tiles = int(np.prod(batch_shape[:-1])) if len(batch_shape) > 1 else 1
    x_t = se3_refine.reshape(n_local_tiles, M, 6)
    z_t = z_local.reshape(n_local_tiles, M, 6)
    mem_t = member.reshape(n_local_tiles, M, 1)
    per_tile = jnp.sum(jnp.abs(x_t - z_t) * mem_t, axis=(1, 2)) / jnp.maximum(
        jnp.sum(mem_t, axis=(1, 2)) * 6.0, 1.0
    )
    n_tiles = jax.lax.psum(jnp.asarray(float(n_local_tiles)), axis_name)
    primal = jax.lax.psum(jnp.sum(per_tile), axis_name) / n_tiles

    z_old_sum = jax.lax.psum(
        jnp.zeros((n_global, 6), se3_refine.dtype)
        .at[idx]
        .add(shared_se3_old * member[:, None]),
        axis_name,
    )
    z_old_global = z_old_sum / jnp.maximum(count, 1.0)[:, None]
    dual = jnp.mean(jnp.abs(z_global - z_old_global))

    n_ovl = jax.lax.psum(jnp.sum(overlap.astype(jnp.float32)), axis_name)
    aux = ConsensusAux(
        primal_residual=primal,
        dual_residual=dual,
        num_overlap=n_ovl.astype(jnp.int32),
    )
    return (
        z_local.reshape(*batch_shape, 6),
        new_delta.reshape(*batch_shape, 6),
        overlap.reshape(batch_shape),
        aux,
    )
