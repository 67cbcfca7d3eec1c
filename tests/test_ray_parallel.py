"""Ray-data-parallel train step (parallel/ray_parallel.py) on the
8-virtual-device CPU mesh.

The reference has no analog — it scales a tile's batch only by a bigger
GPU (one process per tile, admm_trainer.py:187-270). The DP step must
equal: per-shard gradients with the shard-folded keys, averaged, then one
optimizer update.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from scanerf_tpu.data.synthetic import make_sphere_dataset
from scanerf_tpu.parallel import ray_parallel as rp
from scanerf_tpu.train import cameras as cam_lib
from scanerf_tpu.train import tile as tile_lib
from scanerf_tpu.train.tile import TileData, TrainConfig


def _tiny(tc, n_cam=2, H=16, W=16, seed=0, log2_hashmap_size=10):
    from scanerf_tpu.models import field as field_lib

    images, depths, ks, c2ws = make_sphere_dataset(n_cam, H, W)
    params, fstate = field_lib.create_field(
        jax.random.PRNGKey(seed),
        bbox_corner=np.array([-1.0, -1.0, -1.0]),
        bbox_size=np.array([2.0, 2.0, 2.0]),
        log2_hashmap_size=log2_hashmap_size,
        grid_resolution=(8, 64),
        sampler_log2dim=3,
    )
    state = tile_lib.create_train_state(params, fstate, n_cam, tc)
    data = TileData(
        images=jnp.asarray(images),
        occlusions=jnp.ones((n_cam, H, W), bool),
        cameras=cam_lib.make_cameras(ks, jnp.asarray(c2ws)),
        mono_depths=jnp.asarray(depths),
        mono_normals=jnp.zeros((n_cam, H, W, 3)),
    )
    return state, data


def test_dp_step_matches_manual_grad_average():
    """4-way ray DP == mean of the 4 per-shard gradients + one update.

    A linear optimizer (sgd) keeps the comparison 1-ulp tight — Adam's
    g/|g| normalization at eps=1e-15 would amplify benign psum-ordering
    noise wherever the averaged gradient nearly cancels.
    """
    R = 4
    tc = TrainConfig(
        num_sample=16, num_bg_sample=8, batch_log2=6, total_step=100,
        num_march=32,
    )
    tx = optax.sgd(1e-2)
    state, data = _tiny(tc)
    state = state.replace(opt_state=tx.init(state.params))

    mesh = rp.make_ray_mesh(jax.devices()[:R])
    # the DP step donates its state and device_put may alias the master's
    # buffers on CPU — shard a copy so the manual-grad path keeps `state`
    st_sh, d_sh = rp.shard_dp(
        mesh, jax.tree_util.tree_map(jnp.copy, state), data
    )
    step_fn = rp.build_dp_step(mesh, tc, tx, state)
    key = jax.random.PRNGKey(7)
    new_state, aux = step_fn(st_sh, d_sh, key)

    grads, losses = None, []
    grad_fn = jax.jit(tile_lib.compute_grads, static_argnames=("tc",))
    for r in range(R):
        (loss, _), g = grad_fn(state, data, jax.random.fold_in(key, r), tc)
        losses.append(float(loss))
        grads = g if grads is None else jax.tree_util.tree_map(
            jnp.add, grads, g
        )
    grads = jax.tree_util.tree_map(lambda x: x / R, grads)
    updates, _ = tx.update(grads, state.opt_state, state.params)
    want = optax.apply_updates(state.params, updates)

    np.testing.assert_allclose(
        float(aux["total_loss"]), np.mean(losses), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(new_state.params.field.features),
        np.asarray(want.field.features), rtol=1e-5, atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(new_state.params.se3_refine),
        np.asarray(want.se3_refine), rtol=1e-5, atol=1e-8,
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-8
        ),
        new_state.params.field.decoder, want.field.decoder,
    )
    assert int(new_state.step) == 1
    # replicas are bit-identical: one logical value per leaf
    shards = new_state.params.se3_refine.addressable_shards
    vals = {np.asarray(s.data).tobytes() for s in shards}
    assert len(vals) == 1


def test_admm_round_with_rays_axis_matches_manual():
    """(tiles=2, rays=2) ADMM round == per-tile manual: grads at the
    round's key schedule (key -> fold rays idx -> fold tile id -> fold
    inner step), averaged over rays, one sgd update."""
    from scanerf_tpu.parallel import tile_parallel as tp

    n_tiles, R = 2, 2
    tc = TrainConfig(
        num_sample=16, num_bg_sample=8, batch_log2=6, total_step=100,
        num_march=32, rho=10.0, ray_shards=R,
    )
    tx = optax.sgd(1e-2)

    states, datas, view_lists = [], [], []
    for t in range(n_tiles):
        s, d = _tiny(tc, seed=t)
        states.append(s.replace(opt_state=tx.init(s.params)))
        datas.append(d)
        view_lists.append([t, t + 1])  # tiles share camera 1/0

    mesh = tp.make_tile_mesh(jax.devices()[: n_tiles * R], n_rays=R)
    assert dict(mesh.shape) == {"tiles": n_tiles, "rays": R}
    cam_maps = tp.make_cam_maps(view_lists, 2)
    tiles = tp.stack_tiles(states, cam_maps)
    data = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *datas)
    tiles_sh, data_sh = tp.shard_parallel(mesh, tiles, data)

    round_fn = tp.build_admm_round(
        mesh, tc, tx, n_inner=1, n_global_cams=n_tiles + 1,
        tiles_example=tiles,
    )
    key = jax.random.PRNGKey(11)
    new_tiles, losses, aux = round_fn(tiles_sh, data_sh, key)

    grad_fn = jax.jit(tile_lib.compute_grads, static_argnames=("tc",))
    for t in range(n_tiles):
        grads = None
        for r in range(R):
            k = jax.random.fold_in(jax.random.fold_in(key, r), t)
            k = jax.random.fold_in(k, 0)  # inner step 0
            _, g = grad_fn(states[t], datas[t], k, tc)
            grads = g if grads is None else jax.tree_util.tree_map(
                jnp.add, grads, g
            )
        grads = jax.tree_util.tree_map(lambda x: x / R, grads)
        updates, _ = tx.update(grads, states[t].opt_state, states[t].params)
        want = optax.apply_updates(states[t].params, updates)
        np.testing.assert_allclose(
            np.asarray(new_tiles.state.params.field.features[t]),
            np.asarray(want.field.features), rtol=1e-5, atol=1e-8,
        )
        np.testing.assert_allclose(
            np.asarray(new_tiles.state.params.se3_refine[t]),
            np.asarray(want.se3_refine), rtol=1e-5, atol=1e-8,
        )
    assert np.isfinite(np.asarray(losses)).all()
    assert np.isfinite(float(aux.primal_residual))
    # consensus state is identical across the rays replicas: the stacked
    # logical value has exactly n_tiles distinct per-tile rows
    z = new_tiles.state.admm.shared_se3
    assert np.isfinite(np.asarray(z)).all()
    assert int(new_tiles.state.step[0]) == 1


@pytest.mark.slow
def test_dp_composes_with_table_sharding():
    """(rays=2, table=4) must reproduce the plain rays=2 DP step —
    windowed backend, features + Adam moments H-sharded."""
    tc1 = TrainConfig(
        num_sample=16, num_bg_sample=8, batch_log2=6, total_step=100,
        num_march=32, hash_backend="windowed",
    )
    tc4 = dataclasses.replace(tc1, table_shards=4)
    tx = optax.sgd(1e-2)
    # >= 16384 rows so effective_backend keeps "windowed", and NB = 8
    # window blocks >= 4 table shards (same bound as test_table_parallel)
    state, data = _tiny(tc1, log2_hashmap_size=17)
    state = state.replace(opt_state=tx.init(state.params))
    key = jax.random.PRNGKey(3)

    mesh1 = rp.make_ray_mesh(jax.devices()[:2])
    st1, d1 = rp.shard_dp(
        mesh1, jax.tree_util.tree_map(jnp.copy, state), data
    )
    ref_state, ref_aux = rp.build_dp_step(mesh1, tc1, tx, state)(st1, d1, key)

    mesh2 = rp.make_ray_mesh(jax.devices(), n_table=4)
    assert dict(mesh2.shape) == {"rays": 2, "table": 4}
    st2, d2 = rp.shard_dp(
        mesh2, jax.tree_util.tree_map(jnp.copy, state), data
    )
    feats = st2.params.field.features
    shard_h = {
        s.index[1].stop - s.index[1].start for s in feats.addressable_shards
    }
    assert shard_h == {feats.shape[1] // 4}, shard_h
    new_state, aux = rp.build_dp_step(mesh2, tc4, tx, state)(st2, d2, key)

    np.testing.assert_allclose(
        float(aux["total_loss"]), float(ref_aux["total_loss"]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(new_state.params.field.features),
        np.asarray(ref_state.params.field.features),
        rtol=1e-4, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(new_state.params.se3_refine),
        np.asarray(ref_state.params.se3_refine), rtol=1e-4, atol=1e-7,
    )
