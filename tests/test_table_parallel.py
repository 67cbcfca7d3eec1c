"""Table parallelism: hash table sharded across a mesh axis (8 CPU
devices) must reproduce the unsharded windowed encode, values AND
gradients — memory for table/moments scales 1/n_devices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from scanerf_tpu.ops.pallas import hash_encode as hw
from scanerf_tpu.parallel import table_parallel as tp


def setup(L=4, H=2**17, N=500, seed=0):
    key = jax.random.PRNGKey(seed)
    kf, kx, kd = jax.random.split(key, 3)
    feats = jax.random.normal(kf, (L, H, 2)) * 0.1
    x = jax.random.uniform(kx, (N, 3), minval=-2.0, maxval=2.0)
    dirs = jax.random.normal(kd, (N, 3))
    res = jnp.asarray(np.tile([[65, 129, 257]], (L, 1)), jnp.int32)
    return x, dirs, feats, res


def test_sharded_encode_matches_unsharded():
    x, dirs, feats, res = setup()
    mesh = Mesh(np.array(jax.devices()), ("table",))
    feats_sh = tp.shard_features(feats, mesh, "table")
    got = tp.encode_table_parallel(x, dirs, feats_sh, res, mesh, "table")
    want = hw.hash_encode_windowed(x, feats, res)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_sharded_grads_match_unsharded():
    x, dirs, feats, res = setup(N=300)
    mesh = Mesh(np.array(jax.devices()), ("table",))

    def loss_sh(x_, f_):
        out = tp.encode_table_parallel(x_, dirs, f_, res, mesh, "table")
        return jnp.sum(out * out)

    def loss_ref(x_, f_):
        out = hw.hash_encode_windowed(x_, f_, res)
        return jnp.sum(out * out)

    gx_sh, gf_sh = jax.grad(loss_sh, argnums=(0, 1))(x, feats)
    gx, gf = jax.grad(loss_ref, argnums=(0, 1))(x, feats)
    np.testing.assert_allclose(
        np.asarray(gx_sh), np.asarray(gx), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gf_sh), np.asarray(gf), rtol=1e-4, atol=1e-6
    )
    # the feature gradient keeps the table sharding (ready for a
    # sharded optimizer)
    shard_dims = {
        s.index[1].stop - s.index[1].start
        for s in gf_sh.addressable_shards
    }
    assert shard_dims == {feats.shape[1] // 8}, shard_dims


@pytest.mark.parametrize("mode", ["gather", "runs"])
def test_sharded_encode_gather_permute_mode(mode):
    """The gather/runs permutation machinery (PERMUTE_MODE) must be
    bitwise-identical through the TABLE-SHARDED stream too — if the
    chip A/B flips the default mode, 2^24 table-parallel training must
    not regress. Values and both gradients."""
    x, dirs, feats, res = setup(N=300)
    mesh = Mesh(np.array(jax.devices()), ("table",))
    feats_sh = tp.shard_features(feats, mesh, "table")

    def loss(x_, f_):
        out = tp.encode_table_parallel(x_, dirs, f_, res, mesh, "table")
        return jnp.sum(out * out)

    want = tp.encode_table_parallel(x, dirs, feats_sh, res, mesh, "table")
    gx_want, gf_want = jax.grad(loss, argnums=(0, 1))(x, feats)
    assert hw.permute_mode() == "sort"
    try:
        hw.set_permute_mode(mode)
        if mode == "runs":
            hw.set_run_cap_frac(1.0)  # random points: ~N runs
        got = tp.encode_table_parallel(
            x, dirs, feats_sh, res, mesh, "table"
        )
        gx_got, gf_got = jax.grad(loss, argnums=(0, 1))(x, feats)
    finally:
        hw.set_permute_mode("sort")
        hw.set_run_cap_frac(0.25)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(gx_got), np.asarray(gx_want))
    np.testing.assert_array_equal(np.asarray(gf_got), np.asarray(gf_want))


def _tiny_tile(seed, H_img, W_img, images, depths, ks, c2ws, tc, views):
    from scanerf_tpu.models import field as field_lib
    from scanerf_tpu.train import cameras as cam_lib
    from scanerf_tpu.train import tile as tile_lib
    from scanerf_tpu.train.tile import TileData

    params, fstate = field_lib.create_field(
        jax.random.PRNGKey(seed),
        bbox_corner=np.array([-1.0, -1.0, -1.0]),
        bbox_size=np.array([2.0, 2.0, 2.0]),
        log2_hashmap_size=17,  # NB = 8 blocks >= 4 table shards
        grid_resolution=(8, 64),
        sampler_log2dim=3,
    )
    state = tile_lib.create_train_state(params, fstate, len(views), tc)
    data = TileData(
        images=jnp.asarray(images[views]),
        occlusions=jnp.ones((len(views), H_img, W_img), bool),
        cameras=cam_lib.make_cameras(ks[views], jnp.asarray(c2ws[views])),
        mono_depths=jnp.asarray(depths[views]),
        mono_normals=jnp.zeros((len(views), H_img, W_img, 3)),
    )
    return state, data


def test_table_parallel_train_step_matches_unsharded():
    """VERDICT r2 item 2: a full train_step on a 2D (tiles x table) mesh
    — features AND Adam moments H-sharded 4-way — must reproduce the
    unsharded windowed step's parameters."""
    import dataclasses

    from scanerf_tpu.data.synthetic import make_sphere_dataset
    from scanerf_tpu.parallel import tile_parallel as tpp
    from scanerf_tpu.train import tile as tile_lib
    from scanerf_tpu.train.tile import TrainConfig

    n_tiles, H_img, W_img = 2, 16, 16
    images, depths, ks, c2ws = make_sphere_dataset(n_tiles + 1, H_img, W_img)
    tc_sh = TrainConfig(
        num_sample=16, num_bg_sample=8, batch_log2=7, total_step=100,
        num_march=32, hash_backend="windowed", table_shards=4, rho=0.0,
    )
    tc_ref = dataclasses.replace(tc_sh, table_shards=1)
    tx = tile_lib.build_optimizer(tc_ref)

    states, datas, view_lists = [], [], []
    for t in range(n_tiles):
        views = [t, t + 1]
        view_lists.append(views)
        s, d = _tiny_tile(
            t, H_img, W_img, images, depths, ks, c2ws, tc_ref, views
        )
        states.append(s)
        datas.append(d)

    mesh = tpp.make_tile_mesh(jax.devices(), n_table=4)
    assert dict(mesh.shape) == {"tiles": 2, "table": 4}
    cam_maps = tpp.make_cam_maps(view_lists, 2)
    tiles = tpp.stack_tiles(states, cam_maps)
    data = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *datas)
    tiles, data = tpp.shard_parallel(mesh, tiles, data)

    # feature leaves and their Adam moments carry the table sharding
    feats_sh = tiles.state.params.field.features
    shard_h = {
        s.index[2].stop - s.index[2].start
        for s in feats_sh.addressable_shards
    }
    assert shard_h == {feats_sh.shape[2] // 4}, shard_h

    round_fn = tpp.build_admm_round(
        mesh, tc_sh, tx, n_inner=1, n_global_cams=n_tiles + 1,
        tiles_example=tiles,
    )
    key = jax.random.PRNGKey(42)
    new_tiles, losses, _ = round_fn(tiles, data, key)

    # reference: the same steps, unsharded, same per-tile keys
    for t in range(n_tiles):
        k_t = jax.random.fold_in(jax.random.fold_in(key, t), 0)
        ref_state, ref_aux = tile_lib.train_step(
            states[t], datas[t], k_t, tc_ref, tx
        )
        np.testing.assert_allclose(
            float(losses[t]), float(ref_aux["total_loss"]),
            rtol=1e-5, atol=1e-6,
        )
        got_f = np.asarray(
            jax.tree_util.tree_map(
                lambda x: x[t], new_tiles.state.params.field.features
            )
        )
        want_f = np.asarray(ref_state.params.field.features)
        np.testing.assert_allclose(got_f, want_f, rtol=1e-4, atol=1e-6)
        got_se3 = np.asarray(new_tiles.state.params.se3_refine[t])
        np.testing.assert_allclose(
            got_se3, np.asarray(ref_state.params.se3_refine),
            rtol=1e-4, atol=1e-6,
        )
        got_dec = jax.tree_util.tree_map(
            lambda x: np.asarray(x[t]), new_tiles.state.params.field.decoder
        )
        want_dec = jax.tree_util.tree_map(
            np.asarray, ref_state.params.field.decoder
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                a, b, rtol=1e-4, atol=1e-6
            ),
            got_dec, want_dec,
        )
