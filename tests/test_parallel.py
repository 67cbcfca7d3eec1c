"""Tile-parallel ADMM tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scanerf_tpu.data.synthetic import make_sphere_dataset
from scanerf_tpu.models import field as field_lib
from scanerf_tpu.parallel import consensus as consensus_lib
from scanerf_tpu.parallel import tile_parallel as tp
from scanerf_tpu.train import cameras as cam_lib
from scanerf_tpu.train import tile as tile_lib
from scanerf_tpu.train.tile import TileData, TrainConfig


def test_consensus_update_math():
    """Two tiles sharing camera 0; z must be the confidence-weighted mean."""
    mesh = tp.make_tile_mesh(jax.devices()[:2])
    M, G = 2, 3
    se3 = jnp.stack(
        [
            jnp.array([[1.0] * 6, [5.0] * 6]),  # tile 0: cams [0, 1]
            jnp.array([[3.0] * 6, [7.0] * 6]),  # tile 1: cams [0, 2]
        ]
    )
    cam_map = jnp.array([[0, 1], [0, 2]], jnp.int32)
    conf = jnp.ones((2, M))
    delta = jnp.zeros((2, M, 6))
    z_old = jnp.zeros((2, M, 6))
    rho = jnp.ones(6)

    from jax.sharding import PartitionSpec as P

    def fn(se3, conf, cam_map, z_old, delta):
        return consensus_lib.consensus_update(
            se3, conf, cam_map, z_old, delta, rho, G, axis_name="tiles"
        )

    out = jax.jit(
        jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(P("tiles"), P("tiles"), P("tiles"), P("tiles"), P("tiles")),
            out_specs=(P("tiles"), P("tiles"), P("tiles"), P()),
        )
    )(
        se3.reshape(2, M, 6),
        conf,
        cam_map,
        z_old,
        delta,
    )
    z, new_delta, overlap, aux = out
    # camera 0 shared: z = (1+3)/2 = 2; cameras 1, 2 exclusive: z = own pose
    np.testing.assert_allclose(z[0, 0], 2.0, atol=1e-6)
    np.testing.assert_allclose(z[1, 0], 2.0, atol=1e-6)
    np.testing.assert_allclose(z[0, 1], 5.0, atol=1e-6)
    np.testing.assert_allclose(z[1, 1], 7.0, atol=1e-6)
    # dual update u += 1.5 (x - z)
    np.testing.assert_allclose(new_delta[0, 0], 1.5 * (1.0 - 2.0), atol=1e-6)
    np.testing.assert_allclose(new_delta[1, 0], 1.5 * (3.0 - 2.0), atol=1e-6)
    # overlap flags only on camera 0
    assert bool(overlap[0, 0]) and bool(overlap[1, 0])
    assert not bool(overlap[0, 1]) and not bool(overlap[1, 1])
    assert int(aux.num_overlap) == 2
    # primal = mean over tiles of mean(|x - z|): each tile (1 + 0)/2 = 0.5
    np.testing.assert_allclose(float(aux.primal_residual), 0.5, atol=1e-5)
    # dual = mean(|z_new - z_old|) over all global cams: (2+5+7)/3
    np.testing.assert_allclose(float(aux.dual_residual), 14.0 / 3, atol=1e-5)


@pytest.mark.slow
def test_admm_round_8_tiles():
    n_tiles = 8
    n_cam_per_tile = 2
    H = W = 24
    images, depths, ks, c2ws = make_sphere_dataset(n_tiles + 1, H, W)
    tc = TrainConfig(
        num_sample=16, num_bg_sample=8, batch_log2=8, total_step=1000,
        num_march=64, rho=10.0,
    )
    tx = tile_lib.build_optimizer(tc)

    states, datas, view_lists = [], [], []
    for t in range(n_tiles):
        views = [t, t + 1]  # neighboring tiles share one camera
        view_lists.append(views)
        params, fstate = field_lib.create_field(
            jax.random.PRNGKey(t),
            bbox_corner=np.array([-1.0, -1.0, -1.0]),
            bbox_size=np.array([2.0, 2.0, 2.0]),
            log2_hashmap_size=10,
            grid_resolution=(8, 64),
            sampler_log2dim=3,
        )
        states.append(tile_lib.create_train_state(params, fstate, n_cam_per_tile, tc))
        datas.append(
            TileData(
                images=jnp.asarray(images[views]),
                occlusions=jnp.ones((n_cam_per_tile, H, W), bool),
                cameras=cam_lib.make_cameras(ks[views], jnp.asarray(c2ws[views])),
                mono_depths=jnp.asarray(depths[views]),
                mono_normals=jnp.zeros((n_cam_per_tile, H, W, 3)),
            )
        )

    mesh = tp.make_tile_mesh()
    cam_maps = tp.make_cam_maps(view_lists, n_cam_per_tile)
    tiles = tp.stack_tiles(states, cam_maps)
    data = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *datas)
    tiles, data = tp.shard_parallel(mesh, tiles, data)

    round_fn = tp.build_admm_round(mesh, tc, tx, n_inner=3, n_global_cams=n_tiles + 1)
    tiles, losses, aux = round_fn(tiles, data, jax.random.PRNGKey(0))
    tiles, losses, aux = round_fn(tiles, data, jax.random.PRNGKey(1))

    assert losses.shape == (n_tiles,)
    assert np.isfinite(np.asarray(losses)).all()
    assert np.isfinite(float(aux.primal_residual))
    assert int(tiles.state.step[0]) == 6
    # every camera except the endpoints is shared by two tiles
    overlap = np.asarray(tiles.state.admm.overlap_flags)
    assert overlap[1:, 0].all()  # cam t of tile t>=1 is shared
    assert overlap[:-1, 1].all()
    assert not overlap[0, 0] and not overlap[-1, 1]
