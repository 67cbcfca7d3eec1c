"""Table parallelism: hash table sharded across a mesh axis (8 CPU
devices) must reproduce the unsharded windowed encode, values AND
gradients — memory for table/moments scales 1/n_devices."""

import jax
import jax.numpy as jnp
import numpy as np
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
