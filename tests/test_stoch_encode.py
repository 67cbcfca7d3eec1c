"""Stochastic-corner backward: unbiasedness and exact-dPoints tests."""

import jax
import jax.numpy as jnp
import numpy as np

from scanerf_tpu.ops import hash_encode as he


def setup(L=2, H=2**10, N=64, seed=0):
    key = jax.random.PRNGKey(seed)
    feats = 0.1 * jax.random.normal(key, (L, H, 2))
    res = jnp.asarray(
        np.stack([np.array([16, 16, 16]) * 2**i for i in range(L)]).astype(np.int32)
    )
    pts = jax.random.uniform(jax.random.PRNGKey(seed + 1), (N, 3), minval=-1.9, maxval=1.9)
    return pts, feats, res


def test_forward_matches_exact():
    pts, feats, res = setup()
    a = he.hash_encode(pts, feats, res)
    b = he.hash_encode_stoch(pts, feats, res)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_dpoints_unbiased():
    """dPoints now uses one uniform-sampled corner (x8 scaling): per-point
    values are noisy but unbiased — check aggregate statistics."""
    pts, feats, res = setup(N=20000)
    g_exact = jax.grad(lambda p: jnp.sum(he.hash_encode(p, feats, res)))(pts)
    g_stoch = jax.grad(lambda p: jnp.sum(he.hash_encode_stoch(p, feats, res)))(pts)
    ge, gs = np.asarray(g_exact), np.asarray(g_stoch)
    # population means match per dimension (law of large numbers)
    scale = np.abs(ge).mean()
    np.testing.assert_allclose(gs.mean(0), ge.mean(0), atol=0.05 * scale + 1e-6)
    # direction correlates over the whole batch; a single-corner
    # estimator of an 8-term sum carries ~7x signal variance, which
    # bounds the expected cosine near 1/sqrt(8) ~ 0.35 — the pose-
    # recovery integration test is the end-to-end check that this noise
    # level still drives bundle adjustment
    cos = (ge * gs).sum() / (np.linalg.norm(ge) * np.linalg.norm(gs) + 1e-12)
    assert cos > 0.25, float(cos)


def test_dtable_unbiased():
    """Averaged over many points per cell, the stochastic table gradient
    must approximate the exact one (law of large numbers)."""
    L, H = 1, 2**8
    feats = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (L, H, 2))
    res = jnp.asarray(np.array([[4, 4, 4]], np.int32))
    # many random points -> dense coverage of the 4^3 lattice
    pts = jax.random.uniform(jax.random.PRNGKey(1), (200000, 3), minval=-1.99, maxval=1.99)

    g_exact = jax.grad(lambda f: jnp.sum(he.hash_encode(pts, f, res)))(feats)
    g_stoch = jax.grad(lambda f: jnp.sum(he.hash_encode_stoch(pts, f, res)))(feats)
    ge = np.asarray(g_exact).ravel()
    gs = np.asarray(g_stoch).ravel()
    big = np.abs(ge) > np.abs(ge).max() * 0.05
    rel = np.abs(gs[big] - ge[big]) / np.abs(ge[big])
    assert np.median(rel) < 0.15, float(np.median(rel))
    # totals match closely
    np.testing.assert_allclose(gs.sum(), ge.sum(), rtol=0.02)


def test_sparse_adam_matches_dense_on_active_and_freezes_inactive():
    import optax

    from scanerf_tpu.train.sparse_adam import scale_by_sparse_adam

    p = jnp.ones((8, 2))
    g = jnp.zeros((8, 2)).at[2].set(1.0).at[5].set(-0.5)

    sp = scale_by_sparse_adam(b1=0.9, b2=0.99, eps=1e-15)
    de = optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-15)
    s_sp, s_de = sp.init(p), de.init(p)
    u_sp, s_sp = sp.update(g, s_sp)
    u_de, s_de = de.update(g, s_de)
    # active rows match dense Adam's first step exactly
    np.testing.assert_allclose(np.asarray(u_sp)[2], np.asarray(u_de)[2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(u_sp)[5], np.asarray(u_de)[5], atol=1e-6)
    # inactive rows emit exactly zero
    mask = np.ones(8, bool); mask[[2, 5]] = False
    assert (np.asarray(u_sp)[mask] == 0).all()
    # second step with zero grad everywhere: sparse freezes, counts stay
    u2, s_sp2 = sp.update(jnp.zeros_like(g), s_sp)
    assert (np.asarray(u2) == 0).all()
    np.testing.assert_array_equal(np.asarray(s_sp2.count), np.asarray(s_sp.count))
