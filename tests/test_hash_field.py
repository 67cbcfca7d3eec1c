"""Hash encoder + decoder + field tests, including a NumPy hash oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from scanerf_tpu.models import decoder as dec
from scanerf_tpu.models import field as field_lib
from scanerf_tpu.ops import hash_encode as he


# ------------------------------------------------------------- hash oracle

def numpy_hash(loc, hashmap_size):
    """Prime-XOR hash oracle (hashgrid_bg_kernel.cu:14-24)."""
    primes = np.array([1, 2654435761, 805459861], dtype=np.uint64)
    x = loc.astype(np.uint64)
    h = (x[..., 0] * primes[0]) % (1 << 32)
    h ^= (x[..., 1] * primes[1]) % (1 << 32)
    h ^= (x[..., 2] * primes[2]) % (1 << 32)
    return (h & (hashmap_size - 1)).astype(np.int64)


def test_hash_index_matches_oracle():
    rng = np.random.RandomState(0)
    loc = rng.randint(0, 4096, size=(100, 3)).astype(np.int32)
    ours = he.hash_index(jnp.asarray(loc), 2**14)
    ref = numpy_hash(loc, 2**14)
    np.testing.assert_array_equal(np.asarray(ours, dtype=np.int64), ref)


def numpy_hash_encode(points, features, resolutions):
    """Dense NumPy oracle for the trilinear hash encoding forward."""
    L, H, F = features.shape
    N = points.shape[0]
    u = (points + 2.0) / 4.0
    out = np.zeros((N, L, F), dtype=np.float32)
    corners = np.array(
        [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)]
    )  # 000..111 with x slowest — matches linear_weight order
    corners = corners[[0, 1, 2, 3, 4, 5, 6, 7]]
    # reorder to (000,001,010,011,100,101,110,111) = x-major like kernel
    for l in range(L):
        v = u * (resolutions[l] - 1)
        bl = np.floor(v).astype(np.int64)
        off = v - bl
        for ci, c in enumerate(corners):
            w = 1.0
            for ax in range(3):
                w = w * (off[:, ax] if c[ax] else (1 - off[:, ax]))
            idx = numpy_hash(bl + c, H)
            out[:, l] += w[:, None] * features[l][idx]
    return out.reshape(N, L * F)


def test_hash_encode_matches_oracle():
    rng = np.random.RandomState(1)
    L, H, F = 4, 2**10, 2
    features = rng.randn(L, H, F).astype(np.float32) * 0.1
    resolutions = np.stack(
        [np.array([16, 16, 16]) * 2**i for i in range(L)]
    ).astype(np.int32)
    pts = (rng.rand(64, 3).astype(np.float32) * 4 - 2) * 0.99
    ours = he.hash_encode(jnp.asarray(pts), jnp.asarray(features), jnp.asarray(resolutions))
    ref = numpy_hash_encode(pts, features, resolutions)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_hash_encode_gradients_flow():
    L, H = 2, 256
    key = jax.random.PRNGKey(0)
    features = 0.1 * jax.random.normal(key, (L, H, 2))
    resolutions = jnp.array([[8, 8, 8], [32, 32, 32]], dtype=jnp.int32)
    pts = jnp.array([[0.1, -0.3, 0.7]])

    g_feat = jax.grad(lambda f: jnp.sum(he.hash_encode(pts, f, resolutions)))(features)
    assert float(jnp.sum(jnp.abs(g_feat))) > 0
    # exactly 8 table rows per level touched (up to hash collisions)
    touched = int(jnp.sum(jnp.any(g_feat != 0, axis=-1)))
    assert touched <= 16

    g_pts = jax.grad(lambda p: jnp.sum(he.hash_encode(p, features, resolutions)))(pts)
    assert jnp.all(jnp.isfinite(g_pts))


def test_level_resolutions_geometric():
    res = he.make_level_resolutions([16, 16, 16], [512, 512, 512], 16)
    assert res.shape == (16, 3)
    assert (res[0] == 16).all() and (res[-1] == 512).all()
    assert (np.diff(res[:, 0]) >= 0).all()


# ----------------------------------------------------------------- decoder

def test_decoder_shapes_and_ranges():
    params = dec.init_decoder(jax.random.PRNGKey(0))
    feats = jax.random.normal(jax.random.PRNGKey(1), (10, 32))
    dirs = jax.random.normal(jax.random.PRNGKey(2), (10, 3))
    out = dec.apply_decoder(params, feats, dirs, jnp.ones(32))
    assert out["sigma"].shape == (10, 1)
    assert out["diffuse"].shape == (10, 3)
    assert (out["sigma"] >= 0).all()
    for k in ("diffuse", "specular", "tint"):
        assert (out[k] >= 0).all() and (out[k] <= 1).all()


def test_decoder_pack_roundtrip():
    params = dec.init_decoder(jax.random.PRNGKey(3))
    vec = dec.pack_params(params)
    assert vec.shape == (dec.PARAMSIZE,)
    params2 = dec.unpack_params(vec)
    for name, p in params.items():
        np.testing.assert_allclose(params2[name]["w"], p["w"], atol=1e-6)
        np.testing.assert_allclose(params2[name]["b"], p["b"], atol=1e-6)


def test_gaussian_act():
    np.testing.assert_allclose(
        dec.gaussian_act(jnp.array([0.0, 0.1])), [1.0, np.exp(-0.5)], atol=1e-5
    )


# ------------------------------------------------------------------- field

def make_tiny_field(key=0, log2=12):
    return field_lib.create_field(
        jax.random.PRNGKey(key),
        bbox_corner=np.array([-1.0, -1.0, -1.0]),
        bbox_size=np.array([2.0, 2.0, 2.0]),
        log2_hashmap_size=log2,
        grid_resolution=(16, 256),
        sampler_log2dim=4,
    )


def test_contract_fore_maps_inner_bbox():
    _, state = make_tiny_field()
    inner_c = np.asarray(field_lib.inner_corner(state))
    inner_s = np.asarray(field_lib.inner_size(state))
    lo = field_lib.contract_fore(state, jnp.asarray(inner_c))
    hi = field_lib.contract_fore(state, jnp.asarray(inner_c + inner_s))
    np.testing.assert_allclose(lo, [-1, -1, -1], atol=1e-5)
    np.testing.assert_allclose(hi, [1, 1, 1], atol=1e-5)


def test_contract_bg_bounded():
    _, state = make_tiny_field()
    pts = jnp.asarray(np.random.RandomState(0).randn(100, 3) * 50)
    y = field_lib.contract_bg(state, pts)
    assert float(jnp.max(jnp.abs(y))) <= 2.0 + 1e-4


def test_weight_feature_schedule():
    w0 = field_lib.weight_feature(jnp.asarray(0.0))
    assert w0.shape == (16,)
    np.testing.assert_allclose(w0[:8], 1.0, atol=1e-6)  # alpha=8 at step 0
    np.testing.assert_allclose(w0[8:], 0.0, atol=1e-6)
    w_full = field_lib.weight_feature(jnp.asarray(10000.0))
    np.testing.assert_allclose(w_full, 1.0, atol=1e-6)


def test_render_rays_shapes_and_finiteness():
    params, state = make_tiny_field()
    N = 16
    rng = np.random.RandomState(0)
    o = jnp.asarray(rng.randn(N, 3).astype(np.float32) * 0.1)
    d = jnp.asarray(rng.randn(N, 3).astype(np.float32))
    out = field_lib.render_rays(
        params, state, o, d, num_fg_sample=32, num_bg_sample=16,
        step=jnp.asarray(0.0), num_march=128,
    )
    assert out["pred_color"].shape == (N, 3)
    assert out["pred_depth"].shape == (N, 1)
    for k in ("pred_color", "pred_depth", "l2_reg_specular", "T_left"):
        assert np.isfinite(np.asarray(out[k])).all(), k
    assert (np.asarray(out["pred_color"]) >= 0).all()


def test_render_rays_grad_finite():
    params, state = make_tiny_field()
    o = jnp.zeros((4, 3))
    d = jnp.asarray(np.random.RandomState(1).randn(4, 3).astype(np.float32))

    def loss_fn(p):
        out = field_lib.render_rays(
            p, state, o, d, 16, 8, jnp.asarray(100.0), num_march=64
        )
        return jnp.mean(out["pred_color"] ** 2) + 0.01 * out["l2_reg_specular"]

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
