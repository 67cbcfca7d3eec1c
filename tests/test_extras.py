"""Tests for normals, encodings, quaternions, NDC, general MLP."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from scanerf_tpu.models import decoder as dec
from scanerf_tpu.models import field as field_lib
from scanerf_tpu.utils import lie


def test_quaternion_roundtrip():
    w = 0.6 * jax.random.normal(jax.random.PRNGKey(0), (8, 3))
    R = lie.so3_to_SO3(w)
    q = lie.R_to_q(R)
    R2 = lie.q_to_R(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)


def test_quaternion_product_invert():
    w = 0.4 * jax.random.normal(jax.random.PRNGKey(1), (4, 3))
    q = lie.R_to_q(lie.so3_to_SO3(w))
    ident = lie.q_product(q, lie.q_invert(q))
    np.testing.assert_allclose(
        np.asarray(ident), np.tile([1.0, 0, 0, 0], (4, 1)), atol=1e-4
    )


def test_ndc():
    K = jnp.array([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]])
    center = jnp.array([[0.0, 0.0, 0.5]])
    ray = jnp.array([[0.1, 0.0, 1.0]])
    c_ndc, r_ndc = lie.convert_ndc(center, ray, K, near=1.0)
    # origin moved to the z=1 plane -> z_ndc = 1 - 2*near/1 = -1
    np.testing.assert_allclose(c_ndc[0, 2], -1.0, atol=1e-5)
    assert np.isfinite(np.asarray(r_ndc)).all()


def test_positional_encoding():
    x = jnp.array([[0.5, -0.25]])
    e = dec.positional_encoding(x, 3)
    assert e.shape == (1, 2 + 3 * 2 * 2)
    np.testing.assert_allclose(e[0, :2], x[0])
    np.testing.assert_allclose(e[0, 2:4], np.sin([0.5, -0.25]), atol=1e-6)

    # weighted PE: at step=start only raw x passes; at end all bands
    w0 = dec.weighted_positional_encoding(x, 3, jnp.asarray(0.0), 0.0, 100.0)
    np.testing.assert_allclose(w0[0, 2:], 0.0, atol=1e-6)
    w1 = dec.weighted_positional_encoding(x, 3, jnp.asarray(100.0), 0.0, 100.0)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(e), atol=1e-6)


def test_general_mlp():
    key = jax.random.PRNGKey(0)
    layers = dec.init_general_mlp(key, 8, 3, hidden_depth=3, hidden_width=16)
    assert len(layers) == 3
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 8))
    y = dec.apply_general_mlp(layers, x)
    assert y.shape == (5, 3)
    single = dec.init_general_mlp(key, 8, 2, hidden_depth=1)
    assert len(single) == 1
    assert dec.apply_general_mlp(single, x).shape == (5, 2)


def test_render_normals():
    params, state = field_lib.create_field(
        jax.random.PRNGKey(0),
        bbox_corner=np.array([-1.0, -1.0, -1.0]),
        bbox_size=np.array([2.0, 2.0, 2.0]),
        log2_hashmap_size=10,
        grid_resolution=(8, 64),
        sampler_log2dim=3,
    )
    o = jnp.zeros((4, 3))
    d = jnp.asarray(np.random.RandomState(0).randn(4, 3).astype(np.float32))
    n = field_lib.render_normals(params, state, o, d, 8, jnp.asarray(0.0), num_march=32)
    assert n.shape == (4, 3)
    assert np.isfinite(np.asarray(n)).all()
    assert (np.asarray(n) >= 0).all() and (np.asarray(n) <= 1).all()


def test_city_scene_dir(tmp_path):
    """City-block generator: reference layout, unequal per-tile views,
    loadable by the training data reader."""
    from scanerf_tpu.data import io as data_io
    from scanerf_tpu.data.city import write_city_scene_dir

    d = str(tmp_path / "city")
    info = write_city_scene_dir(
        d, nx_tiles=2, nz_tiles=2, n_cameras=16, H=24, W=24
    )
    assert info["n_tiles"] == 4
    counts = list(info["views_per_tile"].values())
    assert min(counts) >= 2 and max(counts) > min(counts)  # unequal
    ks, c2ws, H, W = data_io.read_campara(
        os.path.join(d, "camera.log"), return_shape=True
    )
    assert ks.shape[0] == 16 and (H, W) == (24, 24)
    infos = data_io.read_tile_info(
        os.path.join(d, "tiles", "tile_info.txt")
    )
    assert len(infos) == 4
    views = data_io.read_training_views(
        os.path.join(d, "tiles", "training_views.txt")
    )
    scene = data_io.load_scene(d, views[0][:3], mono_depth=True)
    assert scene.images.shape == (3, 24, 24, 3)
    assert scene.mono_depths.max() <= 10.0


def test_ssim_bounded_and_identity():
    # regression: an out-of-range render (accumulation overshoot in
    # unobserved regions) produced "SSIM" 1.41 before metrics clipped
    # pred and floored the variance estimates (saved-image protocol)
    from scanerf_tpu.utils import metrics

    rng = np.random.RandomState(0)
    gt = rng.rand(32, 32, 3).astype(np.float32)
    wild = (gt + rng.randn(32, 32, 3).astype(np.float32) * 5.0)
    s = float(metrics.ssim(jnp.asarray(wild), jnp.asarray(gt)))
    assert -1.0 <= s <= 1.0
    s_id = float(metrics.ssim(jnp.asarray(gt), jnp.asarray(gt)))
    assert s_id > 0.999
    # psnr clips pred the same way: overshoot must not beat the clipped
    # version of itself
    p_wild = float(metrics.psnr(jnp.asarray(wild), jnp.asarray(gt)))
    p_clip = float(
        metrics.psnr(jnp.asarray(np.clip(wild, 0, 1)), jnp.asarray(gt))
    )
    assert abs(p_wild - p_clip) < 1e-4


def test_roofline_accounting():
    """Analytic step cost: totals equal the itemized sums, the default
    workload is HBM-bound on spec, and mfu/roofline scale inversely
    with the measured step time."""
    from scanerf_tpu.utils import roofline

    c = roofline.step_cost()
    assert c["flops_total"] == sum(c["flops"].values())
    assert c["hbm_bytes_total"] == sum(c["hbm_bytes"].values())
    assert c["points_main"] == 2**14 * 256
    assert c["points_vis"] == 2**14 * 10 * 24
    s1 = roofline.summarize(0.8)
    s2 = roofline.summarize(0.4)
    assert s1["bound"] == "hbm"
    assert abs(s2["mfu_est"] - 2 * s1["mfu_est"]) < 1e-4
    assert 0 < s1["roofline_frac"] < 1
