"""Early-ray-termination renderer (render/early_term.py) vs the
one-shot windowed path.

The reference breaks per-ray marching at transparency <= 1e-5
(rendering.py:341-345, rendering_kernel.cu:507); the TPU rebuild
slab-marches with bucketed alive-ray compaction. With ``term_eps=0``
nothing terminates and the two paths must agree to float-associativity;
with the reference eps on an opaque scene differences are bounded by
the truncated transparency, and rays must actually terminate."""

import jax
import jax.numpy as jnp
import numpy as np

from scanerf_tpu.render import renderer
from scanerf_tpu.render.early_term import _bucket, render_rays_early
from tests.test_renderer_windowed import make_scene


def _rays(n, seed=0, scale=0.3):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.randn(n, 3).astype(np.float32) * scale),
        jnp.asarray(rng.randn(n, 3).astype(np.float32)),
    )


KW = dict(num_sample=16, num_bg_sample=6, num_march=32)


def test_bucket():
    assert _bucket(1, 4096, 64) == 64
    assert _bucket(65, 4096, 64) == 128
    assert _bucket(128, 4096, 64) == 128
    assert _bucket(129, 4096, 64) == 256
    assert _bucket(5000, 4096, 64) == 4096
    assert _bucket(3, 2, 64) == 2  # bucket never exceeds the chunk


def test_eps0_matches_one_shot():
    """term_eps=0: no ray terminates, every slab runs — the slab-split
    compositing must reproduce the one-shot windowed render exactly (up
    to float associativity of the partitioned cumprod)."""
    scene = make_scene(T=2)
    rays_o, rays_d = _rays(24)
    a = renderer.render_rays(scene, rays_o, rays_d, backend="windowed",
                             **KW)
    b = render_rays_early(scene, rays_o, rays_d, slab=4, term_eps=0.0,
                          bucket_min=4, **KW)
    for k, tol in (("rgb", 1e-5), ("depth", 1e-4), ("T_left", 1e-5),
                   ("rgb_fg", 1e-5)):
        np.testing.assert_allclose(
            np.asarray(a[k]), np.asarray(b[k]), atol=tol, err_msg=k
        )
    np.testing.assert_array_equal(
        np.asarray(a["fore_valid"]), np.asarray(b["fore_valid"])
    )


def test_opaque_terminates_and_matches():
    """An opaque scene (sigma scaled up): rays terminate early, the
    evaluated row count drops, and the image stays within the T<eps
    truncation tolerance of the exact render."""
    scene = make_scene(T=2, seed=4)
    # scale features up so the decoder emits saturating densities
    scene = scene.replace(features=scene.features * 30.0)
    rays_o, rays_d = _rays(32, seed=2)
    a = renderer.render_rays(scene, rays_o, rays_d, backend="windowed",
                             **KW)
    stats = {}
    b = render_rays_early(scene, rays_o, rays_d, slab=4, term_eps=1e-5,
                          bucket_min=4, stats=stats, **KW)
    np.testing.assert_allclose(
        np.asarray(a["rgb"]), np.asarray(b["rgb"]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(a["depth"]), np.asarray(b["depth"]), atol=1e-3
    )
    # termination must actually shed work: fewer fg rows than the fixed
    # budget, and a shrinking slab occupancy
    assert stats["fg_rows"] < stats["full_fg_rows"], stats
    counts = [c for c, _ in stats["slabs"]]
    assert counts[-1] < counts[0], stats["slabs"]
    # opaque rays must NOT pay for background
    assert stats["bg_rows"] < stats["full_bg_rows"], stats


def test_invalid_rays_skip_fg_get_bg():
    """Rays that miss all occupancy never enter a fg slab but still
    composite background (T=1), matching the one-shot path."""
    scene = make_scene(T=2, seed=6)
    # rays far above the tiles pointing away: no fg intersection
    n = 8
    o = jnp.asarray(
        np.stack([np.linspace(-0.5, 2.5, n),
                  np.full(n, 0.2), np.full(n, -0.3)], -1), jnp.float32
    )
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    a = renderer.render_rays(scene, o, d, backend="windowed", **KW)
    stats = {}
    b = render_rays_early(scene, o, d, slab=4, term_eps=1e-5,
                          bucket_min=2, stats=stats, **KW)
    np.testing.assert_allclose(
        np.asarray(a["rgb"]), np.asarray(b["rgb"]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(a["T_left"]), np.asarray(b["T_left"]), atol=1e-4
    )


def test_render_image_early_term_matches():
    """Frame driver parity: render_image(early_term=True) == the
    standard chunked frame within truncation tolerance."""
    scene = make_scene(T=2, seed=8)
    scene = scene.replace(features=scene.features * 10.0)
    Kc = np.array([[20.0, 0, 8.0], [0, 20.0, 6.0], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[:, 3] = [0.5, 0.0, -2.5]
    kw = dict(num_sample=8, num_bg_sample=4, num_march=16)
    a = renderer.render_image(scene, Kc, c2w, 12, 16, chunk=64, **kw)
    stats = {}
    b = renderer.render_image(
        scene, Kc, c2w, 12, 16, chunk=64, early_term=True,
        early_kwargs=dict(slab=4, bucket_min=8, stats=stats), **kw,
    )
    np.testing.assert_allclose(a["rgb"], b["rgb"], atol=1e-4)
    assert stats["n_rays"] == 12 * 16 + (-12 * 16) % 64
