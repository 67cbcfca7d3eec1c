"""Multi-tile renderer: windowed fast path vs staged oracle, capped
per-sample tiles, and multi-exit-tile background blending
(rendering_kernel.cu pts_inference / update_outgoing_bidx semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from scanerf_tpu.models import decoder as decoder_lib
from scanerf_tpu.ops.hash_encode import make_level_resolutions
from scanerf_tpu.render import renderer


def make_scene(T=2, H=2**14, layout="windowed", seed=0):
    """T tiles of equal size side by side along x, 0.2 overlap."""
    key = jax.random.PRNGKey(seed)
    L = 16
    inner_size = np.array([2.0, 2.0, 2.0], np.float32)
    corners, feats, decs = [], [], []
    for t in range(T):
        key, kf, kd = jax.random.split(key, 3)
        inner_corner = np.array([-1.0 + t * 1.6, -1.0, -1.0], np.float32)
        center = inner_corner + inner_size / 2
        corners.append(center - inner_size)  # DOUBLED bbox corner
        feats.append(jax.random.normal(kf, (L, H, 2)) * 0.1)
        decs.append(decoder_lib.init_decoder(kd))
    res = make_level_resolutions(
        np.array([32, 32, 32]), np.array([512, 512, 512]), L
    )
    corners = np.stack(corners)
    sizes = np.broadcast_to(inner_size * 2, (T, 3))
    occ = np.ones((T, 8, 8, 8), bool)
    ug, uc, us = renderer.build_union_grid(corners, sizes, occ)
    return renderer.MultiTileScene(
        features=jnp.stack(feats),
        decoders=jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *decs),
        resolutions=jnp.broadcast_to(jnp.asarray(res), (T, L, 3)),
        block_corner=jnp.asarray(corners),
        block_size=jnp.asarray(sizes),
        occupied=jnp.asarray(occ),
        union_occ=jnp.asarray(ug),
        union_corner=jnp.asarray(uc),
        union_size=jnp.asarray(us),
        hash_layout=layout,
    )


def test_windowed_matches_staged():
    """The capped-slot sorted-stream path must reproduce the per-tile
    unrolled oracle (T=2 <= MAX_PTS_BLOCKS: identical slot sets)."""
    scene = make_scene()
    rng = np.random.RandomState(0)
    rays_o = jnp.asarray(rng.randn(24, 3).astype(np.float32) * 0.3)
    rays_d = jnp.asarray(rng.randn(24, 3).astype(np.float32))
    kw = dict(num_sample=12, num_bg_sample=6, num_march=32)
    a = renderer.render_rays(scene, rays_o, rays_d, backend="xla", **kw)
    b = renderer.render_rays(scene, rays_o, rays_d, backend="windowed", **kw)
    np.testing.assert_allclose(
        np.asarray(a["rgb"]), np.asarray(b["rgb"]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(a["depth"]), np.asarray(b["depth"]), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(a["T_left"]), np.asarray(b["T_left"]), atol=2e-5
    )


def test_exit_slots_multi_and_single():
    """Rays exiting through a face shared by both doubled bboxes blend
    two tiles; rays exiting through one tile's own face get one slot of
    weight 1 (update_outgoing_bidx :1262-1380)."""
    scene = make_scene()
    # both doubled bboxes span z in [-3, 1]... corner z=-3, size 4 -> z
    # exit plane z=+1 shared; +z ray from inside both tiles
    o = jnp.asarray([[0.5, 0.0, 0.0], [0.5, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]], jnp.float32)
    tiles, w, far, bg_valid = renderer._exit_slots(scene, o, d, 2)
    w = np.asarray(w)
    assert bool(bg_valid[0]) and bool(bg_valid[1])
    # ray 0 exits both tiles at z=1: two positive weights summing to 1
    assert (w[0] > 0).sum() == 2, w[0]
    np.testing.assert_allclose(w[0].sum(), 1.0, atol=1e-6)
    # ray 1 exits through tile 1's +x face only: single slot, weight 1
    assert (w[1] > 0).sum() == 1, w[1]
    assert np.asarray(tiles)[1][np.argmax(w[1])] == 1
    np.testing.assert_allclose(w[1].max(), 1.0, atol=1e-6)


def test_bg_seam_continuity():
    """Background color must vary continuously across the tile seam
    (VERDICT item 5: single-exit blending produced a jump)."""
    scene = make_scene(seed=3)
    xs = np.linspace(0.2, 0.7, 41, dtype=np.float32)  # crosses the seam
    o = jnp.asarray(np.stack([xs, np.zeros_like(xs), np.zeros_like(xs)], -1))
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), o.shape)
    out = renderer.render_rays(
        scene, o, d, num_sample=8, num_bg_sample=8, num_march=16,
        backend="windowed",
    )
    rgb = np.asarray(out["rgb"])
    jumps = np.abs(np.diff(rgb, axis=0)).max(-1)
    # neighboring rays 0.0125 apart: no isolated discontinuity
    assert jumps.max() < 0.05, jumps.max()


def test_render_sharded_matches_single():
    """Ray-sharded SPMD render == single-device render (8 CPU devices),
    for both the staged oracle and the windowed Pallas backend (the
    windowed path's pallas_call + local sorts must work under
    shard_map)."""
    from jax.sharding import Mesh

    scene = make_scene(seed=5)
    rng = np.random.RandomState(4)
    rays_o = jnp.asarray(rng.randn(32, 3).astype(np.float32) * 0.3)
    rays_d = jnp.asarray(rng.randn(32, 3).astype(np.float32))
    mesh = Mesh(np.array(jax.devices()), ("rays",))
    for backend in ("xla", "windowed"):
        kw = dict(num_sample=8, num_bg_sample=4, num_march=16,
                  backend=backend)
        a = renderer.render_rays(scene, rays_o, rays_d, **kw)
        b = renderer.render_rays_sharded(scene, rays_o, rays_d, mesh, **kw)
        np.testing.assert_allclose(
            np.asarray(a["rgb"]), np.asarray(b["rgb"]), atol=1e-5,
            err_msg=backend,
        )
        np.testing.assert_allclose(
            np.asarray(a["depth"]), np.asarray(b["depth"]), atol=1e-4,
            err_msg=backend,
        )


def test_multi_table_stream_matches_per_table():
    """sort_pack_tables + one kernel call over stacked tables == the
    per-table windowed reference lookup."""
    from scanerf_tpu.ops.pallas import hash_encode as hw

    key = jax.random.PRNGKey(7)
    T, L, H = 2, 4, 2**14
    feats = jax.random.normal(key, (T, L, H, 2)) * 0.1
    res = jnp.asarray(np.tile([[33, 65, 129]], (L, 1)), jnp.int32)
    rng = np.random.RandomState(2)
    N = 300
    x = jnp.asarray(rng.uniform(-2, 2, (N, 3)).astype(np.float32))
    tids = jnp.asarray(rng.randint(0, T, N), jnp.int32)

    stream = hw.sort_pack_tables(x, jnp.zeros_like(x), tids, H, T)
    feat_flat = feats.transpose(1, 0, 2, 3).reshape(L, T * H, 2)
    got = hw.unsort_rows(
        hw.hash_lookup_sorted(
            stream.pts, stream.meta, stream.visited, feat_flat, res
        ),
        stream.pidp, stream.inv_full, N,
    )
    want_per_table = [
        hw.hash_encode_windowed_ref(x, feats[t], res) for t in range(T)
    ]
    want = jnp.where(
        (tids == 0)[:, None], want_per_table[0], want_per_table[1]
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_fg_slots_cap_and_weights():
    scene = make_scene()
    # a point in the overlap region of both inner bboxes
    pts = jnp.asarray([[[0.7, 0.0, 0.0]], [[-0.5, 0.0, 0.0]]], jnp.float32)
    tags, w, m_any, m_eval = renderer._fg_slots(scene, pts, 2)
    m = np.asarray(m_any)
    assert m[0, 0].sum() == 2  # overlap: both tiles
    assert m[1, 0].sum() == 1  # only tile 0 contains x=-0.5
    assert np.asarray(w)[1, 0][~m[1, 0]].sum() == 0.0


def test_bf16_tables_render_close():
    """bf16 inference tables (load_scene(dtype=bfloat16)) render within
    quantization distance of the f32 path (VERDICT round-1 missing item
    4: keep exported tables half-width in-kernel)."""
    scene = make_scene(seed=9)
    scene16 = scene.replace(features=scene.features.astype(jnp.bfloat16))
    rng = np.random.RandomState(6)
    rays_o = jnp.asarray(rng.randn(16, 3).astype(np.float32) * 0.3)
    rays_d = jnp.asarray(rng.randn(16, 3).astype(np.float32))
    kw = dict(num_sample=8, num_bg_sample=4, num_march=16,
              backend="windowed")
    a = renderer.render_rays(scene, rays_o, rays_d, **kw)
    b = renderer.render_rays(scene16, rays_o, rays_d, **kw)
    d = np.abs(np.asarray(a["rgb"]) - np.asarray(b["rgb"]))
    assert d.mean() < 5e-3, d.mean()
    assert np.isfinite(np.asarray(b["rgb"])).all()


def test_fused_decoder_matches_unfused():
    """The in-kernel ShallowMLP (ops/pallas/fused_render.py) must
    reproduce the chunk-batched XLA decoder on the same sorted stream."""
    scene = make_scene(T=2)
    rng = np.random.RandomState(7)
    rays_o = jnp.asarray(rng.randn(16, 3).astype(np.float32) * 0.3)
    rays_d = jnp.asarray(rng.randn(16, 3).astype(np.float32))
    kw = dict(num_sample=10, num_bg_sample=5, num_march=32,
              backend="windowed")
    a = renderer.render_rays(scene, rays_o, rays_d, fuse_decoder=False, **kw)
    b = renderer.render_rays(scene, rays_o, rays_d, fuse_decoder=True, **kw)
    np.testing.assert_allclose(
        np.asarray(a["rgb"]), np.asarray(b["rgb"]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(a["depth"]), np.asarray(b["depth"]), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(a["T_left"]), np.asarray(b["T_left"]), atol=2e-5
    )


def _with_lut(scene):
    lut, lc, lcell, ldims = renderer.build_tile_lut(
        np.asarray(scene.block_corner), np.asarray(scene.block_size)
    )
    return scene.replace(
        tile_lut=jnp.asarray(lut), lut_corner=jnp.asarray(lc),
        lut_cell=jnp.asarray(lcell), lut_dims=ldims,
    )


def test_fg_slots_lut_matches_exhaustive():
    """The rasterized tile-LUT slot assignment (O(candidates)) must
    reproduce the per-tile exhaustive loop on every valid slot."""
    for T in (2, 4, 8, 32):
        scene = _with_lut(make_scene(T=T, seed=T))
        rng = np.random.RandomState(T)
        pts = jnp.asarray(
            rng.uniform(-1.5, -1.0 + T * 1.6 + 1.5, (40, 9, 3))
            .astype(np.float32)
        )
        K = min(4, T)
        t_a, w_a, m_a, e_a = renderer._fg_slots(scene, pts, K)
        t_b, w_b, m_b, e_b = renderer._fg_slots_lut(scene, pts, K)
        np.testing.assert_array_equal(np.asarray(m_a), np.asarray(m_b))
        np.testing.assert_array_equal(np.asarray(e_a), np.asarray(e_b))
        np.testing.assert_allclose(
            np.asarray(w_a), np.asarray(w_b), rtol=1e-6, atol=1e-7
        )
        m = np.asarray(m_a)
        np.testing.assert_array_equal(
            np.asarray(t_a)[m], np.asarray(t_b)[m]
        )


def test_windowed_lut_render_matches_no_lut():
    """Full windowed render with the tile LUT == without (T=2)."""
    scene = make_scene(T=2, seed=3)
    scene_lut = _with_lut(scene)
    rng = np.random.RandomState(5)
    rays_o = jnp.asarray(rng.randn(12, 3).astype(np.float32) * 0.3)
    rays_d = jnp.asarray(rng.randn(12, 3).astype(np.float32))
    kw = dict(num_sample=8, num_bg_sample=4, num_march=32,
              backend="windowed")
    a = renderer.render_rays(scene, rays_o, rays_d, **kw)
    b = renderer.render_rays(scene_lut, rays_o, rays_d, **kw)
    np.testing.assert_allclose(
        np.asarray(a["rgb"]), np.asarray(b["rgb"]), atol=1e-6
    )


def test_features_flat_matches_fallback():
    """Precomputed [L, T*H, F] tables (load_scene's features_flat) must
    render identically to the in-graph transpose fallback — the
    precompute exists because the per-chunk transpose OOMs at T=32
    (16 GB of XLA layout padding for 2 GB of tables)."""
    scene = make_scene(T=2, seed=7)
    flat = renderer.flatten_tables(np.asarray(scene.features))
    scene_flat = scene.replace(features_flat=jnp.asarray(flat))
    rng = np.random.RandomState(11)
    rays_o = jnp.asarray(rng.randn(12, 3).astype(np.float32) * 0.3)
    rays_d = jnp.asarray(rng.randn(12, 3).astype(np.float32))
    kw = dict(num_sample=8, num_bg_sample=4, num_march=32,
              backend="windowed")
    a = renderer.render_rays(scene, rays_o, rays_d, **kw)
    b = renderer.render_rays(scene_flat, rays_o, rays_d, **kw)
    np.testing.assert_array_equal(np.asarray(a["rgb"]), np.asarray(b["rgb"]))
    np.testing.assert_array_equal(
        np.asarray(a["depth"]), np.asarray(b["depth"])
    )


def test_render_permute_runs_bitwise():
    """The full windowed render must be BITWISE identical under the
    "runs" permutation machinery (PERF.md round-3d) — both on the
    run-table branch (cap 1.0) and through the lax.cond fallback
    (floor capacity). The slot-major stream order exists precisely so
    production chunks stay on the run branch."""
    from scanerf_tpu.ops.pallas import hash_encode as hw

    scene = make_scene(seed=5)
    rng = np.random.RandomState(21)
    rays_o = jnp.asarray(rng.randn(16, 3).astype(np.float32) * 0.3)
    rays_d = jnp.asarray(rng.randn(16, 3).astype(np.float32))
    kw = dict(num_sample=10, num_bg_sample=5, num_march=32,
              backend="windowed")
    assert hw.permute_mode() == "sort"
    want = renderer.render_rays(scene, rays_o, rays_d, **kw)
    try:
        hw.set_permute_mode("runs")
        for cap in (1.0, 1e-6):  # run branch / fallback branch
            hw.set_run_cap_frac(cap)
            got = renderer.render_rays(scene, rays_o, rays_d, **kw)
            for k in ("rgb", "depth", "T_left"):
                np.testing.assert_array_equal(
                    np.asarray(want[k]), np.asarray(got[k]),
                    err_msg=f"cap={cap} key={k}",
                )
    finally:
        hw.set_permute_mode("sort")
        hw.set_run_cap_frac(0.25)
