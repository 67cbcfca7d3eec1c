"""Parity: Pallas windowed hash kernel vs the pure-jnp oracle.

Runs in interpret mode on CPU (conftest forces the cpu backend). The
oracle ``hash_encode_windowed_ref`` uses identical index math via XLA
gather/scatter, so fwd/bwd must agree to float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scanerf_tpu.ops.pallas import hash_encode as hw

L = 4
H = 16384  # minimum table: one block (W=512 x WB=32)


def _make_inputs(key, n_points, h=H, levels=L, spread=2.0):
    kp, kf = jax.random.split(key)
    pts = jax.random.uniform(kp, (n_points, 3), minval=-spread, maxval=spread)
    feats = 0.1 * jax.random.normal(kf, (levels, h, 2), jnp.float32)
    res = jnp.asarray(
        np.stack(
            [np.array([16, 16, 16]) * (2**i) for i in range(levels)]
        ),
        jnp.int32,
    )
    return pts, feats, res


def test_forward_parity():
    pts, feats, res = _make_inputs(jax.random.PRNGKey(0), 1000)
    out_k = hw.hash_encode_windowed(pts, feats, res)
    out_r = hw.hash_encode_windowed_ref(pts, feats, res)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=1e-5, atol=1e-6)


def test_forward_parity_multiblock():
    # H=65536 -> 4 blocks; clustered + uniform points exercise dense and
    # sparse blocks, block changes, and empty blocks
    key = jax.random.PRNGKey(1)
    pts, feats, res = _make_inputs(key, 700, h=65536)
    cluster = 0.01 * jax.random.normal(key, (500, 3)) + 1.3
    pts = jnp.concatenate([pts[:200], cluster], axis=0)
    out_k = hw.hash_encode_windowed(pts, feats, res)
    out_r = hw.hash_encode_windowed_ref(pts, feats, res)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=1e-5, atol=1e-6)


def test_backward_parity():
    pts, feats, res = _make_inputs(jax.random.PRNGKey(2), 600)
    tang = jax.random.normal(jax.random.PRNGKey(3), (600, L * 2))

    def loss_k(p, f):
        return jnp.sum(hw.hash_encode_windowed(p, f, res) * tang)

    def loss_r(p, f):
        return jnp.sum(hw.hash_encode_windowed_ref(p, f, res) * tang)

    dp_k, df_k = jax.grad(loss_k, argnums=(0, 1))(pts, feats)
    dp_r, df_r = jax.grad(loss_r, argnums=(0, 1))(pts, feats)
    np.testing.assert_allclose(np.asarray(df_k), np.asarray(df_r),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dp_k), np.asarray(dp_r),
                               rtol=1e-4, atol=1e-4)


def test_backward_parity_multiblock():
    key = jax.random.PRNGKey(4)
    pts, feats, res = _make_inputs(key, 900, h=65536)
    tang = jax.random.normal(jax.random.PRNGKey(5), (900, L * 2))

    def loss_k(p, f):
        return jnp.sum(hw.hash_encode_windowed(p, f, res) * tang)

    def loss_r(p, f):
        return jnp.sum(hw.hash_encode_windowed_ref(p, f, res) * tang)

    dp_k, df_k = jax.grad(loss_k, argnums=(0, 1))(pts, feats)
    dp_r, df_r = jax.grad(loss_r, argnums=(0, 1))(pts, feats)
    np.testing.assert_allclose(np.asarray(df_k), np.asarray(df_r),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dp_k), np.asarray(dp_r),
                               rtol=1e-4, atol=1e-4)


def test_window_id_range():
    pts = jnp.asarray(
        [[-2.0, -2.0, -2.0], [2.0, 2.0, 2.0], [0.0, 0.0, 0.0]]
    )
    u = (pts + 2.0) * 0.25
    wid = hw.window_id(u, H)
    NW, NB, dims = hw.geometry(H)
    assert NW == 32 and NB == 1
    assert (np.asarray(wid) >= 0).all() and (np.asarray(wid) < NW).all()


def test_expand_warp_monotone_and_bounds():
    u = jnp.linspace(0.0, 1.0, 257)
    w = np.asarray(hw.expand_warp(u))
    assert w[0] == 0.0 and abs(w[-1] - 1.0) < 1e-6
    assert (np.diff(w) > 0).all()
    # fg octant [0.25, 0.75] stretches to [0.125, 0.875]
    assert abs(float(hw.expand_warp(jnp.asarray(0.25))) - 0.125) < 1e-6
    assert abs(float(hw.expand_warp(jnp.asarray(0.75))) - 0.875) < 1e-6


@pytest.mark.parametrize("n", [1, 127, 128, 129])
def test_odd_sizes(n):
    pts, feats, res = _make_inputs(jax.random.PRNGKey(6), n)
    out_k = hw.hash_encode_windowed(pts, feats, res)
    out_r = hw.hash_encode_windowed_ref(pts, feats, res)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=1e-5, atol=1e-6)


def test_backward_bf16_onehot_bounded_error():
    """bf16 one-hot backward (hash_bwd_bf16): table gradients match the
    exact path to bf16 rounding (~2^-8 relative); the one-hot itself and
    the accumulation are exact, so errors never exceed per-contribution
    rounding."""
    pts, feats, res = _make_inputs(jax.random.PRNGKey(6), 800)
    tang = jax.random.normal(jax.random.PRNGKey(7), (800, L * 2))
    N = pts.shape[0]

    def grads(onehot_bf16):
        def loss(p, f):
            stream = hw.sort_pack(p, jnp.zeros_like(p), H)
            feats_s = hw.hash_lookup_sorted(
                stream.pts, stream.meta, stream.visited, f, res,
                onehot_bf16,
            )
            rows = hw.unsort_rows(feats_s, stream.pidp, None, N)
            return jnp.sum(rows * tang)

        return jax.grad(loss, argnums=(0, 1))(pts, feats)

    dp_x, df_x = grads(False)
    dp_b, df_b = grads(True)
    # dL/dpoints is computed in f32 either way (regather path) — exact
    np.testing.assert_allclose(
        np.asarray(dp_b), np.asarray(dp_x), rtol=1e-6, atol=1e-6
    )
    # table gradient: bf16-rounded contributions, f32 accumulation
    scale = np.abs(np.asarray(df_x)).max()
    err = np.abs(np.asarray(df_b) - np.asarray(df_x)).max()
    assert err <= 0.02 * scale, (err, scale)
    # and it is not a broken/zero path
    assert np.abs(np.asarray(df_b)).max() > 0


@pytest.mark.parametrize("mode", ["gather", "gather_narrow", "runs"])
def test_permute_gather_mode_bitwise_parity(mode):
    # "gather"/"runs" permutation machinery must reproduce the "sort"
    # path BITWISE: identical permutation, different application
    # (PERF.md round-3 sort-tax work). Random points are maximally
    # incoherent (~N runs), so "runs" needs cap frac 1.0 here to stay
    # on its run-table branch; the coherent/fallback splits are covered
    # by the two tests below.
    if mode == "runs":
        hw.set_run_cap_frac(1.0)
    key = jax.random.PRNGKey(6)
    pts, feats, res = _make_inputs(key, 900, h=65536)
    cluster = 0.01 * jax.random.normal(key, (300, 3)) + 1.3
    pts = jnp.concatenate([pts[:600], cluster], axis=0)
    tang = jax.random.normal(jax.random.PRNGKey(7), (900, L * 2))
    dirs = jax.random.normal(jax.random.PRNGKey(8), (900, 3))

    def run():
        def loss(p, f):
            return jnp.sum(hw.hash_encode_windowed(p, f, res) * tang)

        val = hw.hash_encode_windowed(pts, feats, res)
        dp, df = jax.grad(loss, argnums=(0, 1))(pts, feats)
        # exercise unsort_rows/sort_pack directly too (dirs cotangent)
        def loss2(p, d):
            s = hw.sort_pack(p, d, 65536)
            cols = s.pts[:, 0:4, :].transpose(0, 2, 1).reshape(-1, 4)
            r = hw.unsort_rows(cols, s.pidp, s.inv_full, p.shape[0])
            return jnp.sum(r * r)

        v2, (dp2, dd2) = jax.value_and_grad(loss2, argnums=(0, 1))(pts, dirs)
        return val, dp, df, v2, dp2, dd2

    assert hw.permute_mode() == "sort"
    ref = run()
    hw.set_permute_mode(mode)
    try:
        got = run()
    finally:
        hw.set_permute_mode("sort")
        hw.set_run_cap_frac(0.25)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _coherent_stream(n_rays=24, n_samples=96):
    """Ray-like stream: piecewise-constant window ids (few runs), the
    workload "runs" mode is designed for."""
    key = jax.random.PRNGKey(11)
    ko, kd = jax.random.split(key)
    o = jax.random.uniform(ko, (n_rays, 1, 3), minval=-0.5, maxval=0.5)
    d = jax.random.normal(kd, (n_rays, 1, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jnp.linspace(0.05, 1.6, n_samples)[None, :, None]
    pts = jnp.clip(o + t * d, -1.99, 1.99).reshape(-1, 3)
    dirs = jnp.broadcast_to(d, (n_rays, n_samples, 3)).reshape(-1, 3)
    return pts, dirs


def _stream_tuple(s):
    return (s.pts, s.meta, s.pidp.astype(jnp.int32),
            s.inv_full, s.visited)


def test_permute_runs_coherent_stream_bitwise():
    # Default cap frac (0.25): a ray-coherent stream stays on the
    # run-table branch and must match the sort path bitwise, including
    # meta/pidp/inv_full and gradients through sort_pack+unsort.
    pts, dirs = _coherent_stream()
    N = pts.shape[0]
    wid = hw.window_id((pts + 2.0) * 0.25, 65536)
    n_runs = int(np.sum(np.asarray(wid)[1:] != np.asarray(wid)[:-1])) + 1
    assert n_runs <= hw._run_capacity(N), (n_runs, N)  # stays on-branch

    def grads(p, d):
        def loss(p, d):
            s = hw.sort_pack(p, d, 65536)
            cols = s.pts[:, 0:4, :].transpose(0, 2, 1).reshape(-1, 4)
            r = hw.unsort_rows(cols, s.pidp, s.inv_full, p.shape[0])
            return jnp.sum(r * r)
        return jax.value_and_grad(loss, argnums=(0, 1))(p, d)

    assert hw.permute_mode() == "sort"
    ref_s = _stream_tuple(hw.sort_pack(pts, dirs, 65536))
    ref_g = grads(pts, dirs)
    hw.set_permute_mode("runs")
    try:
        got_s = _stream_tuple(hw.sort_pack(pts, dirs, 65536))
        got_g = grads(pts, dirs)
    finally:
        hw.set_permute_mode("sort")
    for a, b in zip(ref_s, got_s):
        if a is None:
            continue  # sort mode computes no inv_full
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(ref_g[0]), np.asarray(got_g[0]))
    for a, b in zip(ref_g[1], got_g[1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_permute_runs_overflow_falls_back():
    # More runs than the static capacity: the lax.cond fallback must
    # kick in and still produce the exact sorted-path stream.
    key = jax.random.PRNGKey(12)
    pts, _, _ = _make_inputs(key, 900, h=65536)  # ~900 runs
    dirs = jax.random.normal(jax.random.PRNGKey(13), (900, 3))
    assert hw.permute_mode() == "sort"
    ref = _stream_tuple(hw.sort_pack(pts, dirs, 65536))
    hw.set_permute_mode("runs")
    try:
        # floor capacity (256) << 900 runs -> fallback branch
        hw.set_run_cap_frac(1e-6)
        got = _stream_tuple(hw.sort_pack(pts, dirs, 65536))
    finally:
        hw.set_permute_mode("sort")
        hw.set_run_cap_frac(0.25)
    for a, b in zip(ref, got):
        if a is None:
            continue
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
