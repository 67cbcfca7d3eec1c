"""Benchmark: single-tile training throughput in rays/sec on one chip.

Workload mirrors the reference default (``config/default.yaml``): 2^14 rays
per step, 128 fg + 128 bg samples per ray, 16x2 hash features. The hash
table is 2^21 per level here (fits one chip with Adam moments alongside the
other state; the reference default 2^24 is a multi-chip configuration).

Two configurations are measured (VERDICT round-1 item 3):

- **full recipe** (the headline): the reference's default LOSS block —
  WARP 1.0 (K=10 neighbor visibility re-render), DEPTH 0.01, SMOOTH
  0.001, RHO 100 (``/root/reference/config/default.yaml``),
- **rgb-only**: photometric-only training (w_warp=w_depth=w_smooth=rho=0),
  the round-1 configuration, kept for cross-round comparability.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}
where value is the FULL-RECIPE rays/sec and vs_baseline is value / 5e6
(the 5M rays/sec v4-8 north-star from BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def build(tc_kwargs):
    import jax
    import jax.numpy as jnp

    from scanerf_tpu.models import field as field_lib
    from scanerf_tpu.train import cameras as cam_lib
    from scanerf_tpu.train import tile as tile_lib
    from scanerf_tpu.train.tile import TileData, TrainConfig
    from scanerf_tpu.data.synthetic import make_sphere_dataset

    n_cameras, H, W = 16, 256, 256
    images, depths, ks, c2ws = make_sphere_dataset(n_cameras, H, W)
    tc = TrainConfig(
        num_sample=128,
        num_bg_sample=128,
        batch_log2=14,
        total_step=40000,
        num_march=512,
        # the sorted-stream Pallas kernel path (exact gradients); the
        # round-1 number (2322 rays/s) was hash_backend="xla" with the
        # stochastic-corner estimator
        hash_backend="windowed",
        stochastic_hash_grad=False,
        **tc_kwargs,
    )
    params, fstate = field_lib.create_field(
        jax.random.PRNGKey(0),
        bbox_corner=np.array([-1.0, -1.0, -1.0]),
        bbox_size=np.array([2.0, 2.0, 2.0]),
        log2_hashmap_size=21,
        grid_resolution=(32, 2048),
        sampler_log2dim=6,
    )
    state = tile_lib.create_train_state(params, fstate, n_cameras, tc)
    data = TileData(
        images=jnp.asarray(images),
        occlusions=jnp.ones(images.shape[:3], bool),
        cameras=cam_lib.make_cameras(ks, jnp.asarray(c2ws)),
        mono_depths=jnp.asarray(depths),
        mono_normals=jnp.zeros((*images.shape[:3], 3)),
    )
    tx = tile_lib.build_optimizer(tc)
    return state, data, tc, tx


def measure(tc_kwargs, n_steps=10, fuse=False):
    """Step throughput. ``fuse=True`` runs n_steps inside ONE dispatch
    (the trainer's fori_loop round shape) — measured round 3: ~10%
    SLOWER on this fabric than the async per-step dispatch loop (which
    already pipelines; the dynamic fori adds overhead), so the default
    stays per-step, which is also round-1/2 comparable."""
    import functools

    import jax

    from scanerf_tpu.train import tile as tile_lib

    state, data, tc, tx = build(tc_kwargs)
    n_cameras = data.images.shape[0]
    rays_per_step = (2**tc.batch_log2 // n_cameras) // 4 * 4 * n_cameras

    key = jax.random.PRNGKey(0)

    if fuse:
        import jax.numpy as jnp

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_n(state, data, key, n):
            def body(i, carry):
                st, _ = carry
                k = jax.random.fold_in(key, i)
                st, aux = tile_lib.train_step.__wrapped__(
                    st, data, k, tc, tx)
                return st, aux["total_loss"]

            return jax.lax.fori_loop(
                0, n, body, (state, jnp.asarray(0.0)))

        state, loss = run_n(state, data, key, jnp.asarray(2))  # compile
        _ = float(loss)
        t0 = time.perf_counter()
        state, loss = run_n(state, data, jax.random.fold_in(key, 7),
                            jnp.asarray(n_steps))
        _ = float(loss)
        dt = time.perf_counter() - t0
        return rays_per_step * n_steps / dt

    # warmup + compile; NOTE: on the axon tunnel block_until_ready can
    # return before remote execution completes — force host fetches
    for i in range(3):
        key, sub = jax.random.split(key)
        state, aux = tile_lib.train_step(state, data, sub, tc, tx)
    _ = float(aux["total_loss"])

    t0 = time.perf_counter()
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        state, aux = tile_lib.train_step(state, data, sub, tc, tx)
    _ = float(aux["total_loss"])  # forces the whole dependency chain
    dt = time.perf_counter() - t0
    return rays_per_step * n_steps / dt


def _wait_for_backend(max_wait_s, probe_timeout_s=120):
    """The axon tunnel goes UNAVAILABLE for tens of minutes after an
    abandoned server-side compile (PERF.md fabric notes). Probe backend
    init in a SUBPROCESS (a wedged init can hang >20 min; the parent
    must stay responsive) and only proceed once a trivial matmul works.
    Returns True when the backend is up, False on timeout."""
    import subprocess

    code = (
        "import jax, jax.numpy as jnp;"
        "x = jnp.ones((256, 256));"
        "print(float((x @ x).sum()))"
    )
    deadline = time.monotonic() + max_wait_s
    while True:
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            return False
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                timeout=min(probe_timeout_s, max(remaining, 5)),
                capture_output=True,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() >= deadline:
            return False
        print("bench: TPU backend unavailable, retrying...", file=sys.stderr)
        time.sleep(30)


def _git_rev():
    """HEAD rev at measurement time — cached chip records get replayed
    across commits, and a record without a rev silently attributes a
    stale measurement to whatever HEAD the consumer is looking at."""
    import subprocess

    try:
        return subprocess.run(
            ["git", "-C", _REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def _fallback_line(reason):
    """The most recent real-chip measurement (written on every successful
    run, by main --measure AND by chip-worklist bench runs mid-round),
    clearly marked as stale — it IS a genuine measurement of this repo
    on the real chip, just made earlier in the round. BENCH_PARTIAL.json
    (written phase-by-phase by an interrupted --measure child) wins over
    the cache when it is newer."""
    def rank(c):
        # a full-recipe record (the headline metric) beats an rgb-only
        # phase partial regardless of age; recency breaks ties
        return ("full_recipe" in c.get("metric", ""),
                c.get("measured_at", ""))

    out = None
    for path in ("BENCH_PARTIAL.json", "BENCH_CHIP_CACHE.json"):
        try:
            with open(os.path.join(_REPO, path)) as f:
                cand = json.load(f)
            if cand.get("value") and (out is None or rank(cand) > rank(out)):
                out = cand
        except Exception:
            continue
    if out is None:
        out = {
            "metric": "training_rays_per_sec_full_recipe",
            "value": 0.0,
            "unit": "rays/s",
            "vs_baseline": 0.0,
        }
    out["stale"] = "replayed_cached_chip_measurement"
    out["error"] = reason
    # the rev the cached record was MEASURED at (stamped when written);
    # records predating the stamp are explicitly unknown, and the
    # replaying HEAD is recorded separately so the mismatch is visible
    out.setdefault("git_rev", "unknown")
    out["replayed_at_rev"] = _git_rev()
    return out


def main():
    """Driver entry. GUARANTEE: one JSON line on stdout within
    BENCH_BUDGET_S seconds (default 1500) no matter what the fabric
    does — round 3's driver run was killed by an external timeout while
    a post-outage compile dragged on, and the round recorded null.
    The measurement itself runs in a watchdogged child (--measure);
    on child timeout/crash the freshest of its phase-partial output or
    the last chip cache is replayed, marked stale."""
    import subprocess

    t0 = time.monotonic()
    budget = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    reserve = 15.0  # always leave room to print the fallback line

    # scale the backend wait with what the budget can actually spare:
    # everything beyond (expected measure time + reserve) may be spent
    # waiting out a fabric outage — a hard low cap wastes budget that
    # could have bought a live measurement instead of a stale replay
    expected_measure_s = 700.0  # 2 compiles (~200 s each) + timed steps
    spare = budget - reserve - expected_measure_s
    if not _wait_for_backend(max_wait_s=max(min(spare, budget / 2), 60.0)):
        print(json.dumps(_fallback_line("tpu_backend_unavailable")))
        return
    try:
        os.unlink(os.path.join(_REPO, "BENCH_PARTIAL.json"))
    except OSError:
        pass
    remaining = budget - (time.monotonic() - t0) - reserve
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--measure"],
            timeout=max(remaining, 30), capture_output=True, text=True,
        )
        sys.stderr.write(r.stderr[-4000:])
        line = None
        for ln in reversed(r.stdout.splitlines()):
            ln = ln.strip()
            if ln.startswith("{"):
                line = ln
                break
        if r.returncode == 0 and line is not None:
            json.loads(line)  # validate before relaying
            print(line)
            return
        reason = f"measure_child_rc_{r.returncode}"
    except subprocess.TimeoutExpired:
        reason = "measure_child_timeout"
    except Exception as e:  # pragma: no cover - defensive
        reason = f"measure_child_{type(e).__name__}"
    print(json.dumps(_fallback_line(reason)))


# the exact configuration the headline measures (VERDICT r4 weak 4):
# table size is 2^21 (single-chip; the reference default 2^24 is the
# TABLE_SHARDS=2 two-chip configuration, see PERF.md), and the warp-vis
# gate re-render runs the lean 16/8/64 counts (quality-A/B'd; set
# warp_vis_* = 128/128/512 for literal reference parity)
def _config_stamp():
    from scanerf_tpu.train.tile import TrainConfig

    tc = TrainConfig()
    return {
        "git_rev": _git_rev(),
        "log2_hashmap_size": 21,
        "warp_vis": f"{tc.warp_vis_sample}/{tc.warp_vis_bg_sample}"
                    f"/{tc.warp_vis_march}",
        "warp_top_k": tc.warp_top_k,
    }


def _measure_main():
    # the fused hash+MLP training kernels are the default; if their
    # compile fails on this fabric (Mosaic rejections only surface on
    # real-chip compiles), fall back to the unfused windowed path so the
    # round still records an honest number
    fused = True
    try:
        rgb_only = measure(
            dict(w_warp=0.0, w_depth=0.0, w_smooth=0.0, rho=0.0)
        )
    except Exception:
        import traceback

        traceback.print_exc(file=sys.stderr)
        print("bench: fused decoder failed, retrying unfused",
              file=sys.stderr)
        fused = False
        rgb_only = measure(
            dict(w_warp=0.0, w_depth=0.0, w_smooth=0.0, rho=0.0,
                 fused_decoder=False)
        )
    _write_partial({
        "metric": "training_rays_per_sec_rgb_only",
        "value": round(rgb_only, 1),
        "unit": "rays/s",
        "vs_baseline": round(rgb_only / 5e6, 4),
        "fused_decoder": fused,
    })
    # reference config/default.yaml LOSS block + RHO. The attached
    # fabric occasionally wedges mid-session (PERF.md); if the second,
    # larger compile dies, still report the rgb-only measurement so the
    # run records SOMETHING comparable.
    try:
        full_kwargs = dict(w_warp=1.0, w_depth=0.01, w_smooth=0.001,
                           rho=100.0, warp_start=0)
        if not fused:
            full_kwargs["fused_decoder"] = False
        full = measure(full_kwargs)
        out = {
            "metric": "training_rays_per_sec_full_recipe",
            "value": round(full, 1),
            "unit": "rays/s",
            "vs_baseline": round(full / 5e6, 4),
            "rgb_only_rays_per_sec": round(rgb_only, 1),
            "fused_decoder": fused,
        }
        out.update(_config_stamp())
        # hardware-relative accounting (VERDICT r4 weak 3): analytic
        # step FLOPs+bytes vs v5e spec peaks -> how much single-chip
        # headroom the measured step time leaves on THIS workload
        try:
            from scanerf_tpu.utils.roofline import summarize

            out["roofline"] = summarize(16384.0 / full)
        except Exception:
            pass
    except Exception as e:  # pragma: no cover - fabric failure path
        import traceback

        traceback.print_exc(file=sys.stderr)
        out = {
            "metric": "training_rays_per_sec_rgb_only",
            "value": round(rgb_only, 1),
            "unit": "rays/s",
            "vs_baseline": round(rgb_only / 5e6, 4),
            "full_recipe_error": type(e).__name__,
        }
        out.update(_config_stamp())
    try:
        out_cache = dict(out)
        out_cache["measured_at"] = time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        with open(os.path.join(_REPO, "BENCH_CHIP_CACHE.json"), "w") as f:
            json.dump(out_cache, f)
    except Exception:
        pass
    print(json.dumps(out))


_REPO = os.path.dirname(os.path.abspath(__file__))


def _write_partial(out):
    """Phase-complete partial result; replayed by the parent watchdog if
    a later, bigger compile is what blows the budget."""
    try:
        out = dict(out)
        out["measured_at"] = time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        out["partial"] = True
        out.setdefault("git_rev", _git_rev())
        with open(os.path.join(_REPO, "BENCH_PARTIAL.json"), "w") as f:
            json.dump(out, f)
    except Exception:
        pass


if __name__ == "__main__":
    if "--measure" in sys.argv[1:]:
        _measure_main()
    else:
        main()


