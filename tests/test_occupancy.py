"""Occupancy pruning tests."""

import jax
import jax.numpy as jnp
import numpy as np

from scanerf_tpu.models import field as field_lib
from scanerf_tpu.models import occupancy


def test_prune_keeps_dense_region():
    params, state = field_lib.create_field(
        jax.random.PRNGKey(0),
        bbox_corner=np.array([-1.0, -1.0, -1.0]),
        bbox_size=np.array([2.0, 2.0, 2.0]),
        log2_hashmap_size=10,
        grid_resolution=(8, 64),
        sampler_log2dim=3,
    )
    # bias the sigma head so density is high everywhere
    dec = dict(params.decoder)
    dec["sigma"] = {
        "w": params.decoder["sigma"]["w"],
        "b": params.decoder["sigma"]["b"] + 10.0,
    }
    params_hi = params.replace(decoder=dec)
    new_state = occupancy.prune_occupancy(
        params_hi, state, step=0, finest_resolution=np.array([64, 64, 64]),
        sub_split=False, pruning_th=0.4,
    )
    assert np.asarray(new_state.occupied_grid).all()

    # and low density everywhere -> all pruned
    dec["sigma"] = {
        "w": params.decoder["sigma"]["w"] * 0.0,
        "b": params.decoder["sigma"]["b"] * 0.0 - 10.0,
    }
    params_lo = params.replace(decoder=dec)
    new_state2 = occupancy.prune_occupancy(
        params_lo, state, step=0, finest_resolution=np.array([64, 64, 64]),
        sub_split=False, pruning_th=0.4,
    )
    assert not np.asarray(new_state2.occupied_grid).any()


def test_prune_subsplit_doubles_resolution():
    params, state = field_lib.create_field(
        jax.random.PRNGKey(1),
        bbox_corner=np.array([-1.0, -1.0, -1.0]),
        bbox_size=np.array([2.0, 2.0, 2.0]),
        log2_hashmap_size=10,
        grid_resolution=(8, 64),
        sampler_log2dim=3,
    )
    dec = dict(params.decoder)
    dec["sigma"] = {"w": params.decoder["sigma"]["w"], "b": params.decoder["sigma"]["b"] + 10.0}
    params = params.replace(decoder=dec)
    old_shape = np.asarray(state.occupied_grid).shape
    new_state = occupancy.prune_occupancy(
        params, state, step=12000, finest_resolution=np.array([64, 64, 64]),
        sub_split=True, pruning_th=0.1,
    )
    assert np.asarray(new_state.occupied_grid).shape == tuple(2 * s for s in old_shape)


def test_pruning_schedule():
    s = occupancy.PruningSchedule(
        [4, 5, 6, 7], [0.1, 0.2, 0.3], adjust_step=100, dynamic_step=100
    )
    assert not s.should_prune(0)
    assert not s.should_prune(50)
    assert s.should_prune(100)
    # step 100 -> index 1 of the ladder (step // ADJUST_STEP), split 4->5
    sub, th = s.next_at(100)
    assert sub and th == 0.2
    sub, th = s.next_at(200)
    assert sub and th == 0.3
    sub, th = s.next_at(300)
    assert sub and th == 0.3  # th clamps to last
    sub, th = s.next_at(400)  # past the ladder: refresh without split
    assert not sub and th == 0.3


def test_pruning_schedule_golden_vs_reference():
    """Golden ladder vs a direct transcription of tile.py:62-65,866-877:
    events fire every dynamic_step=5000 within [0, TOTAL-10000]
    (inclusive end); ladder indices are step // ADJUST_STEP, each list
    clamped independently."""
    log2dims = [4, 5, 6, 7, 8, 9]
    ths = [0.1, 0.2, 0.3, 0.4]
    adjust, total = 2000, 40000
    s = occupancy.PruningSchedule(log2dims, ths, adjust, total_step=total)

    events = []
    for step in range(total + 1):
        if s.should_prune(step):
            events.append((step,) + s.params_at(step))

    # reference transcription (tile.py:866-872 with dynamic_start=0,
    # dynamic_end=TOTAL-10000, dynamic_step=5000)
    ref = []
    for step in range(1, total + 1):
        if step <= total - 10000 and step % 5000 == 0:
            i = min(step // adjust, len(log2dims) - 1)
            j = min(step // adjust, len(ths) - 1)
            ref.append((step, log2dims[i], ths[j]))
    assert events == ref
    # 5000//2000 = 2 -> log2dim 6, th 0.3; last event at 30000 clamps
    assert events[0] == (5000, 6, 0.3)
    assert events[-1] == (30000, 9, 0.4)


def test_inference_sigma_backend_matches_layout():
    """Pruning density queries must use the hash layout the table was
    trained with: for a windowed table, the windowed lookup and the
    global-hash lookup give DIFFERENT features, so backend plumbing
    matters (regression for the silent global-hash default)."""
    from scanerf_tpu.ops.hash_encode import hash_encode
    from scanerf_tpu.ops.pallas.hash_encode import hash_encode_windowed_ref

    params, state = field_lib.create_field(
        jax.random.PRNGKey(2),
        bbox_corner=np.array([-1.0, -1.0, -1.0]),
        bbox_size=np.array([2.0, 2.0, 2.0]),
        log2_hashmap_size=14,
        grid_resolution=(8, 64),
        sampler_log2dim=3,
    )
    pts = jnp.asarray(
        np.random.RandomState(0).uniform(-1, 1, (64, 3)).astype(np.float32)
    )
    s_win = field_lib.field_inference_sigma(
        params, state, pts, jnp.asarray(1e6), backend="windowed"
    )
    s_xla = field_lib.field_inference_sigma(
        params, state, pts, jnp.asarray(1e6), backend="xla"
    )
    # sanity: the two lookups disagree on random tables...
    assert not np.allclose(np.asarray(s_win), np.asarray(s_xla))
    # ...and the windowed path equals a direct windowed-ref evaluation
    from scanerf_tpu.models import decoder as decoder_lib

    feats = hash_encode_windowed_ref(
        pts, params.features, state.resolutions
    )
    want = decoder_lib.inference_sigma(params.decoder, feats)
    np.testing.assert_allclose(
        np.asarray(s_win)[..., 0], np.asarray(want)[..., 0], rtol=1e-5
    )


def test_pruning_multi_rung_jump_and_round_window():
    """Review findings: (a) the ladder can jump several rungs between
    5000-step events (default config: 4 -> 6 at the first event) and
    next_at must report ALL the needed subdivisions; (b) the trainer
    only sees round boundaries, so should_prune must fire when a
    dynamic_step multiple falls anywhere inside the round."""
    s = occupancy.PruningSchedule(
        [4, 5, 6, 7, 8, 9], [0.1, 0.2, 0.3, 0.4], adjust_step=2000,
        total_step=40000,
    )
    n, _ = s.next_at(5000)   # target log2dim 6: two doublings from 4
    assert n == 2
    n, _ = s.next_at(10000)  # target 9 (idx 5 clamped): three more
    assert n == 3
    n, _ = s.next_at(15000)
    assert n == 0

    s2 = occupancy.PruningSchedule([4], [0.1], 2000, total_step=40000)
    # SYN_ITERS=300: boundaries 4800, 5100 — the 5000 event must fire
    assert not s2.should_prune(4800, round_size=300)
    assert s2.should_prune(5100, round_size=300)
    assert not s2.should_prune(5400, round_size=300)
    # events stop after dynamic_end = 30000
    assert s2.should_prune(30000, round_size=300)
    assert not s2.should_prune(35100, round_size=300)

    # ADVICE r2: an event multiple strictly past dynamic_end must not
    # fire even when the round containing it starts before dynamic_end
    # (TOTAL_STEP=19950 -> dynamic_end=9950; the 10000 multiple is out)
    s3 = occupancy.PruningSchedule([4], [0.1], 2000, total_step=19950)
    assert not s3.should_prune(10000, round_size=100)
    assert s3.should_prune(5000, round_size=100)
    # inclusive end: a multiple exactly at dynamic_end fires
    s4 = occupancy.PruningSchedule([4], [0.1], 2000, total_step=20000)
    assert s4.should_prune(10050, round_size=100)


def test_prune_applies_multi_subdivision():
    params, state = field_lib.create_field(
        jax.random.PRNGKey(1),
        bbox_corner=np.array([-1.0, -1.0, -1.0]),
        bbox_size=np.array([2.0, 2.0, 2.0]),
        log2_hashmap_size=10,
        grid_resolution=(8, 64),
        sampler_log2dim=3,
    )
    dec = dict(params.decoder)
    dec["sigma"] = {"w": params.decoder["sigma"]["w"],
                    "b": params.decoder["sigma"]["b"] + 10.0}
    params = params.replace(decoder=dec)
    out = occupancy.prune_occupancy(
        params, state, step=12000, finest_resolution=np.array([64, 64, 64]),
        sub_split=2, pruning_th=0.1,
    )
    assert np.asarray(out.occupied_grid).shape == (32, 32, 32)
