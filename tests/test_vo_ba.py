"""VO -> windowed bundle adjustment: track chaining, triangulation, and LM
refinement reduce reprojection error on the splat sequence; the distributed
Schur path refines to the same answer as the single-chip solver."""
import numpy as np

from keypoint_bench_tpu.runner import EvalConfig, Evaluator
from keypoint_bench_tpu.tasks.vo_ba import chain_tracks


def test_chain_tracks():
    # two pairs; slot 0 tracks through all 3 frames, slot 1 only pair 1
    idx = np.array([[0, 0], [0, 1], [0, 0]])
    ok = np.array([[False, False], [True, True], [True, False]])
    tracks = chain_tracks(idx, ok)
    lens = sorted(len(t) for t in tracks)
    assert lens == [2, 3], tracks
    t3 = max(tracks, key=len)
    assert t3 == [(0, 0), (1, 0), (2, 0)]


def _chain_tracks_naive(match_idx, match_ok):
    """The original per-(frame, slot) reference loop (pre-round-4
    chain_tracks) — kept here as the semantics oracle."""
    t, k = match_idx.shape
    track_of = -np.ones((t, k), np.int64)
    tracks = []
    for i in range(1, t):
        for slot in range(k):
            if not match_ok[i, slot]:
                continue
            j = int(match_idx[i, slot])
            tid = track_of[i - 1, slot]
            if tid < 0:
                tid = len(tracks)
                tracks.append([(i - 1, slot)])
                track_of[i - 1, slot] = tid
            if track_of[i, j] < 0:
                tracks[tid].append((i, j))
                track_of[i, j] = tid
    return [tr for tr in tracks if len(tr) >= 2]


def test_chain_tracks_matches_naive_loop():
    """Vectorized chain_tracks == the naive O(T*K) loop on random match
    graphs with duplicate targets and broken chains."""
    rng = np.random.default_rng(0)
    for trial in range(5):
        t, k = 12, 40
        idx = rng.integers(0, k, (t, k))
        ok = rng.random((t, k)) < 0.6
        assert chain_tracks(idx, ok) == _chain_tracks_naive(idx, ok)


def test_chain_tracks_scales_to_kitti_length():
    """The round-3 verdict flagged O(T*K) interpreter steps; the vectorized
    version must chew a KITTI-scale window in interactive time."""
    import time
    rng = np.random.default_rng(1)
    t, k = 1200, 1000
    idx = rng.integers(0, k, (t, k))
    ok = rng.random((t, k)) < 0.5
    t0 = time.perf_counter()
    tracks = chain_tracks(idx, ok)
    dt = time.perf_counter() - t0
    assert len(tracks) > 0
    assert dt < 30.0, f"chain_tracks too slow: {dt:.1f}s"


def test_vo_ba_refinement_reduces_reprojection():
    cfg = EvalConfig(
        model_type="Alike", task_type="visual_odometer",
        data_params={"type": "synthetic_splat_sequence", "num_frames": 5,
                     "image_size": 256},
        extractor_params={"nms_dist": 4, "threshold": 0, "border_dist": 8,
                          "top_k": 300, "min_score": 0.0},
        matcher_params={"type": "brute_force",
                        "brute_force_params": {"max_distance": 5.0}},
        task_params={"pipelined": True, "ba_refine": True},
        output_dir="/tmp/kbt_vo_ba_test", seed=0)
    res = Evaluator(cfg).run()
    assert res["ba_tracks"] > 100
    assert np.isfinite(res["ba_reproj_after"])
    assert res["ba_reproj_after"] < res["ba_reproj_before"]
    # refined points live at sane depths in front of the first camera
    pts = res["ba_points"]
    z0 = (res["ba_R_w2c"][0] @ pts.T + res["ba_t_w2c"][0][:, None])[2]
    assert (z0 > 0).mean() > 0.95


def test_vo_ba_distributed_equals_single_chip():
    """VO e2e with task_params.ba_distributed refines through the
    landmark-partitioned psum-reduced Schur solver on the 8-device CPU mesh
    and lands on the single-chip answer (round-3 verdict item 4: the
    BASELINE.json config-5 join)."""
    base = dict(
        model_type="Alike", task_type="visual_odometer",
        data_params={"type": "synthetic_splat_sequence", "num_frames": 5,
                     "image_size": 256},
        extractor_params={"nms_dist": 4, "threshold": 0, "border_dist": 8,
                          "top_k": 300, "min_score": 0.0},
        matcher_params={"type": "brute_force",
                        "brute_force_params": {"max_distance": 5.0}},
        seed=0)
    res1 = Evaluator(EvalConfig(
        task_params={"pipelined": True, "ba_refine": True},
        output_dir="/tmp/kbt_vo_ba_single", **base)).run()
    res8 = Evaluator(EvalConfig(
        task_params={"pipelined": True, "ba_refine": True,
                     "ba_distributed": True},
        output_dir="/tmp/kbt_vo_ba_dist", **base)).run()
    assert res8["ba_tracks"] == res1["ba_tracks"]
    assert res8["ba_reproj_after"] < res8["ba_reproj_before"]
    # same Huber+LM semantics, different float summation order across
    # shards: the refined reprojection errors agree tightly
    assert abs(res8["ba_reproj_after"] - res1["ba_reproj_after"]) \
        < 0.05 * max(res1["ba_reproj_after"], 0.1)
    np.testing.assert_allclose(res8["ba_R_w2c"], res1["ba_R_w2c"], atol=2e-3)
