"""Loop-closure place recognition + pose-graph optimization reduce drift on
an out-and-back splat trajectory."""
import numpy as np
import cv2

from keypoint_bench_tpu.datasets.synthetic import SyntheticSE3Dataset, _texture
from keypoint_bench_tpu.runner import EvalConfig, Evaluator
from keypoint_bench_tpu.ops.grid_sample import sample_at_points
from keypoint_bench_tpu.tasks.loop_closure import (detect_loop_closures,
                                                   optimize_with_closures)


def _loop_frames(n_mid=3, image_size=256, seed=0):
    """Frames along x: 0 -> out -> back to exactly 0 (frames 0 and last
    coincide)."""
    base = SyntheticSE3Dataset(1, image_size, seed, n_blobs=900)
    rng = np.random.default_rng(seed)
    X = np.concatenate([rng.uniform(-4, 4, (900, 2)),
                        rng.uniform(4, 20, (900, 1))], axis=1)
    colors = rng.uniform(0.3, 1.0, (900, 3)).astype(np.float32)
    tex = _texture(image_size, image_size, rng) * 0.15
    xs = [0.4 * k for k in range(n_mid + 1)] + \
         [0.4 * k for k in range(n_mid - 1, -1, -1)]
    poses = []
    frames = []
    for x in xs:
        T = np.eye(4)
        T[0, 3] = x
        poses.append(T)  # cam-from-world
        img, _ = base._render(X, colors, T[:3, :3], T[:3, 3], tex)
        frames.append(img)
    return frames, poses, base.K


def test_loop_closure_reduces_drift():
    frames, poses_cam, K = _loop_frames()
    t_frames = len(frames)
    ev = Evaluator(EvalConfig(
        model_type="Alike", task_type="visual_odometer",
        data_params={"type": "synthetic_splat_sequence"},
        extractor_params={"nms_dist": 4, "threshold": 0, "border_dist": 8,
                          "top_k": 400, "min_score": 0.0},
        output_dir="/tmp/kbt_loop"))
    kpts, valids, descs = [], [], []
    for img in frames:
        s, d, k, v = ev.detect(np.asarray(img, np.float32))
        kpts.append(k)
        valids.append(v)
        descs.append(sample_at_points(d, k))
    sp = np.array([255.0, 255.0])
    kpts_px = [np.asarray(k)[:, :2] * sp for k in kpts]

    closures = detect_loop_closures(descs, valids, kpts_px, np.asarray(K),
                                    min_gap=4, min_matches=80)
    assert len(closures) >= 1, "no strong loop closures found"
    pairs = {(i, j) for (i, j, _, _) in closures}
    assert (0, t_frames - 1) in pairs or (1, t_frames - 2) in pairs, pairs

    # GT relative poses corrupted with drift noise
    rng = np.random.default_rng(3)
    R_rel = [np.eye(3)]
    t_rel = [np.zeros(3)]
    scales = [0.0]
    for i in range(1, t_frames):
        T = poses_cam[i] @ np.linalg.inv(poses_cam[i - 1])
        dR, _ = cv2.Rodrigues(rng.normal(0, 0.03, 3))
        tt = T[:3, 3]
        s = np.linalg.norm(tt)
        scales.append(s)
        t_noisy = tt / max(s, 1e-9) + rng.normal(0, 0.1, 3)
        R_rel.append(dR @ T[:3, :3])
        t_rel.append(t_noisy / np.linalg.norm(t_noisy))
    R_rel = np.stack(R_rel)
    t_rel = np.stack(t_rel)
    gt_centers = np.stack([-pc[:3, :3].T @ pc[:3, 3] for pc in poses_cam])

    def ate(Rf, tf):
        centers = np.stack([-Rf[i].T @ tf[i] for i in range(t_frames)])
        return float(np.linalg.norm(centers - gt_centers, axis=1).mean())

    R0, t0, _ = optimize_with_closures(R_rel, t_rel, scales, [], iters=0)
    R1, t1, res = optimize_with_closures(R_rel, t_rel, scales, closures,
                                         iters=15)
    a0, a1 = ate(R0, t0), ate(R1, t1)
    assert a1 < 0.8 * a0, (a0, a1)
