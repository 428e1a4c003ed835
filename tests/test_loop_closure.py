"""Loop-closure place recognition + pose-graph optimization reduce drift on
an out-and-back splat trajectory (strong/coincident revisits and scale-aware
parallax revisits)."""
import numpy as np
import cv2
import jax

from keypoint_bench_tpu.datasets.synthetic import SyntheticSE3Dataset, _texture
from keypoint_bench_tpu.runner import EvalConfig, Evaluator
from keypoint_bench_tpu.ops.grid_sample import sample_at_points
from keypoint_bench_tpu.tasks.loop_closure import (
    detect_loop_closures, detect_loop_closures_scaled,
    optimize_with_closures)


def _loop_frames(n_mid=3, image_size=256, seed=0, return_offset=0.0,
                 depth_range=(4.0, 20.0), tex_scale=0.15, bg_depths=None):
    """Frames along x: 0 -> out -> back (optionally on a parallel line offset
    by `return_offset` in y, so revisits have real parallax). tex_scale > 0.15
    gives distinctive descriptors (identical gaussian blobs alias under view
    change, which poisons wide-baseline closure matching); bg_depths moves the
    textured planes (keypoint parallax must be observable for metric
    closures — at the default depth 30 a 0.3 translation moves ~2 px)."""
    base = SyntheticSE3Dataset(1, image_size, seed, n_blobs=900)
    if bg_depths is not None:
        base._BG_DEPTHS = bg_depths
    rng = np.random.default_rng(seed)
    X = np.concatenate([rng.uniform(-4, 4, (900, 2)),
                        rng.uniform(*depth_range, (900, 1))], axis=1)
    colors = rng.uniform(0.3, 1.0, (900, 3)).astype(np.float32)
    tex = _texture(image_size, image_size, rng) * tex_scale
    xs = [(0.4 * k, 0.0) for k in range(n_mid + 1)] + \
         [(0.4 * k, return_offset) for k in range(n_mid - 1, -1, -1)]
    poses = []
    frames = []
    for x, y in xs:
        T = np.eye(4)
        T[0, 3] = x
        T[1, 3] = y
        poses.append(T)  # cam-from-world
        img, _ = base._render(X, colors, T[:3, :3], T[:3, 3], tex)
        frames.append(img)
    return frames, poses, base.K


def _detect_all(frames):
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
    size = frames[0].shape[0] - 1.0
    kpts_px = [np.asarray(k)[:, :2] * np.array([size, size]) for k in kpts]
    return kpts_px, valids, descs


def _noisy_odometry(poses_cam, seed=3, rot_noise=0.03, dir_noise=0.1):
    rng = np.random.default_rng(seed)
    R_rel, t_rel, scales = [np.eye(3)], [np.zeros(3)], [0.0]
    for i in range(1, len(poses_cam)):
        T = poses_cam[i] @ np.linalg.inv(poses_cam[i - 1])
        dR, _ = cv2.Rodrigues(rng.normal(0, rot_noise, 3))
        tt = T[:3, 3]
        s = np.linalg.norm(tt)
        scales.append(s)
        t_noisy = tt / max(s, 1e-9) + rng.normal(0, dir_noise, 3)
        R_rel.append(dR @ T[:3, :3])
        t_rel.append(t_noisy / np.linalg.norm(t_noisy))
    return np.stack(R_rel), np.stack(t_rel), scales


def _ate(Rf, tf, poses_cam):
    gt = np.stack([-pc[:3, :3].T @ pc[:3, 3] for pc in poses_cam])
    centers = np.stack([-Rf[i].T @ tf[i] for i in range(len(poses_cam))])
    return float(np.linalg.norm(centers - gt, axis=1).mean())


def test_loop_closure_reduces_drift():
    frames, poses_cam, K = _loop_frames()
    t_frames = len(frames)
    kpts_px, valids, descs = _detect_all(frames)

    closures = detect_loop_closures(descs, valids, kpts_px, np.asarray(K),
                                    min_gap=4, min_matches=80)
    assert len(closures) >= 1, "no strong loop closures found"
    pairs = {(i, j) for (i, j, _, _) in closures}
    assert (0, t_frames - 1) in pairs or (1, t_frames - 2) in pairs, pairs

    R_rel, t_rel, scales = _noisy_odometry(poses_cam)
    R0, t0, _ = optimize_with_closures(R_rel, t_rel, scales, [], iters=0)
    R1, t1, res = optimize_with_closures(R_rel, t_rel, scales, closures,
                                         iters=15)
    a0 = _ate(R0, t0, poses_cam)
    a1 = _ate(R1, t1, poses_cam)
    assert a1 < 0.8 * a0, (a0, a1)


def _geometric_loop_fixture(n_pts=200, t_frames=6, seed=0,
                            closure_offset=(0.05, 0.3, 0.0)):
    """Controlled-geometry fixture: unique descriptors per 3D point shared
    across frames (no appearance aliasing), exact projections as keypoints.
    Frames 0..t-2 march along +x; the last frame revisits frame 0 displaced
    by `closure_offset` (real parallax). Returns the detector inputs plus GT.
    """
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    K = np.array([[230.0, 0, 128], [0, 230.0, 128], [0, 0, 1]], np.float32)
    X = np.concatenate([rng.uniform(-2.5, 2.5, (n_pts, 2)),
                        rng.uniform(3.0, 8.0, (n_pts, 1))], axis=1)
    descrs = rng.normal(0, 1, (n_pts, 32)).astype(np.float32)
    descrs /= np.linalg.norm(descrs, axis=1, keepdims=True)
    poses = []
    for k in range(t_frames - 1):
        T = np.eye(4)
        T[0, 3] = 0.4 * k
        poses.append(T)
    T = np.eye(4)
    T[:3, 3] = np.asarray(closure_offset)
    poses.append(T)

    kpts_px, valids, descs = [], [], []
    for T in poses:
        Xc = X @ T[:3, :3].T + T[:3, 3]
        uv = (Xc / Xc[:, 2:3]) @ K.T
        kpts_px.append(uv[:, :2].astype(np.float64))
        valids.append(jnp.ones(n_pts, bool))
        descs.append(jnp.asarray(descrs))
    return kpts_px, valids, descs, poses, K


def test_scaled_loop_closure_metric_translation():
    """On clean geometry (no descriptor aliasing) the scaled closure detector
    recovers the revisit's metric translation through the full path:
    mutual matching -> essential RANSAC -> odometry-anchored depths -> scale
    votes -> Gauss-Newton refinement -> drift-envelope gates."""
    kpts_px, valids, descs, poses, K = _geometric_loop_fixture()
    t_frames = len(poses)
    R_rel = [np.eye(3)]
    t_rel = [np.zeros(3)]
    scales = [0.0]
    for i in range(1, t_frames):
        T = poses[i] @ np.linalg.inv(poses[i - 1])
        s = np.linalg.norm(T[:3, 3])
        scales.append(s)
        R_rel.append(T[:3, :3])
        t_rel.append(T[:3, 3] / max(s, 1e-9))

    closures = detect_loop_closures_scaled(
        descs, valids, kpts_px, K, np.stack(R_rel), np.stack(t_rel), scales,
        jax.random.key(0), min_gap=4, min_matches=60)
    scaled = {(c[0], c[1]): c for c in closures
              if np.linalg.norm(c[3]) > 0.05}
    assert (0, t_frames - 1) in scaled, [(c[0], c[1]) for c in closures]
    i, j, R, tv, n = scaled[(0, t_frames - 1)]
    T_gt = poses[j] @ np.linalg.inv(poses[i])
    assert np.linalg.norm(tv - T_gt[:3, 3]) < 0.05, (tv, T_gt[:3, 3])
    ang = np.degrees(np.arccos(np.clip((np.trace(R.T @ T_gt[:3, :3]) - 1) / 2,
                                       -1, 1)))
    assert ang < 2.0, ang


def test_scaled_loop_closure_rejects_unobservable_scene():
    """On the splat scene, closure-relevant keypoints sit on the far textured
    plane where a 0.3 translation moves ~2 px — metrically unobservable. The
    quality gates (depth parallax, reprojection, drift envelope) must then
    either emit nothing or emit only closures inside the drift envelope,
    never a confidently-wrong metric edge."""
    frames, poses_cam, K = _loop_frames(n_mid=4, return_offset=0.3,
                                        tex_scale=0.6)
    kpts_px, valids, descs = _detect_all(frames)
    R_rel, t_rel, scales = _noisy_odometry(poses_cam, rot_noise=0.02,
                                           dir_noise=0.02)
    closures = detect_loop_closures_scaled(
        descs, valids, kpts_px, np.asarray(K), R_rel, t_rel, scales,
        jax.random.key(0), min_gap=4, min_matches=60,
        images=[np.asarray(f, np.float32) for f in frames])
    for (i, j, R, tv, n) in closures:
        T = poses_cam[j] @ np.linalg.inv(poses_cam[i])
        # whatever survives the gates stays within the drift envelope
        assert np.linalg.norm(tv - T[:3, 3]) < 0.3 + 0.06 * (j - i) + 0.35, \
            (i, j, tv, T[:3, 3])
