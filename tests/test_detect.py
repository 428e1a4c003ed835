"""NMS / detection parity vs an independent numpy oracle of the documented
reference semantics (utils/extracter.py): iterative window-argmax NMS with
zero padding and row-major tie-breaking, border removal, score-sorted top-k."""
import numpy as np
import jax.numpy as jnp
import pytest

from keypoint_bench_tpu.ops.detect import fast_nms, detection, remove_border, DetectParams


def nms_oracle(probs, nms_dist, min_value=0.0, max_iter=100):
    """Straightforward numpy implementation of the fixpoint NMS."""
    if nms_dist == 0:
        return probs
    p = probs.copy()
    h, w = p.shape
    ks = 2 * nms_dist + 1
    mid = (ks * ks) // 2
    prev_count = None
    for _ in range(max_iter):
        pad = np.zeros((h + 2 * nms_dist, w + 2 * nms_dist), p.dtype)
        pad[nms_dist:-nms_dist, nms_dist:-nms_dist] = p
        # windows [h, w, ks*ks] row-major
        win = np.lib.stride_tricks.sliding_window_view(pad, (ks, ks))
        win = win.reshape(h, w, ks * ks)
        am = np.argmax(win, axis=2)
        mask = am == mid
        count = mask.sum()
        if count == prev_count:
            break
        prev_count = count
        # suppress: pixel has some OTHER local max within its window
        mpad = np.zeros_like(pad)
        mpad[nms_dist:-nms_dist, nms_dist:-nms_dist] = mask
        mwin = np.lib.stride_tricks.sliding_window_view(mpad, (ks, ks))
        others = mwin.reshape(h, w, ks * ks).sum(axis=2) - mask
        p = np.where(others > 0, min_value, p)
    return p


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("nms_dist", [1, 4, 6])
def test_fast_nms_matches_oracle(seed, nms_dist):
    rng = np.random.default_rng(seed)
    probs = rng.random((48, 64)).astype(np.float32)
    ours = np.asarray(fast_nms(jnp.asarray(probs), nms_dist))
    ref = nms_oracle(probs, nms_dist)
    np.testing.assert_allclose(ours, ref, atol=0)


def test_fast_nms_sparse_peaks():
    probs = np.zeros((40, 40), np.float32)
    probs[10, 10] = 1.0
    probs[10, 13] = 0.9   # within nms_dist=4 of the peak -> suppressed
    probs[30, 30] = 0.8
    out = np.asarray(fast_nms(jnp.asarray(probs), 4))
    assert out[10, 10] == 1.0
    assert out[10, 13] == 0.0
    assert out[30, 30] == 0.8


def test_detection_topk_and_coords():
    probs = np.zeros((64, 64), np.float32)
    peaks = [(20, 30, 0.9), (40, 12, 0.8), (50, 50, 0.7)]
    for r, c, s in peaks:
        probs[r, c] = s
    params = DetectParams(nms_dist=4, border_dist=8, top_k=10)
    kpts, valid = detection(jnp.asarray(probs), params)
    kpts = np.asarray(kpts)
    valid = np.asarray(valid)
    assert valid.sum() == 3
    # sorted by score descending; coords are (col+0.5)/W, (row+0.5)/H
    for i, (r, c, s) in enumerate(peaks):
        assert kpts[i, 2] == pytest.approx(s)
        assert kpts[i, 0] == pytest.approx((c + 0.5) / 64)
        assert kpts[i, 1] == pytest.approx((r + 0.5) / 64)


def test_border_removal():
    probs = np.ones((32, 32), np.float32)
    out = np.asarray(remove_border(jnp.asarray(probs), 8))
    assert out[:8].sum() == 0 and out[-8:].sum() == 0
    assert out[:, :8].sum() == 0 and out[:, -8:].sum() == 0
    assert out[8:-8, 8:-8].min() == 1.0


def test_detection_threshold_masks_invalid():
    probs = np.zeros((64, 64), np.float32)
    probs[20, 20] = 0.5
    params = DetectParams(nms_dist=4, border_dist=8, top_k=5)
    kpts, valid = detection(jnp.asarray(probs), params)
    assert np.asarray(valid).sum() == 1  # zeros are not > threshold


def test_topk_select_matches_lax_topk():
    import jax.numpy as jnp
    from jax import lax
    from keypoint_bench_tpu.ops.detect import topk_select
    rng = np.random.default_rng(8)
    # spread values (fast path) and clustered values (forces the fallback):
    # both must match lax.top_k exactly, values and indices
    spread = jnp.asarray(rng.random(32768), jnp.float32)
    clustered = jnp.asarray(
        np.where(rng.random(32768) < 0.1, 0.9 + rng.random(32768) * 0.1, 0.0),
        jnp.float32)
    tied = jnp.asarray(np.round(rng.random(32768) * 20) / 20, jnp.float32)
    for name, flat in [("spread", spread), ("clustered", clustered),
                       ("tied", tied)]:
        for k in (100, 1000):
            v1, i1 = lax.top_k(flat, k)
            v2, i2 = topk_select(flat, k)
            np.testing.assert_array_equal(np.asarray(v2), np.asarray(v1),
                                          err_msg=f"{name} k={k}")
            np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1),
                                          err_msg=f"{name} k={k}")
        vb, ib = topk_select(flat.astype(jnp.bfloat16), 500)
        vr, ir = lax.top_k(flat.astype(jnp.bfloat16), 500)
        np.testing.assert_array_equal(np.asarray(ib), np.asarray(ir),
                                      err_msg=name)
