"""The NMS fixpoint must converge well within the static iteration cap on
real model score maps (parity safety: the reference iterates unbounded)."""
import numpy as np
import jax.numpy as jnp

from keypoint_bench_tpu.models import get_model
from keypoint_bench_tpu.weights import load_params
from keypoint_bench_tpu.datasets.synthetic import SyntheticHomographyDataset
from keypoint_bench_tpu.ops.detect import _local_max_mask, _box_sum, fast_nms


def test_fixpoint_converges_within_cap():
    ds = SyntheticHomographyDataset(1, 256, seed=0)
    img = jnp.asarray(ds[0]["image0"])[None]
    score, _ = get_model("Alike")(load_params("Alike"), img)
    probs = jnp.asarray(np.asarray(score[0, ..., 0], np.float32))

    d = 6
    p = probs
    prev = -1
    iters = None
    for i in range(60):
        mask = _local_max_mask(p, d)
        count = int(jnp.sum(mask))
        if count == prev:
            iters = i
            break
        prev = count
        maskf = mask.astype(jnp.float32)
        padded = jnp.pad(maskf, d)
        others = _box_sum(padded, *p.shape, d) - maskf
        p = jnp.where(others > 0, 0.0, p)
    assert iters is not None and iters < 30, iters

    # and the capped device implementation reaches the same fixpoint
    out = np.asarray(fast_nms(probs, d, max_iter=30))
    np.testing.assert_allclose(out, np.asarray(p), atol=0)


def test_fast_nms_batched_matches_vmap():
    """[H,W,B]-layout batched fixpoint == vmap(fast_nms), including maps
    that converge after different iteration counts (freeze semantics)."""
    import jax
    from keypoint_bench_tpu.ops.detect import fast_nms_batched
    rng = np.random.default_rng(3)
    maps = []
    # mixed difficulty: sparse spikes (fast), smooth sigmoid-ish (slow)
    for i in range(6):
        m = rng.random((96, 128)).astype(np.float32)
        if i % 2 == 0:
            m = (m > 0.98) * m
        else:
            from scipy.ndimage import gaussian_filter
            m = gaussian_filter(m, 3.0)
        maps.append(m)
    probs = jnp.asarray(np.stack(maps))
    ref = jax.vmap(lambda p: fast_nms(p, 4, 30))(probs)
    got = fast_nms_batched(probs, 4, 30)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # bf16 maps too
    refb = jax.vmap(lambda p: fast_nms(p, 4, 30))(probs.astype(jnp.bfloat16))
    gotb = fast_nms_batched(probs.astype(jnp.bfloat16), 4, 30)
    np.testing.assert_array_equal(np.asarray(gotb), np.asarray(refb))


def test_detection_batch_matches_vmap_detection():
    import jax
    from keypoint_bench_tpu.ops.detect import (DetectParams, detection,
                                               detection_batch)
    rng = np.random.default_rng(4)
    probs = jnp.asarray(rng.random((3, 64, 96)).astype(np.float32))
    dp = DetectParams(nms_dist=3, border_dist=4, top_k=50)
    k_ref, v_ref = jax.vmap(lambda s: detection(s, dp))(probs)
    k_got, v_got = detection_batch(probs, dp)
    np.testing.assert_array_equal(np.asarray(k_got), np.asarray(k_ref))
    np.testing.assert_array_equal(np.asarray(v_got), np.asarray(v_ref))
