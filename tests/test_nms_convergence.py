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
