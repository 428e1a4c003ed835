"""Model info CLI — the uniform replacement for the reference's per-model
__main__ blocks (thop FLOPs/params + ad-hoc latency loops, e.g.
models/ALike.py:167-191):

    python -m keypoint_bench_tpu.info Alike [--size 512] [--latency]
"""
from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--latency", action="store_true",
                    help="also measure wall-clock latency (compiles)")
    args = ap.parse_args(argv)

    from keypoint_bench_tpu.utils.profiling import model_cost, measure_latency

    info = model_cost(args.model, input_shape=(1, args.size, args.size, 3))
    if args.latency:
        import jax
        import jax.numpy as jnp
        import numpy as np
        from keypoint_bench_tpu.models import get_model
        from keypoint_bench_tpu.weights import load_params
        model_fn = get_model(args.model)
        params = load_params(args.model)
        fn = jax.jit(lambda img: model_fn(params, img))
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.random((1, args.size, args.size, 3),
                                     np.float32))
        info.update(measure_latency(fn, (img,)))
    print(json.dumps(info, indent=2))


if __name__ == "__main__":
    main()
