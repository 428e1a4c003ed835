"""Model registry: every detector maps image[B,H,W,3] float32 (RGB, [0,1]) to
(score_map[B,H,W,1], desc_map[B,H,W,D] | None) given a params pytree loaded by
`keypoint_bench_tpu.weights.load_params`."""
from keypoint_bench_tpu.models.registry import get_model, list_models, register
