from keypoint_bench_tpu.ops.detect import fast_nms, detection, remove_border, DetectParams
from keypoint_bench_tpu.ops.grid_sample import grid_sample_align_corners, sample_at_points
from keypoint_bench_tpu.ops.matching import brute_force_match, mutual_nn_match
