from keypoint_bench_tpu.geometry.warp import warp_homography, warp_se3, warp_points
from keypoint_bench_tpu.geometry import se3
