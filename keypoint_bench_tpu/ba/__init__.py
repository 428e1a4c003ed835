from keypoint_bench_tpu.ba.gauss_newton import (BAProblem, ba_solve,
                                                reprojection_errors)
