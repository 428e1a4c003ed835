from keypoint_bench_tpu.parallel.mesh import make_mesh
from keypoint_bench_tpu.parallel.evaluate import (batched_repeatability_step,
                                                  sharded_eval_step)
