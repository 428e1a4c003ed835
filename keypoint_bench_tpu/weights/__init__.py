from keypoint_bench_tpu.weights.io import load_params, WEIGHTS_DIR
