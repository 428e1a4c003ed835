"""keypoint_bench_tpu — a TPU-native keypoint detection / matching / geometry benchmark framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`linyicheng1/keypoint_bench` (reference mounted at /root/reference): 13 keypoint
detector/descriptor models, 4 matching strategies (brute-force, LightGlue,
pyramidal LK optical flow tensor/cv variants), 7 evaluation tasks
(repeatability, MHA, AUC, fundamental-matrix, VO, tracking-error, ransac), and
9 dataset loaders — but built as functional pipelines of jitted stages over
fixed-shape masked arrays, sharded over a `jax.sharding.Mesh`.

Design invariants (vs reference models/model_interface.py contract):
  * models map image[B,H,W,3] (NHWC) -> (score_map[B,H,W,1], desc_map[B,H,W,D]|None)
  * keypoints are fixed-K arrays [K,3] of (x, y, score), x,y normalized to
    [0,1] with +0.5 pixel-center convention, plus a validity mask [K]
    (reference: utils/extracter.py:193-221 emits variable-N tensors).
  * everything between image decode and final metric scalar stays on device.
"""

__version__ = "0.1.0"
