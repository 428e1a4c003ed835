"""Host-side data loaders. Each loader is an indexable sequence of numpy dict
samples in the reference batch contract (SURVEY.md §2.5) with images in NHWC.
Decode/undistort/resize stay on CPU (cv2) feeding the TPU — the I/O layer, not
the compute path (SURVEY.md §2.6).
"""
from keypoint_bench_tpu.datasets.registry import get_dataset
