"""Converted-weight storage: one .npz per model, torch parameter names
preserved, conv kernels already in HWIO layout, linear weights in [in, out].

The one-time torch -> npz conversion lives in convert.py (replaces the
reference's ad-hoc torch.load zoo, models/model_interface.py:45-83, including
its `eval(checkpoint['net'])` pickle-exec hazard which we do not reproduce).
"""
from __future__ import annotations

import os
import functools

import jax.numpy as jnp
import numpy as np

WEIGHTS_DIR = os.environ.get(
    "KBT_WEIGHTS_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "weights_npz"))


@functools.lru_cache(maxsize=None)
def load_params(name: str, weights_dir: str | None = None) -> dict:
    if name == "Alike_s2d":
        # layout variant of the same checkpoint (models/alike_s2d.py)
        from keypoint_bench_tpu.models.alike_s2d import transform_params_s2d
        return transform_params_s2d(load_params("Alike", weights_dir))
    if name == "LETNet_s2d":
        from keypoint_bench_tpu.models.tiny_s2d import transform_letnet_s2d
        return transform_letnet_s2d(load_params("LETNet", weights_dir))
    if name == "GoodPoint_s2d":
        from keypoint_bench_tpu.models.tiny_s2d import \
            transform_goodpoint_s2d
        return transform_goodpoint_s2d(load_params("GoodPoint", weights_dir))
    path = os.path.join(weights_dir or WEIGHTS_DIR, f"{name}.npz")
    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in data.files}


def save_params(name: str, params: dict, weights_dir: str | None = None):
    d = weights_dir or WEIGHTS_DIR
    os.makedirs(d, exist_ok=True)
    np.savez(os.path.join(d, f"{name}.npz"),
             **{k: np.asarray(v) for k, v in params.items()})
