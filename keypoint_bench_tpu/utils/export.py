"""Model export via XLA AOT — the TPU-native replacement for the reference's
ONNX -> OpenVINO -> TensorRT chain (utils/export.py:6-42).

`jax.export` serializes the lowered StableHLO of a jitted forward at a fixed
shape to a portable artifact that any later process (same or newer jax) can
deserialize and call without retracing Python.
"""
from __future__ import annotations

import os


def export_model(model_name: str, out_path: str, input_shape=(1, 512, 512, 3),
                 weights_dir: str | None = None) -> str:
    """Serialize the jitted forward of `model_name` at `input_shape` to
    `out_path` (.stablehlo). Returns the path."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from keypoint_bench_tpu.models import get_model
    from keypoint_bench_tpu.weights import load_params

    model_fn = get_model(model_name)
    params = load_params(model_name, weights_dir)

    def fwd(image):
        return model_fn(params, image)

    exported = jexport.export(jax.jit(fwd))(
        jax.ShapeDtypeStruct(input_shape, jnp.float32))
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(blob)
    return out_path


def load_exported(path: str):
    """Deserialize an exported model; returns a callable(image)."""
    from jax import export as jexport
    with open(path, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    return exported.call
