"""Shared functional NN blocks (NHWC, eval-mode), the building material for all
detector models. Parameters live in flat dicts keyed by the converted torch
parameter names (see weights/convert.py), so weight-import fidelity is
auditable layer by layer.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

# Conv precision: TPU runs bf16-input/f32-accumulate on the MXU by default
# (fast path); parity tests against torch flip this to HIGHEST for exact f32.
_CONV_PRECISION = [None]


def set_conv_precision(p):
    """p: None (backend default) or jax.lax.Precision.HIGHEST (exact f32)."""
    _CONV_PRECISION[0] = p


def conv2d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None,
           stride: int = 1, padding: int | str = "SAME", dilation: int = 1,
           groups: int = 1) -> jnp.ndarray:
    """x [B,H,W,Ci], w [kh,kw,Ci/groups,Co] (HWIO)."""
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    if x.dtype != w.dtype:
        # mixed precision: bf16 weights pull activations onto the bf16 MXU
        # path; MXU accumulation is f32 internally either way
        x = x.astype(w.dtype)
    # bf16 weights => store the activation in bf16 too: full-res conv nets
    # here are HBM-bandwidth-bound, so halving activation bytes is the
    # dominant lever (f32 mode keeps exact f32 storage for parity tests)
    out_dtype = jnp.bfloat16 if w.dtype == jnp.bfloat16 else jnp.float32
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        rhs_dilation=(dilation, dilation), dimension_numbers=dn,
        feature_group_count=groups,
        precision=_CONV_PRECISION[0],
        preferred_element_type=out_dtype)
    if b is not None:
        y = y + b
    return y


def cast_params_bf16(params: dict) -> dict:
    """Cast conv/linear kernels (rank >= 2) to bf16 for MXU throughput; BN
    stats, biases and other vectors stay f32 so normalization math keeps
    full precision."""
    return {k: (v.astype(jnp.bfloat16) if v.ndim >= 2 else v)
            for k, v in params.items()}


def bn_eval(x: jnp.ndarray, gamma, beta, mean, var, eps: float = 1e-5):
    """BatchNorm inference transform: (x - mean) * rsqrt(var+eps) * gamma +
    beta. Normalization math runs in f32 (stats stay f32 in bf16 mode); the
    result is stored back in the activation dtype."""
    inv = lax.rsqrt(var + eps)
    y = (x.astype(jnp.float32) - mean) * inv * gamma + beta
    return y.astype(x.dtype)


def instance_norm(x: jnp.ndarray, gamma=None, beta=None, eps: float = 1e-5):
    """InstanceNorm2d (eval == train: stats over H,W per sample+channel).
    affine=False when gamma/beta are None (e.g. XFeat.py:15, disk thin_setup)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    y = (x - mean) * lax.rsqrt(var + eps)
    if gamma is not None:
        y = y * gamma + beta
    return y


def max_pool(x: jnp.ndarray, k: int, stride: int | None = None,
             padding: str = "VALID") -> jnp.ndarray:
    s = stride or k
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, k, k, 1),
                             (1, s, s, 1), padding)


def avg_pool(x: jnp.ndarray, k: int, stride: int | None = None) -> jnp.ndarray:
    s = stride or k
    y = lax.reduce_window(x, 0.0, lax.add, (1, k, k, 1), (1, s, s, 1), "VALID")
    return y / (k * k)


def relu(x):
    return jnp.maximum(x, 0)


def prelu(x, alpha):
    """PReLU with per-channel alpha [C] (disk.py:193)."""
    return jnp.where(x >= 0, x, x * alpha)


@functools.lru_cache(maxsize=64)
def _interp_matrix(n_out: int, n_in: int):
    """Row-stochastic [n_out, n_in] bilinear interpolation matrix with
    align_corners=True mapping: src = i * (n_in-1)/(n_out-1). Cached as
    *numpy* (a cached jax array created inside a jit trace would leak the
    tracer into later traces)."""
    import numpy as np
    if n_in == 1:
        return np.ones((n_out, 1), np.float32)
    i = np.arange(n_out)
    src = i * (n_in - 1) / (n_out - 1) if n_out > 1 else np.zeros(1)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, n_in - 2)
    frac = src - lo
    A = np.zeros((n_out, n_in), np.float32)
    A[i, lo] = 1 - frac
    A[i, lo + 1] = frac
    return A


def _interp_apply(x, Ah, Aw):
    if x.dtype == jnp.bfloat16:
        Ah = jnp.asarray(Ah, jnp.bfloat16)
        Aw = jnp.asarray(Aw, jnp.bfloat16)
        hp = None
    else:
        hp = jax.lax.Precision.HIGHEST
    y = jnp.einsum("oh,bhwc->bowc", Ah, x, precision=hp)
    return jnp.einsum("ow,bhwc->bhoc", Aw, y, precision=hp)


def upsample_bilinear_align(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """torch nn.Upsample(scale_factor=f, mode='bilinear', align_corners=True)
    for NHWC, implemented as two dense interpolation matmuls (MXU-friendly,
    no gather)."""
    b, h, w, c = x.shape
    return _interp_apply(x, _interp_matrix(h * factor, h),
                         _interp_matrix(w * factor, w))


def resize_bilinear_align(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """F.interpolate(..., mode='bilinear', align_corners=True) to an arbitrary
    size, NHWC."""
    b, h, w, c = x.shape
    return _interp_apply(x, _interp_matrix(out_h, h),
                         _interp_matrix(out_w, w))


@functools.lru_cache(maxsize=64)
def _interp_matrix_half(n_out: int, n_in: int):
    """[n_out, n_in] bilinear matrix with half-pixel (align_corners=False)
    mapping: src = (i + 0.5) * n_in/n_out - 0.5, edges clamped (torch
    F.interpolate default). Cached as numpy — see _interp_matrix."""
    import numpy as np
    i = np.arange(n_out)
    src = (i + 0.5) * (n_in / n_out) - 0.5
    src = np.clip(src, 0, n_in - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, max(n_in - 2, 0))
    frac = src - lo
    A = np.zeros((n_out, n_in), np.float32)
    A[i, lo] = 1 - frac
    A[i, np.minimum(lo + 1, n_in - 1)] += frac
    return A


def resize_bilinear_half_pixel(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """F.interpolate(mode='bilinear', align_corners=False) for NHWC."""
    b, h, w, c = x.shape
    return _interp_apply(x, _interp_matrix_half(out_h, h),
                         _interp_matrix_half(out_w, w))


def conv_transpose2d(x: jnp.ndarray, w: jnp.ndarray, b=None, stride: int = 2):
    """torch nn.ConvTranspose2d(k, stride, padding=0) with converted kernel.

    The converter stores the torch [I, O, kh, kw] tensor as [kh, kw, O, I]
    (it applies the same OIHW->HWIO transpose to all 4D tensors), which is
    exactly lax.conv_transpose's transpose_kernel=True layout."""
    y = lax.conv_transpose(
        x, w, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
        precision=_CONV_PRECISION[0])
    if b is not None:
        y = y + b
    return y


def sobel_gradients(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """kornia-style normalized sobel (kernel/8) with replicate padding; x is
    NHWC; returns (dx, dy) each NHWC (KeyNet handcrafted block dependency,
    reference models/KeyNet.py:15-28)."""
    import numpy as np
    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32) / 8.0
    ky = kx.T
    c = x.shape[-1]
    wx = jnp.asarray(np.tile(kx[:, :, None, None], (1, 1, 1, c)))
    wy = jnp.asarray(np.tile(ky[:, :, None, None], (1, 1, 1, c)))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    dx = conv2d(xp, wx, None, 1, "VALID", groups=c)
    dy = conv2d(xp, wy, None, 1, "VALID", groups=c)
    return dx, dy


def gaussian_pyr_blur(x: jnp.ndarray) -> jnp.ndarray:
    """5x5 [1,4,6,4,1] outer-product /256 blur with reflect padding
    (KeyNet custom_pyrdown, reference models/KeyNet.py:74-96)."""
    import numpy as np
    g = np.array([1., 4., 6., 4., 1.], np.float32)
    k = np.outer(g, g) / 256.0
    c = x.shape[-1]
    w = jnp.asarray(np.tile(k[:, :, None, None], (1, 1, 1, c)))
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    return conv2d(xp, w, None, 1, "VALID", groups=c)


def softmax(x, axis=-1):
    return jax.nn.softmax(x, axis=axis)


def l2_normalize(x, axis=-1, eps: float = 0.0):
    n = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / (n + eps) if eps else x / n


def depth_to_space(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """[B, Hc, Wc, block*block] -> [B, Hc*block, Wc*block, 1] with the
    SuperPoint heatmap layout (SuperPoint.py:66-69: reshape to
    [B,Hc,Wc,8,8] -> permute (0,1,3,2,4))."""
    b, hc, wc, cc = x.shape
    assert cc == block * block
    y = x.reshape(b, hc, wc, block, block)
    y = y.transpose(0, 1, 3, 2, 4)
    return y.reshape(b, hc * block, wc * block, 1)


# --- composite torch-style blocks -------------------------------------------

def conv_bn_relu(x, p, conv: str, bn: str, stride: int = 1, padding: int = 1):
    y = conv2d(x, p[f"{conv}.weight"], p.get(f"{conv}.bias"), stride, padding)
    y = bn_eval(y, p[f"{bn}.weight"], p[f"{bn}.bias"],
                p[f"{bn}.running_mean"], p[f"{bn}.running_var"])
    return relu(y)


def conv_block(x, p, prefix: str):
    """Reference ConvBlock (ALike.py:9-28 family): conv3x3+BN+ReLU twice."""
    y = conv_bn_relu(x, p, f"{prefix}.conv1", f"{prefix}.bn1")
    y = conv_bn_relu(y, p, f"{prefix}.conv2", f"{prefix}.bn2")
    return y


def res_block(x, p, prefix: str, stride: int = 1):
    """Reference ResBlock (ALike.py:31-81): conv-bn-relu, conv-bn, 1x1-conv
    downsample identity, add, relu."""
    idn = conv2d(x, p[f"{prefix}.downsample.weight"],
                 p.get(f"{prefix}.downsample.bias"), 1, 0)
    y = conv_bn_relu(x, p, f"{prefix}.conv1", f"{prefix}.bn1", stride)
    y = conv2d(y, p[f"{prefix}.conv2.weight"], p.get(f"{prefix}.conv2.bias"),
               1, 1)
    y = bn_eval(y, p[f"{prefix}.bn2.weight"], p[f"{prefix}.bn2.bias"],
                p[f"{prefix}.bn2.running_mean"], p[f"{prefix}.bn2.running_var"])
    return relu(y + idn)
