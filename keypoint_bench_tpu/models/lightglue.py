"""LightGlue attention matcher, TPU-native fixed-shape implementation.

Re-designed from the reference (models/lightglue.py:334-686): 9 transformer
layers of rotary self-attention + bidirectional cross-attention over the two
keypoint sets, learnable Fourier positional encoding, per-layer matchability,
sigmoid-log-double-softmax assignment, mutual-max match filtering.

TPU design decisions (SURVEY.md §3.5):
  * fixed depth — the reference's data-dependent early exit
    (depth_confidence) and width pruning are host-unfriendly; we run all
    layers over fixed-K padded sets with validity masks (equivalent to the
    reference with depth_confidence=-1, width_confidence=-1, its documented
    "deterministic" mode).
  * attention is masked dense attention over [K0, K1] at benchmark sizes
    (a single MXU-tiled matmul wins below K~2k), switching to the fused
    Pallas kernel (ops/pallas_attention.py) at K >= 2k where the K^2 HBM
    round-trips dominate — measured on v5e: 1.5x at K=2048, 2.6x at
    K=4096, identical match outputs (attn="auto").
  * outputs are fixed-size index arrays + match mask (no ragged match lists).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from keypoint_bench_tpu.ops.grid_sample import sample_bilinear_pixels

_NEG = -1e9


def _linear(p, name, x):
    y = jnp.matmul(x, p[f"{name}.weight"])
    b = p.get(f"{name}.bias")
    return y + b if b is not None else y


def _layernorm(p, name, x, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p[f"{name}.weight"] \
        + p[f"{name}.bias"]


def _ffn(p, prefix, x):
    y = _linear(p, f"{prefix}.0", x)
    y = _layernorm(p, f"{prefix}.1", y)
    y = jax.nn.gelu(y, approximate=False)
    return _linear(p, f"{prefix}.3", y)


def _rotate_half(x):
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(*x.shape[:-2], -1)


def _apply_rotary(freqs, t):
    """freqs [2, N, D]; t [..., N, D]."""
    return t * freqs[0] + _rotate_half(t) * freqs[1]


def _posenc(p, kpts):
    """LearnableFourierPositionalEncoding (lightglue.py:81-94):
    kpts [N, 2] -> freqs [2, N, head_dim] (cos/sin with pairs duplicated)."""
    proj = jnp.matmul(kpts, p["posenc.Wr.weight"])   # [N, F/2]
    cos = jnp.cos(proj)
    sin = jnp.sin(proj)
    emb = jnp.stack([cos, sin], axis=0)              # [2, N, F/2]
    return jnp.repeat(emb, 2, axis=-1)               # [2, N, F]


def _heads(x, num_heads):
    n, d = x.shape
    return x.reshape(n, num_heads, d // num_heads).transpose(1, 0, 2)


def _merge(x):
    h, n, dh = x.shape
    return x.transpose(1, 0, 2).reshape(n, h * dh)


def _attention(q, k, v, mask_kv, attn="dense", scale=None):
    """q [h,N,dh], k/v [h,M,dh], mask_kv [M] -> [h,N,dh].

    attn="fused" routes through the Pallas on-chip kernel
    (ops/pallas_attention.py) — same masking constant and math, no [N,M]
    HBM materialization; the winning path at K >= 2k (PERF.md)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if attn == "fused" or attn == "fused_interpret":
        from keypoint_bench_tpu.ops.pallas_attention import fused_attention
        return fused_attention(q, k, v, mask_kv, scale=scale,
                               interpret=(attn == "fused_interpret"))
    sim = jnp.einsum("hid,hjd->hij", q, k) * scale
    sim = jnp.where(mask_kv[None, None, :], sim, _NEG)
    attn_w = jax.nn.softmax(sim, axis=-1)
    return jnp.einsum("hij,hjd->hid", attn_w, v)


def _self_block(p, prefix, x, enc, valid, num_heads, attn="dense"):
    qkv = _linear(p, f"{prefix}.Wqkv", x)            # [N, 3d]
    n = x.shape[0]
    qkv = qkv.reshape(n, num_heads, -1, 3)           # [N, h, dh, 3]
    q = qkv[..., 0].transpose(1, 0, 2)
    k = qkv[..., 1].transpose(1, 0, 2)
    v = qkv[..., 2].transpose(1, 0, 2)
    q = _apply_rotary(enc, q)
    k = _apply_rotary(enc, k)
    ctx = _attention(q, k, v, valid, attn=attn)
    msg = _linear(p, f"{prefix}.out_proj", _merge(ctx))
    return x + _ffn(p, f"{prefix}.ffn", jnp.concatenate([x, msg], axis=-1))


def _cross_block(p, prefix, x0, x1, valid0, valid1, num_heads, attn="dense"):
    qk0 = _heads(_linear(p, f"{prefix}.to_qk", x0), num_heads)
    qk1 = _heads(_linear(p, f"{prefix}.to_qk", x1), num_heads)
    v0 = _heads(_linear(p, f"{prefix}.to_v", x0), num_heads)
    v1 = _heads(_linear(p, f"{prefix}.to_v", x1), num_heads)
    scale = qk0.shape[-1] ** -0.5
    qk0 = qk0 * scale ** 0.5
    qk1 = qk1 * scale ** 0.5
    if attn != "dense":
        # two fused passes (q/k swapped) instead of one shared [K0,K1] sim:
        # recomputing the scores on-chip is cheaper than the HBM round-trip
        m0 = _attention(qk0, qk1, v1, valid1, attn=attn, scale=1.0)
        m1 = _attention(qk1, qk0, v0, valid0, attn=attn, scale=1.0)
    else:
        sim = jnp.einsum("hid,hjd->hij", qk0, qk1)   # [h, K0, K1]
        sim01 = jnp.where(valid1[None, None, :], sim, _NEG)
        sim10 = jnp.where(valid0[None, :, None], sim, _NEG)
        attn01 = jax.nn.softmax(sim01, axis=-1)
        attn10 = jax.nn.softmax(sim10, axis=-2)
        m0 = jnp.einsum("hij,hjd->hid", attn01, v1)
        m1 = jnp.einsum("hij,hid->hjd", attn10, v0)
    m0 = _linear(p, f"{prefix}.to_out", _merge(m0))
    m1 = _linear(p, f"{prefix}.to_out", _merge(m1))
    x0 = x0 + _ffn(p, f"{prefix}.ffn", jnp.concatenate([x0, m0], axis=-1))
    x1 = x1 + _ffn(p, f"{prefix}.ffn", jnp.concatenate([x1, m1], axis=-1))
    return x0, x1


def _assignment_scores(p, prefix, d0, d1, valid0, valid1):
    """MatchAssignment + sigmoid_log_double_softmax (lightglue.py:278-309),
    masked; returns the [K0, K1] in-block log scores."""
    md0 = _linear(p, f"{prefix}.final_proj", d0)
    md1 = _linear(p, f"{prefix}.final_proj", d1)
    d = md0.shape[-1]
    md0 = md0 / d ** 0.25
    md1 = md1 / d ** 0.25
    sim = jnp.matmul(md0, md1.T)
    sim = jnp.where(valid0[:, None] & valid1[None, :], sim, _NEG)
    z0 = _linear(p, f"{prefix}.matchability", d0)    # [K0, 1]
    z1 = _linear(p, f"{prefix}.matchability", d1)    # [K1, 1]
    cert = jax.nn.log_sigmoid(z0) + jax.nn.log_sigmoid(z1).T
    scores0 = jax.nn.log_softmax(sim, axis=1)
    scores1 = jax.nn.log_softmax(sim, axis=0)
    return scores0 + scores1 + cert


def normalize_keypoints_masked(kpts, valid):
    """Reference normalize_keypoints with size=None (lightglue.py:45-56):
    size = 1 + max - min, computed over valid keypoints only."""
    big = 1e9
    kmax = jnp.max(jnp.where(valid[:, None], kpts, -big), axis=0)
    kmin = jnp.min(jnp.where(valid[:, None], kpts, big), axis=0)
    size = 1.0 + kmax - kmin
    shift = size / 2.0
    scale = jnp.max(size) / 2.0
    return (kpts - shift[None, :]) / scale


def sample_descriptors_lg(kpts_px, desc_map, s: int):
    """Reference sample_descriptors (lightglue.py:24-41): kpts in image pixels,
    desc_map [h, w, C] at stride s; grid built as
    (kp - s/2 + 0.5) / (w*s - s/2 - 0.5) * 2 - 1 with align_corners=True;
    output L2-normalized."""
    h, w = desc_map.shape[0], desc_map.shape[1]
    kx = (kpts_px[:, 0] - s / 2 + 0.5) / (w * s - s / 2 - 0.5)
    ky = (kpts_px[:, 1] - s / 2 + 0.5) / (h * s - s / 2 - 0.5)
    px = kx * (w - 1)
    py = ky * (h - 1)
    d = sample_bilinear_pixels(desc_map, px, py)
    n = jnp.linalg.norm(d, axis=-1, keepdims=True)
    return d / jnp.maximum(n, 1e-12)


def _resolve_attn(attn: str, k: int) -> str:
    """'auto' -> the fused Pallas kernel on TPU at K >= 2k (where the K^2
    HBM round-trips of the dense path start to dominate), dense otherwise."""
    if attn != "auto":
        return attn
    return "fused" if (jax.default_backend() == "tpu" and k >= 2048) \
        else "dense"


@functools.partial(jax.jit, static_argnames=("n_layers", "num_heads",
                                             "filter_threshold", "attn"))
def lightglue_forward(params: dict, kpts0_px, valid0, desc0, kpts1_px, valid1,
                      desc1, n_layers: int = 9, num_heads: int = 4,
                      filter_threshold: float = 0.1, attn: str = "auto"):
    """Match two keypoint sets.

    kpts*_px [K,2] pixel coords, desc* [K, input_dim] sampled descriptors.
    attn: "dense" | "fused" | "fused_interpret" | "auto" (fused on TPU at
    K >= 2k). Returns (m0 [K0] index into set 1 or -1, mscores0 [K0],
    match_mask [K0]).
    """
    attn = _resolve_attn(attn, max(desc0.shape[0], desc1.shape[0]))
    p = params
    if "input_proj.weight" in p:
        desc0 = _linear(p, "input_proj", desc0)
        desc1 = _linear(p, "input_proj", desc1)

    k0n = normalize_keypoints_masked(kpts0_px, valid0)
    k1n = normalize_keypoints_masked(kpts1_px, valid1)
    enc0 = _posenc(p, k0n)
    enc1 = _posenc(p, k1n)

    d0, d1 = desc0, desc1
    for i in range(n_layers):
        d0 = _self_block(p, f"transformers.{i}.self_attn", d0, enc0, valid0,
                         num_heads, attn=attn)
        d1 = _self_block(p, f"transformers.{i}.self_attn", d1, enc1, valid1,
                         num_heads, attn=attn)
        d0, d1 = _cross_block(p, f"transformers.{i}.cross_attn", d0, d1,
                              valid0, valid1, num_heads, attn=attn)

    scores = _assignment_scores(p, f"log_assignment.{n_layers - 1}", d0, d1,
                                valid0, valid1)
    # filter_matches (lightglue.py:315-331), masked
    m0 = jnp.argmax(scores, axis=1)
    m1 = jnp.argmax(scores, axis=0)
    k0 = scores.shape[0]
    mutual0 = m1[m0] == jnp.arange(k0)
    max0 = jnp.take_along_axis(scores, m0[:, None], axis=1)[:, 0]
    mscores0 = jnp.where(mutual0, jnp.exp(max0), 0.0)
    ok = mutual0 & (mscores0 > filter_threshold) & valid0 & valid1[m0]
    m0_out = jnp.where(ok, m0, -1)
    return m0_out, mscores0, ok


def lightglue_match(params: dict, kpts0, valid0, kpts1, valid1,
                    desc_map0, desc_map1, w: int, h: int, desc_scale: int):
    """Benchmark adapter mirroring reference LightGlue.match
    (lightglue.py:447-477): kpts [K,3] normalized (x,y,score); desc maps
    [hc,wc,D]; returns (m_kpts0 [K,3], m_kpts1 [K,3], match_mask [K])."""
    scale = jnp.asarray([w - 1.0, h - 1.0])
    p0 = kpts0[:, 0:2] * scale
    p1 = kpts1[:, 0:2] * scale
    d0 = sample_descriptors_lg(p0, desc_map0, desc_scale)
    d1 = sample_descriptors_lg(p1, desc_map1, desc_scale)
    m0, mscores0, ok = lightglue_forward(params, p0, valid0, d0, p1, valid1,
                                         d1)
    return kpts0, kpts1[jnp.maximum(m0, 0)], ok
