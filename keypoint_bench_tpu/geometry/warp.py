"""Masked fixed-K keypoint warps: homography and SE3-with-depth.

Parity targets (reference utils/projection.py, studied not copied):
  * warp_homography (137-167): pixels = p01 * (w-1, h-1); H multiply; validity
    0 <= x <= w-1, 0 <= y <= h-1; renormalize by (w-1, h-1).
  * warp_se3 (194-266): pixels = p01 * (W, H); bilinear depth interpolation
    with a 10-px border + valid-corner + valid-depth masks (269-371); COLMAP
    bbox +0.5 offset (212, 225); unproject -> pose01 -> project; occlusion
    check |z_proj - z_interp| < 0.05 (244).

TPU design: no `nonzero` compaction — every function keeps the fixed K rows and
returns a boolean validity mask instead (the reference's ids/ids_out index
lists become this mask).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Geometry matmuls are tiny (Kx3 @ 3x3) — there is no MXU win, and default
# (possibly bf16) precision visibly corrupts pixel coordinates. Pin f32.
_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def warp_homography(kpts01: jnp.ndarray, valid: jnp.ndarray, H: jnp.ndarray,
                    width, height):
    """kpts01 [K, >=2] normalized (x, y); H [3,3]; width/height of the
    *original* image the homography is expressed in.

    Returns (kpts0 [K,2], kpts01w [K,2], valid [K]) all normalized to [0,1]
    by (w-1, h-1) — the reference convention (utils/projection.py:147,165-166).
    """
    w = jnp.asarray(width, jnp.float32)
    h = jnp.asarray(height, jnp.float32)
    scale = jnp.stack([w - 1.0, h - 1.0])
    p = kpts01[:, 0:2] * scale
    ones = jnp.ones((p.shape[0], 1), p.dtype)
    ph = jnp.concatenate([p, ones], axis=1)
    q = _mm(ph, H.T)
    qz = q[:, 2:3]
    safe = jnp.where(jnp.abs(qz) > 1e-12, qz, 1e-12)
    q = q[:, 0:2] / safe
    inb = ((q[:, 0] >= 0) & (q[:, 0] <= w - 1.0)
           & (q[:, 1] >= 0) & (q[:, 1] <= h - 1.0))
    out_valid = valid & inb
    return p / scale, q / scale, out_valid


def _interp_depth(p: jnp.ndarray, depth: jnp.ndarray, border: int = 10):
    """Bilinear depth at pixel coords p [K,2] (x,y) with the reference's
    border/valid-corner/valid-depth rules (utils/projection.py:269-371).

    Returns (z [K], valid [K])."""
    h, w = depth.shape
    i = p[:, 1]  # row
    j = p[:, 0]  # col
    i0 = jnp.floor(i)
    j0 = jnp.floor(j)
    i1 = jnp.ceil(i)
    j1 = jnp.ceil(j)
    valid_corners = ((i0 >= border) & (j0 >= border)
                     & (i1 < h - border) & (j1 < w - border))
    i0c = jnp.clip(i0, 0, h - 1).astype(jnp.int32)
    i1c = jnp.clip(i1, 0, h - 1).astype(jnp.int32)
    j0c = jnp.clip(j0, 0, w - 1).astype(jnp.int32)
    j1c = jnp.clip(j1, 0, w - 1).astype(jnp.int32)
    d = depth.reshape(-1)
    d00 = d[i0c * w + j0c]
    d01 = d[i0c * w + j1c]
    d10 = d[i1c * w + j0c]
    d11 = d[i1c * w + j1c]
    valid_depth = (d00 > 0) & (d01 > 0) & (d10 > 0) & (d11 > 0)
    di = i - i0
    dj = j - j0
    z = ((1 - di) * (1 - dj) * d00 + (1 - di) * dj * d01
         + di * (1 - dj) * d10 + di * dj * d11)
    return z, valid_corners & valid_depth


def warp_se3(kpts01: jnp.ndarray, valid: jnp.ndarray, pose01: jnp.ndarray,
             bbox0: jnp.ndarray, bbox1: jnp.ndarray,
             depth0: jnp.ndarray, depth1: jnp.ndarray,
             K0: jnp.ndarray, K1: jnp.ndarray):
    """SE3 warp with depth (reference utils/projection.py:194-266).

    kpts01 [K,>=2] normalized (x,y); pose01 [4,4]; bbox [2] (row, col) crop
    offsets; depth [H,W]; K [3,3] intrinsics.
    Returns (kpts0 [K,2], kpts01w [K,2], valid [K]) normalized by (W, H).
    """
    h0, w0 = depth0.shape
    h1, w1 = depth1.shape
    scale0 = jnp.asarray([w0, h0], jnp.float32)
    scale1 = jnp.asarray([w1, h1], jnp.float32)
    p0 = kpts01[:, 0:2] * scale0

    z0, v0 = _interp_depth(p0, depth0)

    # COLMAP convention: add crop offset (col, row) + 0.5
    bp0 = p0 + jnp.stack([bbox0[1], bbox0[0]]).astype(jnp.float32)[None, :] + 0.5
    xy1 = jnp.concatenate([bp0 * z0[:, None], z0[:, None]], axis=1)
    pts3d0 = _mm(xy1, jnp.linalg.inv(K0).T)
    pts3d0h = jnp.concatenate([pts3d0, jnp.ones_like(z0[:, None])], axis=1)
    pts3d1 = _mm(pts3d0h, pose01.T)[:, 0:3]

    zuv1 = _mm(pts3d1, K1.T)
    zsafe = jnp.where(jnp.abs(zuv1[:, 2:3]) > 1e-12, zuv1[:, 2:3], 1e-12)
    buv1 = zuv1[:, 0:2] / zsafe
    z01 = zuv1[:, 2]

    uv1 = buv1 - jnp.stack([bbox1[1], bbox1[0]]).astype(jnp.float32)[None, :] - 0.5

    z1i, v1 = _interp_depth(uv1, depth1)
    occl_ok = jnp.abs(z01 - z1i) < 0.05

    out_valid = valid & v0 & v1 & occl_ok & (z0 > 0)
    return p0 / scale0, uv1 / scale1, out_valid


def dense_grid(h: int, w: int) -> jnp.ndarray:
    """Pixel-center grid [(x, y)] over the full image, normalized to [0,1]
    (reference utils/projection.py:170-175 warp_dense grid)."""
    xs = jnp.linspace(1 / w / 2, 1 - 1 / w / 2, w)
    ys = jnp.linspace(1 / h / 2, 1 - 1 / h / 2, h)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=1)


def warp_dense(h: int, w: int, warp_params: dict):
    """Warp every pixel center (reference utils/projection.py:170-182).
    Returns (pts0 [HW,2], pts01 [HW,2], valid [HW])."""
    pts = dense_grid(h, w)
    return warp_points(pts, jnp.ones(pts.shape[0], bool), warp_params)


def warp_points(kpts: jnp.ndarray, valid: jnp.ndarray, warp_params: dict):
    """Mode dispatch mirroring reference utils/projection.py:185-192."""
    mode = warp_params["mode"]
    if mode == "homo":
        return warp_homography(kpts, valid, warp_params["homography_matrix"],
                               warp_params["width"], warp_params["height"])
    if mode == "se3":
        return warp_se3(kpts, valid, warp_params["pose01"],
                        warp_params["bbox0"], warp_params["bbox1"],
                        warp_params["depth0"], warp_params["depth1"],
                        warp_params["intrinsics0"], warp_params["intrinsics1"])
    raise ValueError(f"unknown warp mode {mode!r}")
