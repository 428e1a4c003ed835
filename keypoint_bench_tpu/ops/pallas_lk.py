"""Pallas TPU kernel: pyramidal Lucas-Kanade tracking, all iterations
in-kernel.

The XLA device LK (ops/lk.py) is bound by per-point window slice-gathers:
~1.7 ns/element x (win+1)^2 x 3 fields x 3 channels x 40 iterations x 3
levels ~ 0.9 s/frame at the reference protocol (PERF.md round 4). This
kernel replaces the gather with the one primitive Mosaic lowers fast
(tools/probe_lk_extract2.py, round 5: ~220-310 ns/point): an 8-aligned
dynamic sublane slab slice + 128-aligned dynamic lane slice from a
VMEM-resident field, then two dynamic `pltpu.roll`s that put the window's
integer corner base at (row 0, lane 0). Everything else is in-register:

  * the padded level images (img1, img2 as [3, Hp, Wp] f32) are DMA'd ONCE
    per batch element into single-buffered VMEM scratch (whole level
    resident — ~6 MB each at 512^2 with the roll-safe padding);
  * gradients are NOT sampled from precomputed dx2/dy2 maps: sampling a
    conv of the image == conv of the sampled window (both translation
    invariant), so the 3x3 Sobel-style kernels apply to the extracted
    corner slab via static rolls; corners in the zero-pad ring get a
    validity mask so the in-window conv matches the reference's
    zero-padded global gradient exactly (the ring would otherwise see
    ghost taps of the border pixels);
  * bilinear tap recombination, the di/jx/jy products and the five
    Gauss-Newton reductions are masked whole-slab VPU ops; the 2x2 solve
    with the det > 1e-6 guard runs on scalars (ops/lk._lk_level math);
  * the template patch is re-extracted from the img1 slab every iteration
    (its coordinates are fixed per level) — cheaper than persisting
    [N, win, win, 3] template patches in VMEM across the point loop.

Points live in SMEM in chunks of 128 per grid step; each point runs its
full iteration loop with scalar (x, y) carries. Known, documented
deviation from ops/lk._lk_level: a point that wanders further than half a
window outside the image is clamped to the slab-safe region instead of
replicating the XLA path's window-start clamp — both paths have long lost
such a point (its window reads zero padding, det ~ 0 freezes it), and the
equality test masks them out.

Semantics target: reference utils/matcher.py:7-142 via ops/lk.py
(tests/test_pallas_lk.py asserts equality with the XLA level iteration).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NCHUNK = 128          # points per grid step (SMEM blocks)
SLAB_R = 32           # extracted slab rows (>= win+3 corners + roll residual)
SLAB_L = 256          # extracted slab lanes (>= win+3 + residual 127)
CR = 24               # compute slab rows after the roll (8-divisible slice)
CL = 128              # compute slab lanes after the roll (128-aligned)


def _plan(h: int, w: int, win: int):
    """Static geometry: zero padding (the XLA path's win+1) and the
    roll-safe padded field shape. Slab bases cy/cx = floor(p)+pad-half-1
    stay in [1, n+pad-2] for p in [-half, n-1+half] (the point clamp), so
    hp/wp must cover base+SLAB."""
    half = win // 2
    pad = win + 1
    margin = float(half)
    hp = -(-max(h + 2 * pad, h + pad - 2 + SLAB_R) // 8) * 8
    wp = -(-max(w + 2 * pad, w + pad - 2 + SLAB_L) // 128) * 128
    return half, pad, margin, hp, wp


def _pad_field(img: jnp.ndarray, pad: int, hp: int, wp: int) -> jnp.ndarray:
    """[H, W, 3] -> channel-major zero-padded [3, Hp, Wp] f32."""
    h, w, _ = img.shape
    t = jnp.transpose(img.astype(jnp.float32), (2, 0, 1))
    return jnp.pad(t, ((0, 0), (pad, hp - h - pad), (pad, wp - w - pad)))


def _lk_kernel(p1x_ref, p1y_ref, p2x_ref, p2y_ref, img1_hbm, img2_hbm,
               outx_ref, outy_ref, f1_ref, f2_ref, sem1, sem2, *,
               win: int, iterations: int, h: int, w: int, pad: int,
               margin: float, interpret: bool):
    half = win // 2
    b = pl.program_id(0)
    c = pl.program_id(1)

    def roll(t, shift, axis):
        if interpret:
            return jnp.roll(t, shift, axis)
        return pltpu.roll(t, shift, axis)

    def shift(t, dy: int, dx: int):
        """Value at (i, j) becomes t[i + dy, j + dx] (static rolls on the
        [3, CR, CL] compute slab; wrapped far rows/lanes stay outside the
        masked tap region: taps reach row/lane win+1 <= 22 < CR-shift)."""
        if dy:
            t = roll(t, (CR - dy) % CR, axis=1)
        if dx:
            t = roll(t, (CL - dx) % CL, axis=2)
        return t

    @pl.when(c == 0)
    def _dma():
        cp1 = pltpu.make_async_copy(img1_hbm.at[b], f1_ref, sem1)
        cp2 = pltpu.make_async_copy(img2_hbm.at[b], f2_ref, sem2)
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()

    ri = lax.broadcasted_iota(jnp.int32, (3, CR, CL), 1)
    ci = lax.broadcasted_iota(jnp.int32, (3, CR, CL), 2)
    tapmask = ((ri < win) & (ci < win)).astype(jnp.float32)

    kx = ((1.0, 0.0, -1.0), (2.0, 0.0, -2.0), (1.0, 0.0, -1.0))

    def extract(f_ref, px, py):
        """Corner slab [3, SLAB_R, SLAB_L] with slab (0, 0) == padded
        field at (cy, cx) = floor(p) + pad - half - 1; returns the slab
        and the (cy, cx) scalars."""
        x0 = jnp.floor(px).astype(jnp.int32)
        y0 = jnp.floor(py).astype(jnp.int32)
        cx = x0 + pad - half - 1
        cy = y0 + pad - half - 1
        q = cy // 8
        ry = cy - q * 8
        xq = cx // 128
        rx = cx - xq * 128
        slab = f_ref[:, pl.ds(q * 8, SLAB_R), pl.ds(xq * 128, SLAB_L)]
        r = roll(slab, (SLAB_R - ry) % SLAB_R, axis=1)
        r = roll(r, (SLAB_L - rx) % SLAB_L, axis=2)
        # shrink to the compute slab: corners live in rows/lanes < win+3
        # <= 24; the row slice is 8-divisible and the lane slice is
        # 128-aligned, so both are free (a sub-128 lane slice would cost
        # ~5 us/point in relayouts — tools/probe_lk_extract.py)
        return r[:, 0:CR, 0:CL], cy, cx

    def taps(corners, fx, fy, base: int):
        """Bilinear tap slab: tap (ty, tx) lands at slab position
        (ty, tx), combining corners at (base+ty+{0,1}, base+tx+{0,1})."""
        return ((1.0 - fy) * (1.0 - fx) * shift(corners, base, base)
                + (1.0 - fy) * fx * shift(corners, base, base + 1)
                + fy * (1.0 - fx) * shift(corners, base + 1, base)
                + fy * fx * shift(corners, base + 1, base + 1))

    def gradients(corners, cy, cx):
        """In-window 3x3 conv == the sampled global gradient. The conv
        output at slab (i, j) is the gradient at corner-grid position
        (i+1, j+1), i.e. gradient corner (ty, tx) sits at slab (ty, tx)
        when the tap base is 0. The zero-pad ring is masked: gradient
        corners outside [0, n-1] image coords are 0 in the reference's
        padded field but would see ghost border taps here."""
        gx = jnp.zeros_like(corners)
        gy = jnp.zeros_like(corners)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                wx = kx[dy + 1][dx + 1]
                wy = kx[dx + 1][dy + 1]
                if wx == 0.0 and wy == 0.0:
                    continue
                s = shift(corners, dy + 1, dx + 1)
                if wx != 0.0:
                    gx = gx + s * wx
                if wy != 0.0:
                    gy = gy + s * wy
        yimg = ri + (cy + 1 - pad)
        ximg = ci + (cx + 1 - pad)
        valid = ((yimg >= 0) & (yimg <= h - 1)
                 & (ximg >= 0) & (ximg <= w - 1)).astype(jnp.float32)
        return gx * valid, gy * valid

    def point_body(k, _):
        kk = c * NCHUNK + k
        p1x = p1x_ref[b, kk]
        p1y = p1y_ref[b, kk]
        c1, _, _ = extract(f1_ref, p1x, p1y)
        fx1 = p1x - jnp.floor(p1x)
        fy1 = p1y - jnp.floor(p1y)
        patch1 = taps(c1, fx1, fy1, 1) * tapmask

        def iter_body(_, p):
            px, py = p
            px = jnp.clip(px, -margin, w - 1.0 + margin)
            py = jnp.clip(py, -margin, h - 1.0 + margin)
            c2, cy, cx = extract(f2_ref, px, py)
            fx = px - jnp.floor(px)
            fy = py - jnp.floor(py)
            p2v = taps(c2, fx, fy, 1) * tapmask
            gxc, gyc = gradients(c2, cy, cx)
            jx = taps(gxc, fx, fy, 0) * tapmask
            jy = taps(gyc, fx, fy, 0) * tapmask
            di = patch1 - p2v
            g00 = jnp.sum(jx * jx)
            g01 = jnp.sum(jx * jy)
            g11 = jnp.sum(jy * jy)
            bx = jnp.sum(di * jx)
            by = jnp.sum(di * jy)
            det = g00 * g11 - g01 * g01
            ok = det > 1e-6
            inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
            ux = (g11 * bx - g01 * by) * inv_det
            uy = (-g01 * bx + g00 * by) * inv_det
            return (px - jnp.where(ok, ux, 0.0),
                    py - jnp.where(ok, uy, 0.0))

        x, y = lax.fori_loop(0, iterations, iter_body,
                             (p2x_ref[b, kk], p2y_ref[b, kk]))
        outx_ref[b, kk] = x
        outy_ref[b, kk] = y
        return 0

    lax.fori_loop(0, NCHUNK, point_body, 0)


@functools.partial(jax.jit,
                   static_argnames=("win", "iterations", "interpret"))
def lk_level_pallas(img1: jnp.ndarray, img2: jnp.ndarray,
                    pts1: jnp.ndarray, pts2: jnp.ndarray, win: int,
                    iterations: int, interpret: bool = False) -> jnp.ndarray:
    """One LK pyramid level for a BATCH of image pairs.

    img1/img2 [B, H, W, 3] (any float dtype; computed in f32), pts1/pts2
    [B, N, 2] pixel coordinates at this level. Returns tracked [B, N, 2].
    Equality with ops/lk._lk_level: tests/test_pallas_lk.py.
    """
    bsz, h, w, _ = img1.shape
    n = pts1.shape[1]
    half, pad, margin, hp, wp = _plan(h, w, win)

    f1 = jax.vmap(lambda im: _pad_field(im, pad, hp, wp))(img1)
    f2 = jax.vmap(lambda im: _pad_field(im, pad, hp, wp))(img2)

    nc = -(-n // NCHUNK)
    npad = nc * NCHUNK

    def padn(x):
        return jnp.pad(x.astype(jnp.float32), ((0, 0), (0, npad - n)))

    p1x, p1y = padn(pts1[..., 0]), padn(pts1[..., 1])
    p2x, p2y = padn(pts2[..., 0]), padn(pts2[..., 1])

    smem_in = pl.BlockSpec(memory_space=pltpu.SMEM)   # full array; the
    # kernel indexes [b, c*NCHUNK + k] (blocked SMEM specs require
    # 8/128-divisible blocks, which a per-chunk scalar block is not)
    kernel = functools.partial(_lk_kernel, win=win, iterations=iterations,
                               h=h, w=w, pad=pad, margin=margin,
                               interpret=interpret)
    outx, outy = pl.pallas_call(
        kernel,
        grid=(bsz, nc),
        in_specs=[smem_in, smem_in, smem_in, smem_in,
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((bsz, npad), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((3, hp, wp), jnp.float32),
                        pltpu.VMEM((3, hp, wp), jnp.float32),
                        pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(p1x, p1y, p2x, p2y, f1, f2)
    return jnp.stack([outx[:, :n], outy[:, :n]], axis=-1)


def supported(img_shape, win: int) -> bool:
    """The kernel applies to 3-channel images with odd 3 <= win <= 21
    whose two padded f32 fields fit the VMEM budget."""
    if len(img_shape) < 3 or img_shape[-1] != 3:
        return False
    if win % 2 == 0 or win > 21 or win < 3:
        return False
    h, w = img_shape[-3], img_shape[-2]
    _, _, _, hp, wp = _plan(h, w, win)
    return 2 * 3 * hp * wp * 4 <= 14 * 1024 * 1024
