"""Fused Pallas front-end kernel: Gaussian blur + Sobel + NMS in one pass.

The reference runs three separate CUDA kernels with full HBM (and host!)
round-trips between stages (src/cuda.cu:75-390).  This kernel is the
TPU-native fusion: each image tile is DMA'd to VMEM once (with a stencil
halo), all three stages run on-chip, and only the non-max-suppressed
magnitude is written back — one HBM read + one HBM write per pixel for the
whole front end.  It mirrors the reference's own fusion win (fusing
xy-gradient into sobel_util cut 1.7ms, README.md:67) taken to its limit.

Tiling: the input is restacked in XLA into (nty, ntx, TH+2R, TW+2R)
overlapping halo tiles (R = blur_halo + 2), so the Pallas grid uses plain
non-overlapping BlockSpecs and gets automatic double-buffered HBM->VMEM
pipelining — the VMEM analog of the reference's 34x34 __shared__ halo tiles
(src/cuda.cu:115-178), without its divisibility bugs (src/cuda.cu:121-122).

Numerics are the exact primitives from ops.numerics, so the output is
bit-identical to the golden oracle and the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.numerics import (exact_div_by_vector, isqrt_int32, mul_const_f32,
                            quantize_angle_i32)

_NMS_OOB = -32768


def _cdiv(a, b):
    return -(-a // b)


def make_halo_tiles(img, th: int, tw: int, r: int):
    """(H, W) -> (nty, ntx, TH+2R, TW+2R) overlapping halo tiles.

    The image is zero-padded by R plus up to a tile of bottom/right slack;
    out-of-image texels are masked by global coordinates inside the kernel.
    """
    h, w = img.shape
    nty, ntx = _cdiv(h, th), _cdiv(w, tw)
    padded = jnp.pad(img, ((r, nty * th - h + r), (r, ntx * tw - w + r)))
    # gather overlapping windows: slice per tile row/col offset
    rows = [padded[i * th:i * th + th + 2 * r, :] for i in range(nty)]
    stacked = jnp.stack(rows)                       # (nty, TH+2R, Wp)
    cols = [stacked[:, :, j * tw:j * tw + tw + 2 * r] for j in range(ntx)]
    return jnp.stack(cols, axis=1)                  # (nty, ntx, TH+2R, TW+2R)


def _frontend_kernel(img_ref, nm_ref, *, kernel_vals, th, tw, r, H, W):
    window = len(kernel_vals)
    c = window // 2
    i = pl.program_id(0)
    j = pl.program_id(1)
    hp = th + 2 * r
    wp = tw + 2 * r

    # Mosaic has no direct uint8->f32 cast; go through int32
    x = img_ref[0, 0].astype(jnp.int32).astype(jnp.float32)  # (hp, wp)

    # global coordinates of each padded-tile texel
    row0 = i * th - r                                # global row of x[0, :]
    col0 = j * tw - r

    # ---- blur x pass: cols [c, wp-c) of the padded tile ----
    wo = wp - 2 * c
    gcol = col0 + c + jax.lax.broadcasted_iota(jnp.int32, (1, wo), 1)
    acc = jnp.zeros((hp, wo), jnp.float32)
    cnt = jnp.zeros((1, wo), jnp.float32)
    for t in range(window):
        off = t - c
        m = ((gcol + off) >= 0) & ((gcol + off) < W)
        # tiles are zero-padded beyond the global image, so out-of-bounds
        # taps contribute exactly +0.0 — no accumulator mask needed (IEEE
        # no-op, identical to the reference's skipped taps)
        acc = acc + mul_const_f32(x[:, t:t + wo], kernel_vals[t])
        cnt = cnt + jnp.where(m, np.float32(kernel_vals[t]), np.float32(0))
    temp = exact_div_by_vector(acc, cnt)

    # ---- blur y pass: rows [c, hp-c) -> smoothed (th+4, tw+4) ----
    ho = hp - 2 * c
    grow = row0 + c + jax.lax.broadcasted_iota(jnp.int32, (ho, 1), 0)
    acc = jnp.zeros((ho, wo), jnp.float32)
    cnt = jnp.zeros((ho, 1), jnp.float32)
    for t in range(window):
        off = t - c
        m = ((grow + off) >= 0) & ((grow + off) < H)
        acc = acc + mul_const_f32(temp[t:t + ho, :], kernel_vals[t])
        cnt = cnt + jnp.where(m, np.float32(kernel_vals[t]), np.float32(0))
    sm = exact_div_by_vector(acc, cnt).astype(jnp.int32)
    # sm covers global rows [i*th-2, ...+th+4), cols [j*tw-2, ...) (margin 2)

    # ---- sobel on margin-1 region (th+2, tw+2) ----
    g2row = (row0 + c) + jax.lax.broadcasted_iota(jnp.int32, (ho - 2, 1), 0) + 1
    g2col = (col0 + c) + jax.lax.broadcasted_iota(jnp.int32, (1, wo - 2), 1) + 1
    center_c = sm[:, 1:-1]
    xl = jnp.where(g2col - 1 >= 0, sm[:, :-2], center_c)
    xr = jnp.where(g2col + 1 < W, sm[:, 2:], center_c)
    d = xr - xl                                      # (ho, wo-2)
    gx = (2 * d[1:-1, :]
          + jnp.where(g2row + 1 < H, d[2:, :], 0)
          + jnp.where(g2row - 1 >= 0, d[:-2, :], 0))
    center_r = sm[1:-1, :]
    xu = jnp.where(g2row - 1 >= 0, sm[:-2, :], center_r)
    xd = jnp.where(g2row + 1 < H, sm[2:, :], center_r)
    e = xd - xu                                      # (ho-2, wo)
    gy = (2 * e[:, 1:-1]
          + jnp.where(g2col + 1 < W, e[:, 2:], 0)
          + jnp.where(g2col - 1 >= 0, e[:, :-2], 0))
    mag = isqrt_int32(gx * gx + gy * gy)             # (th+2, tw+2)
    ang = quantize_angle_i32(gx, gy)

    # ---- nms on the core (th, tw) ----
    g3row = i * th + jax.lax.broadcasted_iota(jnp.int32, (th, 1), 0)
    g3col = j * tw + jax.lax.broadcasted_iota(jnp.int32, (1, tw), 1)
    m0 = mag[1:-1, 1:-1]

    def nb(dr, dc):
        v = mag[1 + dr:1 + dr + th, 1 + dc:1 + dc + tw]
        inb = ((g3row + dr >= 0) & (g3row + dr < H)
               & (g3col + dc >= 0) & (g3col + dc < W))
        return jnp.where(inb, v, np.int32(_NMS_OOB))

    keep0 = (m0 > nb(0, -1)) & (m0 > nb(0, 1))
    keep45 = (m0 > nb(-1, 1)) & (m0 > nb(1, -1))
    keep90 = (m0 > nb(-1, 0)) & (m0 > nb(1, 0))
    keep135 = (m0 > nb(-1, -1)) & (m0 > nb(1, 1))
    a0 = ang[1:-1, 1:-1]
    # logical combination instead of select-on-bool (Mosaic i1 limitation)
    keep = (((a0 == 0) & keep0) | ((a0 == 45) & keep45)
            | ((a0 == 90) & keep90) | ((a0 == 135) & keep135))
    nm_ref[0, 0] = jnp.where(keep, m0, 0).astype(jnp.int16)


def frontend_nm(img, kernel_vals, *, tile=(128, 512), interpret=None):
    """uint8 (H, W) -> int16 NMS magnitude (H, W), fused in one Pallas pass.

    Bit-exact vs ops.stages blur+sobel+nms composition.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    H, W = img.shape
    window = len(kernel_vals)
    c = window // 2
    r = c + 2
    th = min(tile[0], max(8, H))
    tw = min(tile[1], max(128, W))
    nty, ntx = _cdiv(H, th), _cdiv(W, tw)

    tiles = make_halo_tiles(img, th, tw, r)

    kern = functools.partial(_frontend_kernel, kernel_vals=kernel_vals,
                             th=th, tw=tw, r=r, H=H, W=W)
    out = pl.pallas_call(
        kern,
        grid=(nty, ntx),
        in_specs=[pl.BlockSpec((1, 1, th + 2 * r, tw + 2 * r),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, th, tw), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nty, ntx, th, tw), jnp.int16),
        interpret=interpret,
    )(tiles)
    full = out.transpose(0, 2, 1, 3).reshape(nty * th, ntx * tw)
    return full[:H, :W]
