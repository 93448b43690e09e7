"""Shared windowed front-end math: blur + sobel + nms on a padded tile.

One implementation of the fused front end on an (th+2r, tw+2r) float32
window with global-coordinate border masks, used by BOTH:

* the Pallas kernel (kernels/frontend.py) — called inside the kernel body
  with program_id-derived offsets; and
* the XLA banded front end (:func:`frontend_nm_banded`) — called inside a
  ``lax.map`` over full-width row bands, which matters because XLA:TPU's
  per-pixel stencil cost grows sharply with image size (measured ~4x per
  size doubling: 30.6 GP/s at 540x1920 vs 2.1 GP/s at 4320x1920), so large
  images run fastest as a sequence of band-sized programs.

``row0``/``col0`` are the global coordinates of the window's top-left texel
(may be traced scalars); texels beyond the global image must be zero.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .numerics import (div_by_near_one, exact_div_by_vector, isqrt_f32,
                       mul_const_f32, near_one_ulp_offset, nms_bin_masks_f32)

_NMS_OOB = -32768


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _kernel_sum(kernel) -> np.float32:
    """Sequential f32 tap sum — bit-identical to the traced cnt accumulation
    where every mask is true, so it IS the interior divisor."""
    s = np.float32(0)
    for t in range(kernel.shape[0]):
        s = np.float32(s + kernel[t])
    return s


def _split_div(acc, cnt, s, widths, axis):
    """Renormalization division, split into exact-edge / near-one-interior.

    The divisor ``cnt`` equals the full kernel sum ``s`` everywhere except
    within the edge ``widths`` (host-static counts along ``axis``), and
    ``s`` is within 1 ulp of 1.0 for every practical sigma — so the
    interior division collapses to :func:`numerics.div_by_near_one`
    (3 integer ops/pixel) while the general fixer-based division runs only
    on the thin static edge slices.  ``widths=None`` (or an exotic kernel
    sum) falls back to the general path everywhere.
    """
    if widths is None or near_one_ulp_offset(s) is None:
        return exact_div_by_vector(acc, cnt)
    wl, wr = widths
    n = acc.shape[axis]
    if wl + wr >= n:
        return exact_div_by_vector(acc, cnt)
    if axis == 1:
        parts = (exact_div_by_vector(acc[:, :wl], cnt[:, :wl]),
                 div_by_near_one(acc[:, wl:n - wr], s),
                 exact_div_by_vector(acc[:, n - wr:], cnt[:, n - wr:]))
    else:
        parts = (exact_div_by_vector(acc[:wl], cnt[:wl]),
                 div_by_near_one(acc[wl:n - wr], s),
                 exact_div_by_vector(acc[n - wr:], cnt[n - wr:]))
    return jnp.concatenate(parts, axis=axis)


def window_nm(x, row0, col0, H: int, W: int, kernel_vals, th: int, tw: int,
              r: int, fastdiv_cols=None, fastdiv_rows=None):
    """float32 (th+2r, tw+2r) zero-padded window -> int32 nm core (th, tw).

    ``fastdiv_cols``/``fastdiv_rows``: optional (left, right) / (top,
    bottom) static edge widths outside of which the caller guarantees the
    renormalization count equals the full kernel sum (see :func:`_split_div`).
    """
    kernel = np.asarray(kernel_vals, np.float32)
    window = kernel.shape[0]
    c = window // 2
    s = _kernel_sum(kernel)
    hp, wp = th + 2 * r, tw + 2 * r

    # ---- blur x pass: cols [c, wp-c) of the padded window ----
    wo = wp - 2 * c
    gcol = col0 + c + jax.lax.broadcasted_iota(jnp.int32, (1, wo), 1)
    acc = jnp.zeros((hp, wo), jnp.float32)
    cnt = jnp.zeros((1, wo), jnp.float32)
    for t in range(window):
        off = t - c
        m = ((gcol + off) >= 0) & ((gcol + off) < W)
        # out-of-image texels are zero, so their taps add exact +0.0 — only
        # the weight-count needs masking
        acc = acc + mul_const_f32(x[:, t:t + wo], kernel[t])
        cnt = cnt + jnp.where(m, np.float32(kernel[t]), np.float32(0))
    temp = _split_div(acc, cnt, s, fastdiv_cols, axis=1)

    # ---- blur y pass: rows [c, hp-c) -> smoothed with margin 2 ----
    ho = hp - 2 * c
    grow = row0 + c + jax.lax.broadcasted_iota(jnp.int32, (ho, 1), 0)
    acc = jnp.zeros((ho, wo), jnp.float32)
    cnt = jnp.zeros((ho, 1), jnp.float32)
    for t in range(window):
        off = t - c
        m = ((grow + off) >= 0) & ((grow + off) < H)
        acc = acc + mul_const_f32(temp[t:t + ho, :], kernel[t])
        cnt = cnt + jnp.where(m, np.float32(kernel[t]), np.float32(0))
    # Back half runs in float32: the blurred values, gradients, magnitudes,
    # and every predicate operand are integers below 2^24, exactly
    # representable in f32, and f32 multiplies are far cheaper than int32
    # multiplies on the VPU (measured: the int32 angle/mag products cost
    # ~0.05 ms of the 0.23 ms 1080p front end).  jnp.floor == the
    # reference's (int) truncation for these nonnegative quotients.
    sm = jnp.floor(_split_div(acc, cnt, s, fastdiv_rows, axis=0))

    # ---- sobel on the margin-1 region ----
    two = np.float32(2)
    g2row = (row0 + c) + jax.lax.broadcasted_iota(jnp.int32, (ho - 2, 1), 0) + 1
    g2col = (col0 + c) + jax.lax.broadcasted_iota(jnp.int32, (1, wo - 2), 1) + 1
    center_c = sm[:, 1:-1]
    xl = jnp.where(g2col - 1 >= 0, sm[:, :-2], center_c)
    xr = jnp.where(g2col + 1 < W, sm[:, 2:], center_c)
    d = xr - xl
    gx = (two * d[1:-1, :]
          + jnp.where(g2row + 1 < H, d[2:, :], np.float32(0))
          + jnp.where(g2row - 1 >= 0, d[:-2, :], np.float32(0)))
    center_r = sm[1:-1, :]
    xu = jnp.where(g2row - 1 >= 0, sm[:-2, :], center_r)
    xd = jnp.where(g2row + 1 < H, sm[2:, :], center_r)
    e = xd - xu
    gy = (two * e[:, 1:-1]
          + jnp.where(g2col + 1 < W, e[:, 2:], np.float32(0))
          + jnp.where(g2col - 1 >= 0, e[:, :-2], np.float32(0)))
    mag = isqrt_f32(gx * gx + gy * gy)
    b0a, b45a, b90a, b135a = nms_bin_masks_f32(gx, gy)

    # ---- nms on the core (th, tw) ----
    g3row = (row0 + r) + jax.lax.broadcasted_iota(jnp.int32, (th, 1), 0)
    g3col = (col0 + r) + jax.lax.broadcasted_iota(jnp.int32, (1, tw), 1)
    m0 = mag[1:-1, 1:-1]

    def nb(dr, dc):
        v = mag[1 + dr:1 + dr + th, 1 + dc:1 + dc + tw]
        inb = ((g3row + dr >= 0) & (g3row + dr < H)
               & (g3col + dc >= 0) & (g3col + dc < W))
        return jnp.where(inb, v, np.float32(_NMS_OOB))

    keep0 = (m0 > nb(0, -1)) & (m0 > nb(0, 1))
    keep45 = (m0 > nb(-1, 1)) & (m0 > nb(1, -1))
    keep90 = (m0 > nb(-1, 0)) & (m0 > nb(1, 0))
    keep135 = (m0 > nb(-1, -1)) & (m0 > nb(1, 1))

    def core(b):
        return b[1:-1, 1:-1]

    # logical combination instead of select-on-bool (Mosaic i1 limitation)
    keep = ((core(b0a) & keep0) | (core(b45a) & keep45)
            | (core(b90a) & keep90) | (core(b135a) & keep135))
    return jnp.where(keep, m0, np.float32(0)).astype(jnp.int32)


def window_nm_interior(x, kernel_vals, th: int, tw: int, r: int,
                       *, row_off: int = 0, col_off: int = 0):
    """Maskless ``window_nm``: valid only where every texel of the output
    pixel's dependency cone (radius r = c+2) lies inside the image.

    The border masks (blur renormalization counts, sobel edge replication,
    NMS in-bounds checks) cost ~30% of the front end's runtime but only
    change the result within r of the image border, so the production
    front ends run this kernel everywhere and overwrite the r-wide border
    frame with the exact masked computation on four thin strips
    (:func:`frontend_nm_strips`).  Interior equivalence: out-of-cone masks
    never fire, and the renormalization count equals the full kernel sum
    exactly (the same f32 constant the masked path accumulates).

    ``row_off``/``col_off`` locate the (th+2r, tw+2r) logical window inside
    a larger ``x`` (used by the Pallas kernel, whose VMEM windows carry
    alignment-rounded halos); tap offsets are folded into the slices so no
    intermediate copy of the window is made.
    """
    kernel = np.asarray(kernel_vals, np.float32)
    window = kernel.shape[0]
    c = window // 2
    hp, wp = th + 2 * r, tw + 2 * r
    # full-sum constant, accumulated in tap order exactly as the masked
    # path's cnt does (f32 rounding at each step), so interior divisors are
    # bit-identical
    s = _kernel_sum(kernel)

    if near_one_ulp_offset(s) is not None:
        def div_s(acc, shape):
            return div_by_near_one(acc, s)
    else:  # exotic kernel sum: general fixer-based division
        def div_s(acc, shape):
            return exact_div_by_vector(acc, jnp.full(shape, s, jnp.float32))

    wo = wp - 2 * c
    acc = jnp.zeros((hp, wo), jnp.float32)
    for t in range(window):
        acc = acc + mul_const_f32(
            x[row_off:row_off + hp, col_off + t:col_off + t + wo], kernel[t])
    temp = div_s(acc, (1, wo))

    ho = hp - 2 * c
    acc = jnp.zeros((ho, wo), jnp.float32)
    for t in range(window):
        acc = acc + mul_const_f32(temp[t:t + ho, :], kernel[t])
    # f32 back half — see window_nm for the exactness argument
    sm = jnp.floor(div_s(acc, (ho, 1)))

    two = np.float32(2)
    d = sm[:, 2:] - sm[:, :-2]
    gx = two * d[1:-1, :] + d[2:, :] + d[:-2, :]
    e = sm[2:, :] - sm[:-2, :]
    gy = two * e[:, 1:-1] + e[:, 2:] + e[:, :-2]
    mag = isqrt_f32(gx * gx + gy * gy)
    b0a, b45a, b90a, b135a = nms_bin_masks_f32(gx, gy)

    m0 = mag[1:-1, 1:-1]

    def nb(dr, dc):
        return mag[1 + dr:1 + dr + th, 1 + dc:1 + dc + tw]

    keep0 = (m0 > nb(0, -1)) & (m0 > nb(0, 1))
    keep45 = (m0 > nb(-1, 1)) & (m0 > nb(1, -1))
    keep90 = (m0 > nb(-1, 0)) & (m0 > nb(1, 0))
    keep135 = (m0 > nb(-1, -1)) & (m0 > nb(1, 1))

    def core(b):
        return b[1:-1, 1:-1]

    keep = ((core(b0a) & keep0) | (core(b45a) & keep45)
            | (core(b90a) & keep90) | (core(b135a) & keep135))
    return jnp.where(keep, m0, np.float32(0)).astype(jnp.int32)


def frontend_nm_strips(nm, padded, img_shape, kernel_vals, r: int):
    """Overwrite the r-wide border frame of ``nm`` with the exact masked
    computation, evaluated on four thin strips.

    ``padded`` is the f32 image zero-padded by r on every side.  Each strip
    window is sliced from it, so strip inputs match the main pass texel for
    texel; :func:`window_nm` applies the full border-mask semantics.
    """
    H, W = img_shape
    sh = min(r, H)       # horizontal strip height
    sv = min(r, W)       # vertical strip width
    # top / bottom strips: (sh, W)
    top = window_nm(padded[:sh + 2 * r, :], jnp.int32(-r), jnp.int32(-r),
                    H, W, kernel_vals, sh, W, r)
    bot = window_nm(padded[H - sh:, :], jnp.int32(H - sh - r), jnp.int32(-r),
                    H, W, kernel_vals, sh, W, r)
    # left / right strips: (H, sv)
    left = window_nm(padded[:, :sv + 2 * r], jnp.int32(-r), jnp.int32(-r),
                     H, W, kernel_vals, H, sv, r)
    right = window_nm(padded[:, W - sv:], jnp.int32(-r),
                      jnp.int32(W - sv - r), H, W, kernel_vals, H, sv, r)
    dt = nm.dtype
    nm = jax.lax.dynamic_update_slice(nm, left.astype(dt), (0, 0))
    nm = jax.lax.dynamic_update_slice(nm, right.astype(dt), (0, W - sv))
    nm = jax.lax.dynamic_update_slice(nm, top.astype(dt), (0, 0))
    nm = jax.lax.dynamic_update_slice(nm, bot.astype(dt), (H - sh, 0))
    return nm


def frontend_nm_xla(img, kernel_vals, *, whole_h: int = 1440,
                    band_h: int = 720):
    """uint8 (H, W) -> int32 NMS magnitude: production XLA front end.

    One masked whole-image ``window_nm`` program for images up to
    ``whole_h`` rows; ``band_h``-row bands above that (XLA:TPU stencil
    throughput peaks near ~720-row programs at 4K — v5e profile: 0.92 ms
    banded-720 vs 1.08 whole-image at 2160x3840, while at 1080p the whole
    image wins, 0.232 vs 0.341 banded-512).

    The maskless+strips formulation (:func:`window_nm_interior` +
    :func:`frontend_nm_strips`) measured *slower* here — XLA's fused
    selects make the border masks nearly free (0.024 ms at 1080p) while
    the strip stitch costs 0.124 ms — so it is used only by the Pallas
    kernel, where Mosaic's mask cost is ~6x higher.
    """
    H, W = img.shape
    window = len(kernel_vals)
    c = window // 2
    r = c + 2
    if H <= whole_h:
        # row0 = col0 = -r, so the renormalization count differs from the
        # full kernel sum only within the first/last r rows and columns
        # (pass-1 taps for local col j span global cols [j-r, j+c-2], which
        # leave the image exactly when j < r or j >= wo - r; same for rows)
        padded = jnp.pad(img, r).astype(jnp.float32)
        return window_nm(padded, jnp.int32(-r), jnp.int32(-r), H, W,
                         kernel_vals, H, W, r,
                         fastdiv_cols=(r, r), fastdiv_rows=(r, r))
    # equalize band heights (minimal bottom padding: large pads from a fixed
    # band_h trigger a pathological Mosaic/XLA compile on the stack+map)
    nb = cdiv(H, band_h)
    bh = cdiv(cdiv(H, nb), 8) * 8
    return frontend_nm_banded(img, kernel_vals, band_h=bh)


def frontend_nm_banded(img, kernel_vals, *, band_h: int = 512):
    """uint8 (H, W) -> int32 NMS magnitude (H, W): XLA band-mapped front end.

    Full-width row bands with stencil halos run sequentially under
    ``lax.map``, each as a band-sized 2-D program (the size regime where
    XLA's stencil throughput peaks).  Bit-exact vs the stage composition.
    """
    H, W = img.shape
    window = len(kernel_vals)
    c = window // 2
    r = c + 2
    band_h = min(band_h, max(8, H))
    nb = cdiv(H, band_h)
    hp = nb * band_h

    padded = jnp.pad(img, ((r, hp - H + r), (r, r))).astype(jnp.float32)
    bands = jnp.stack([padded[i * band_h:i * band_h + band_h + 2 * r, :]
                       for i in range(nb)])
    row0s = jnp.arange(nb, dtype=jnp.int32) * band_h - r

    # Edge widths for the split renormalization division (see _split_div).
    # Columns: full-width bands with col0 = -r — exactly like the
    # whole-image case.  Rows: global-border rows appear only in each
    # band's first r local rows (band 0) or within the last r + (hp - H)
    # local rows (last band, which may carry hp - H padding rows past H);
    # interior bands get the general division on those thin slices too,
    # which is merely redundant, never wrong.
    fd_rows = (r, min(band_h, r + (hp - H)) if hp > H else r)

    def one(args):
        band, row0 = args
        return window_nm(band, row0, jnp.int32(-r), H, W, kernel_vals,
                         band_h, W, r,
                         fastdiv_cols=(r, r), fastdiv_rows=fd_rows)

    nm = jax.lax.map(one, (bands, row0s))
    return nm.reshape(hp, W)[:H]
