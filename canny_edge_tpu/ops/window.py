"""Shared windowed front-end math: blur + sobel + nms on a padded tile.

Three formulations of the same bit-exact front end:

* :func:`frontend_nm_static` — the production XLA path: select-free,
  every border case resolved at trace time (static row ranges, host
  count vectors, clamp/OOB pads).  Whole images up to ~1440 rows run as
  one program; taller images as full-width row bands (at 4K the banded
  form measures ~0.66 ms vs ~1.0 whole-image on v5e; below ~1080 rows
  per-pixel cost is flat and banding is a wash —
  benchmarks/exp_bands.py).  Small band counts run as independent
  static programs; very tall images share one row0-independent interior
  program under ``lax.map`` to bound compile time.
* :func:`window_nm` — the general masked window (traced or static
  offsets), used by the border strips and the Pallas restack kernel.
* :func:`window_nm_interior` — maskless interior-only form used inside
  the Pallas element-indexed kernel (borders overwritten by
  :func:`frontend_nm_strips`).

``row0``/``col0`` are the global coordinates of the window's top-left texel
(traced scalars or Python ints); texels beyond the global image must be
zero.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .numerics import (div_by_near_one, exact_div_by_vector, isqrt_f32,
                       mul_const_f32, near_one_ulp_offset)

_NMS_OOB = -32768

# Experiment knobs (benchmarks/exp_hbm.py): which blur-pass axes stitch the
# renormalization division via tile-aligned concatenate instead of
# dynamic_update_slice, and whether the padded input window is pre-converted
# to f32.  Production values are the measured winners on v5e.
_DIV_CONCAT_AXES: frozenset = frozenset()
_PAD_F32: bool = True

# Tap-read mechanism for frontend_nm_static's blur accumulations
# (benchmarks/exp_taps.py): "slice" (production), "roll_x" (x-pass taps
# via jnp.roll — value-identical: the wrapped elements land beyond the
# cropped width whenever lo + n <= padded width, which holds for every
# in-bounds tap), "roll_xy" (both passes).  exp_opcost2.py measured roll
# ~10%/tap cheaper than lane slices in isolation; exp_taps.py measures
# it on the real frontend.
_TAP_MECHANISM: str = "slice"


def _tap_cols(x, lo: int, n: int):
    if _TAP_MECHANISM in ("roll_x", "roll_xy") and 0 <= lo:
        return jnp.roll(x, -lo, axis=1)[:, :n]
    return x[:, lo:lo + n]


def _tap_rows(x, lo: int, n: int):
    if _TAP_MECHANISM == "roll_xy" and 0 <= lo:
        return jnp.roll(x, -lo, axis=0)[:n, :]
    return x[lo:lo + n, :]


def _nms_maxc(gxc, gyc, m0, nb):
    """Max-cascade NMS tail: ``keep = m0 > max(direction neighbour pair)``.

    ``gxc``/``gyc`` are the gradients on the output core; ``nb(dr, dc)``
    returns the magnitude neighbour at that offset (with whatever OOB
    substitution the caller's border policy requires — the OOB sentinel
    only lowers the max, which preserves ``m0 > max(n1, n2)  <=>
    (m0 > n1) & (m0 > n2)`` exactly; every operand is an integer-valued
    f32 so the maxes and compares are exact).

    The direction's pair-max is chosen by a high/low/sign select cascade:
    ``b90 == high`` (see numerics.nms_bin_masks_f32 — under high gy != 0
    always holds), and both the ``low`` and the sign==0 mid bins take the
    horizontal pair, so neither ``mid`` nor the b45/b135 ANDs are ever
    materialized.  ~27 VPU ops vs ~37 for the select-neighbours-first
    form and ~45 for compare-all-8 — and only 2 i1-vector ANDs, which is
    the op class Mosaic lowers poorly (benchmarks/exp_nms.py: XLA
    interior 1080p 0.140 -> 0.125 ms; the reference's semantics — ties
    suppressed, src/utils.cpp:251-305 — are unchanged).
    """
    ax = jnp.abs(gxc)
    ay = jnp.abs(gyc)
    diff2 = (ax - ay) * (ax - ay)
    two = np.float32(2)
    low = (ax > ay) & (two * ay * ay < diff2)
    high = (ay > ax) & (diff2 > two * ax * ax)
    sp = gxc * gyc
    maxh = jnp.maximum(nb(0, -1), nb(0, 1))
    thr = jnp.where(
        high, jnp.maximum(nb(-1, 0), nb(1, 0)),
        jnp.where(low, maxh,
                  jnp.where(sp > np.float32(0),
                            jnp.maximum(nb(-1, 1), nb(1, -1)),
                            jnp.where(sp < np.float32(0),
                                      jnp.maximum(nb(-1, -1), nb(1, 1)),
                                      maxh))))
    return jnp.where(m0 > thr, m0, np.float32(0))


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _kernel_sum(kernel) -> np.float32:
    """Sequential f32 tap sum — bit-identical to the traced cnt accumulation
    where every mask is true, so it IS the interior divisor."""
    s = np.float32(0)
    for t in range(kernel.shape[0]):
        s = np.float32(s + kernel[t])
    return s


class _GCoord:
    """Global row/col coordinate vector for border-mask predicates.

    With a host-static ``base`` each predicate is first evaluated on the
    host: an all-true predicate returns ``None`` (the mask — and with it
    the select — is elided from the program entirely); a partial predicate
    falls back to the same traced iota comparison the dynamic path uses,
    so no large boolean constants are ever embedded in the executable.
    """

    def __init__(self, base, n: int, shape, axis: int):
        self.static = isinstance(base, (int, np.integer))
        self.base = base
        self.np_idx = (base + np.arange(n)) if self.static else None
        self.shape = shape
        self.axis = axis
        self._traced = None

    def _idx(self):
        if self._traced is None:
            self._traced = self.base + jax.lax.broadcasted_iota(
                jnp.int32, self.shape, self.axis)
        return self._traced

    def ge(self, off: int):
        """Mask for ``base + i + off >= 0`` (None if always true)."""
        if self.static and (self.np_idx + off >= 0).all():
            return None
        return (self._idx() + off) >= 0

    def lt(self, off: int, lim: int):
        """Mask for ``base + i + off < lim`` (None if always true)."""
        if self.static and (self.np_idx + off < lim).all():
            return None
        return (self._idx() + off) < lim

    def inb(self, off: int, lim: int):
        """Mask for ``0 <= base + i + off < lim`` (None if always true)."""
        return _and(self.ge(off), self.lt(off, lim))


def _and(a, b):
    """AND of optional masks (None = all-true)."""
    if a is None:
        return b
    if b is None:
        return a
    return a & b


def _sel(m, a, b):
    """``jnp.where`` with an optional mask (None = all-true -> a)."""
    return a if m is None else jnp.where(m, a, b)


def _host_cnt(base: int, n: int, limit: int, kernel) -> np.ndarray:
    """Renormalization count vector, computed on the host.

    ``cnt[j]`` = f32 tap-order sum of kernel weights whose texel
    ``base + j + t - c`` lies inside ``[0, limit)`` — bit-identical to the
    traced accumulation in :func:`window_nm` (elementwise f32 rounding at
    every step), but a trace-time constant.
    """
    c = kernel.shape[0] // 2
    idx = base + np.arange(n)
    cnt = np.zeros(n, np.float32)
    for t in range(kernel.shape[0]):
        m = ((idx + t - c) >= 0) & ((idx + t - c) < limit)
        cnt = (cnt + np.where(m, kernel[t], np.float32(0))).astype(np.float32)
    return cnt


def _split_div_static(acc, cnt_np, s, axis, post=None):
    """Renormalization division against a *host-constant* count vector.

    Interior (cnt == full kernel sum ``s``, within 1 ulp of 1.0 for every
    practical sigma) collapses to :func:`numerics.div_by_near_one`; the
    static edge slices use the 2-iteration fixer seeded by the host's
    correctly rounded reciprocal (IEEE hardware division on the host), so
    no reciprocal is ever computed on device.

    ``post``: optional elementwise epilogue (e.g. floor + narrowing cast)
    applied *per piece* so it fuses into each piece's producer instead of
    becoming its own full-size HBM array (the round-3 program materialized
    a bare full-size ``floor``; benchmarks/exp_hbm.py).
    """
    n = cnt_np.shape[0]
    if post is None:
        post = lambda v: v  # noqa: E731

    def general(a, cv):
        # rows/cols whose whole tap span is outside the image have
        # cnt == 0 AND acc == 0 (zero-padded texels); the a==0 guard in
        # exact_div_f32 forces the quotient to 0, so the divisor value is
        # irrelevant — substitute 1 to keep the host reciprocal finite
        cv = np.where(cv == 0, np.float32(1), cv).astype(np.float32)
        recip = (np.float32(1) / cv).astype(np.float32)
        k = cv.shape[0]
        sh = (1, k) if axis == 1 else (k, 1)
        return exact_div_by_vector(a, jnp.asarray(cv.reshape(sh)),
                                   recip=jnp.asarray(recip.reshape(sh)))

    interior = cnt_np == s
    wl = int(np.argmax(interior)) if interior.any() else n
    wr = int(np.argmax(interior[::-1])) if interior.any() else 0
    if (near_one_ulp_offset(s) is None or not interior.any()
            or not interior[wl:n - wr].all()):
        return post(general(acc, cnt_np))
    granule = 128 if axis == 1 else 8
    aligned = n % granule == 0 and n >= 2 * granule
    if aligned:
        # widen the edge blocks to the register-tile granule (lanes 128 /
        # sublanes 8): the extra fixer work on interior rows/cols is
        # cheaper than a misaligned narrow slice+update, and the fixer
        # result equals the near-one result wherever cnt == s (both
        # correctly rounded)
        wl = -(-wl // granule) * granule
        wr = -(-wr // granule) * granule
    if aligned and axis in _DIV_CONCAT_AXES:
        # tile-aligned 3-piece concatenate: one materialized array per
        # pass instead of near-one-full + a full-size fusion per DUS edge
        # stitch.  Gated per axis: measured SLOWER on the lane axis even
        # tile-aligned (0.158 -> 0.190 ms whole-frontend, exp_hbm.py) —
        # XLA lowers the lane concat poorly — kept as an experiment knob.
        def cut(lo, hi):
            return acc[:, lo:hi] if axis == 1 else acc[lo:hi]

        pieces = []
        if wl:
            pieces.append(post(general(cut(0, wl), cnt_np[:wl])))
        pieces.append(post(div_by_near_one(cut(wl, n - wr), s)))
        if wr:
            pieces.append(post(general(cut(n - wr, n), cnt_np[n - wr:])))
        if len(pieces) == 1:
            return pieces[0]
        return jnp.concatenate(pieces, axis=axis)
    # near-one over the full array (3 integer ops/pixel; the edge strip
    # values it produces are discarded), then overwrite the edges in place
    # with dynamic_update_slice
    out = post(div_by_near_one(acc, s))
    if wl:
        left = post(general(acc[:, :wl] if axis == 1 else acc[:wl],
                            cnt_np[:wl]))
        out = jax.lax.dynamic_update_slice(out, left, (0, 0))
    if wr:
        right = post(general(acc[:, n - wr:] if axis == 1 else acc[n - wr:],
                             cnt_np[n - wr:]))
        start = (0, n - wr) if axis == 1 else (n - wr, 0)
        out = jax.lax.dynamic_update_slice(out, right, start)
    return out


def window_nm(x, row0, col0, H: int, W: int, kernel_vals, th: int, tw: int,
              r: int):
    """float32 (th+2r, tw+2r) zero-padded window -> int32 nm core (th, tw).

    ``row0``/``col0`` may be traced scalars (Pallas restack kernel: offsets
    come from ``program_id``) or Python ints.  With host-static offsets
    every border mask is a trace-time constant — all-true masks disappear
    entirely (:func:`_where`), the renormalization count becomes a host
    vector, and its division splits into near-one interior + host-seeded
    edge fixups (:func:`_split_div_static`): measured 0.23 -> 0.17 ms for
    the whole-image 1080p front end on v5e.

    Traced offsets use the general fixer-based division on the full window
    (its windows are small Pallas tiles, where the split machinery's
    stitch overhead outweighs the fixer savings).
    """
    kernel = np.asarray(kernel_vals, np.float32)
    window = kernel.shape[0]
    c = window // 2
    s = _kernel_sum(kernel)
    hp, wp = th + 2 * r, tw + 2 * r
    static_c = isinstance(col0, (int, np.integer))
    static_r = isinstance(row0, (int, np.integer))

    # ---- blur x pass: cols [c, wp-c) of the padded window ----
    # out-of-image texels are zero, so their taps add exact +0.0 — only
    # the weight-count needs masking
    wo = wp - 2 * c
    acc = jnp.zeros((hp, wo), jnp.float32)
    for t in range(window):
        acc = acc + mul_const_f32(x[:, t:t + wo], kernel[t])
    if static_c:
        temp = _split_div_static(acc, _host_cnt(col0 + c, wo, W, kernel),
                                 s, axis=1)
    else:
        gcol = col0 + c + jax.lax.broadcasted_iota(jnp.int32, (1, wo), 1)
        cnt = jnp.zeros((1, wo), jnp.float32)
        for t in range(window):
            off = t - c
            m = ((gcol + off) >= 0) & ((gcol + off) < W)
            cnt = cnt + jnp.where(m, np.float32(kernel[t]), np.float32(0))
        temp = exact_div_by_vector(acc, cnt)

    # ---- blur y pass: rows [c, hp-c) -> smoothed with margin 2 ----
    ho = hp - 2 * c
    acc = jnp.zeros((ho, wo), jnp.float32)
    for t in range(window):
        acc = acc + mul_const_f32(temp[t:t + ho, :], kernel[t])
    if static_r:
        div = _split_div_static(acc, _host_cnt(row0 + c, ho, H, kernel),
                                s, axis=0)
    else:
        grow = row0 + c + jax.lax.broadcasted_iota(jnp.int32, (ho, 1), 0)
        cnt = jnp.zeros((ho, 1), jnp.float32)
        for t in range(window):
            off = t - c
            m = ((grow + off) >= 0) & ((grow + off) < H)
            cnt = cnt + jnp.where(m, np.float32(kernel[t]), np.float32(0))
        div = exact_div_by_vector(acc, cnt)
    # Back half runs in float32: the blurred values, gradients, magnitudes,
    # and every predicate operand are integers below 2^24, exactly
    # representable in f32, and f32 multiplies are far cheaper than int32
    # multiplies on the VPU (measured: the int32 angle/mag products cost
    # ~0.05 ms of the 0.23 ms 1080p front end).  jnp.floor == the
    # reference's (int) truncation for these nonnegative quotients.
    sm = jnp.floor(div)

    # ---- sobel on the margin-1 region ----
    two = np.float32(2)
    g2row = _GCoord(row0 + c + 1, ho - 2, (ho - 2, 1), 0)
    g2col = _GCoord(col0 + c + 1, wo - 2, (1, wo - 2), 1)
    center_c = sm[:, 1:-1]
    xl = _sel(g2col.ge(-1), sm[:, :-2], center_c)
    xr = _sel(g2col.lt(1, W), sm[:, 2:], center_c)
    d = xr - xl
    gx = (two * d[1:-1, :]
          + _sel(g2row.lt(1, H), d[2:, :], np.float32(0))
          + _sel(g2row.ge(-1), d[:-2, :], np.float32(0)))
    center_r = sm[1:-1, :]
    xu = _sel(g2row.ge(-1), sm[:-2, :], center_r)
    xd = _sel(g2row.lt(1, H), sm[2:, :], center_r)
    e = xd - xu
    gy = (two * e[:, 1:-1]
          + _sel(g2col.lt(1, W), e[:, 2:], np.float32(0))
          + _sel(g2col.ge(-1), e[:, :-2], np.float32(0)))
    mag = isqrt_f32(gx * gx + gy * gy)

    # ---- nms on the core (th, tw) ----
    g3row = _GCoord(row0 + r, th, (th, 1), 0)
    g3col = _GCoord(col0 + r, tw, (1, tw), 1)
    m0 = mag[1:-1, 1:-1]

    def nb(dr, dc):
        v = mag[1 + dr:1 + dr + th, 1 + dc:1 + dc + tw]
        return _sel(_and(g3row.inb(dr, H), g3col.inb(dc, W)),
                    v, np.float32(_NMS_OOB))

    nmf = _nms_maxc(gx[1:-1, 1:-1], gy[1:-1, 1:-1], m0, nb)
    return nmf.astype(jnp.int32)


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

    m0 = mag[1:-1, 1:-1]

    def nb(dr, dc):
        return mag[1 + dr:1 + dr + th, 1 + dc:1 + dc + tw]

    nmf = _nms_maxc(gx[1:-1, 1:-1], gy[1:-1, 1:-1], m0, nb)
    return nmf.astype(jnp.int32)


def frontend_nm_static(x, row0: int, nrows: int, H: int, W: int,
                       kernel_vals, thresholds=None):
    """Select-free static front end for output rows [row0, row0+nrows).

    ``x``: ``(nrows + 2r, W + 2r)`` window holding global rows
    ``[row0-r, row0+nrows+r)`` x cols ``[-r, W+r)``, zero beyond the image
    (the same window layout :func:`window_nm` takes).  Any dtype whose
    values convert exactly to float32 (uint8 preferred: a padded uint8
    image costs 1 B/px of HBM instead of 4 — the taps convert inside the
    accumulation fusion).  ``row0`` must be a
    Python int; every border case is resolved at trace time into static
    slices and single-row/col pads, so the traced program contains **no
    border selects and no mask compares at all** — the reason this runs at
    the maskless-interior speed (0.15 ms vs 0.23 ms for the select-based
    form at 1080p on v5e) while remaining bit-exact to the golden model
    everywhere:

    * blur: out-of-image taps read zero-padded texels (exact +0.0), and
      the renormalization count is a host-computed f32 vector
      (:func:`_host_cnt`) whose division splits into near-one interior +
      host-seeded edge fixups (:func:`_split_div_static`);
    * sobel ``xl/xr/xu/xd`` edge replication (src/utils.cpp:196-205) is
      clamp-to-edge: a 1-texel replicate-pad at static image borders;
    * the directional zero terms of gx/gy are zero-row/col pads;
    * NMS out-of-image neighbours are a constant-pad with the OOB
      sentinel.

    Rows of the window beyond the image (a trailing band's padding) yield
    zero output rows.

    ``thresholds``: optional ``(min_val, max_val)`` traced scalars.  When
    given, the return value is the pair of *bit-packed* uint32
    ``(weak, strong)`` hysteresis masks (ops.packed layout) instead of the
    int32 nm map: the threshold compares and the 32-to-1 packing fuse into
    the front-end program, so the full-size nm array is never written to
    HBM — the downstream VMEM flood kernel reads 0.52 MB of masks instead
    of 8.3 MB of magnitudes (1080p).
    """
    kernel = np.asarray(kernel_vals, np.float32)
    window = kernel.shape[0]
    c = window // 2
    r = c + 2
    s = _kernel_sum(kernel)

    # ---- blur x pass: cols [0, W) only (borders via static cnt) ----
    # global col g taps x cols [g + r - c, g + r + c]
    acc = jnp.zeros((x.shape[0], W), jnp.float32)
    for t in range(window):
        acc = acc + mul_const_f32(_tap_cols(x, r - c + t, W), kernel[t])
    temp = _split_div_static(acc, _host_cnt(0, W, W, kernel), s, axis=1)

    # ---- blur y pass: sm rows [sm_lo, sm_hi) = [row0-2, row0+nrows+2)
    #      clamped to the image ----
    sm_lo = max(row0 - 2, 0)
    sm_hi = min(row0 + nrows + 2, H)
    nsm = sm_hi - sm_lo
    # sm row g taps temp rows [g - c, g + c] -> x-row index g - row0 + r + off
    t0 = sm_lo - row0 + r - c
    acc = jnp.zeros((nsm, W), jnp.float32)
    for t in range(window):
        acc = acc + mul_const_f32(_tap_rows(temp, t0 + t, nsm), kernel[t])
    # floor fuses into the division pieces (the round-3 program
    # materialized a separate full-size floor array).  sm stays f32:
    # narrowing it to uint8 was measured SLOWER (0.158 -> 0.210 ms) — the
    # u8 concats and back-converts materialize as their own full-size
    # arrays and the sub-word tiling costs VPU relayout work, the same
    # failure mode as the refuted byte-staged packing (exp_pack.py).
    sm = _split_div_static(acc, _host_cnt(sm_lo, nsm, H, kernel), s, axis=0,
                           post=jnp.floor)

    # ---- sobel rows [g_lo, g_hi) = [row0-1, row0+nrows+1) clamped ----
    two = np.float32(2)
    g_lo = max(row0 - 1, 0)
    g_hi = min(row0 + nrows + 1, H)

    def rows(lo, hi, arr, arr_lo):
        return arr[lo - arr_lo:hi - arr_lo]

    # d rows [d_lo, d_hi): the in-image rows feeding gx's 3-row stencil
    d_lo = max(g_lo - 1, 0)
    d_hi = min(g_hi + 1, H)
    smc = jnp.pad(rows(d_lo, d_hi, sm, sm_lo), ((0, 0), (1, 1)),
                  mode="edge")
    d = smc[:, 2:] - smc[:, :-2]
    # zero rows exactly where the image ends (never where margins exist)
    zrow = jnp.zeros((1, W), jnp.float32)
    dz = jnp.concatenate(
        ([zrow] if d_lo == g_lo else []) + [d]
        + ([zrow] if d_hi == g_hi else []), axis=0)
    gx = two * dz[1:-1, :] + dz[2:, :] + dz[:-2, :]

    # e rows [g_lo, g_hi): sm clamped-to-edge over [g_lo-1, g_hi+1)
    smr = jnp.concatenate(
        ([rows(sm_lo, sm_lo + 1, sm, sm_lo)] if g_lo - 1 < 0 else
         [rows(g_lo - 1, g_lo, sm, sm_lo)])
        + [rows(g_lo, g_hi, sm, sm_lo)]
        + ([rows(sm_hi - 1, sm_hi, sm, sm_lo)] if g_hi + 1 > H else
           [rows(g_hi, g_hi + 1, sm, sm_lo)]), axis=0)
    e = smr[2:, :] - smr[:-2, :]
    ez = jnp.pad(e, ((0, 0), (1, 1)))
    gy = two * e + ez[:, 2:] + ez[:, :-2]

    mag = isqrt_f32(gx * gx + gy * gy)

    # ---- nms rows [n_lo, n_hi) = [row0, row0+nrows) clamped ----
    n_lo = max(row0, 0)
    n_hi = min(row0 + nrows, H)
    nn = n_hi - n_lo
    oob = np.float32(_NMS_OOB)
    magx = jnp.pad(rows(max(n_lo - 1, 0), min(n_hi + 1, H), mag, g_lo),
                   ((1 if n_lo - 1 < 0 else 0, 1 if n_hi + 1 > H else 0),
                    (1, 1)), constant_values=oob)

    def nb(dr, dc):
        return magx[1 + dr:1 + dr + nn, 1 + dc:1 + dc + W]

    def core(b):
        return rows(n_lo, n_hi, b, g_lo)

    nmf = _nms_maxc(core(gx), core(gy), nb(0, 0), nb)
    if thresholds is not None:
        from .packed import pack_mask

        mn, mx = thresholds
        weak = pack_mask(nmf >= jnp.asarray(mn, jnp.float32))
        strong = pack_mask(nmf >= jnp.asarray(mx, jnp.float32))
        if nn < nrows:
            padr = ((n_lo - row0, row0 + nrows - n_hi), (0, 0))
            weak, strong = jnp.pad(weak, padr), jnp.pad(strong, padr)
        return weak, strong
    nm = nmf.astype(jnp.int32)
    if nn < nrows:  # trailing all-padding rows of the last band
        nm = jnp.pad(nm, ((n_lo - row0, row0 + nrows - n_hi), (0, 0)))
    return nm


def frontend_nm_strips(nm, img, kernel_vals, r: int):
    """Overwrite the r-wide border frame of ``nm`` with the exact masked
    computation, evaluated on four thin strips.

    ``img`` is the raw uint8 image.  Each strip pads its own thin slice
    (~(r+2r)-wide) locally instead of materializing a full zero-padded f32
    copy of the image (~8.5 MB of HBM write+read at 1080p that the main
    pass never shares); texel values are identical, and :func:`window_nm`
    applies the full border-mask semantics.
    """
    H, W = img.shape
    sh = min(r, H)       # horizontal strip height
    sv = min(r, W)       # vertical strip width

    def f32(x, pads):
        return jnp.pad(x, pads).astype(jnp.float32)

    # Each strip window spans global rows [row0, row0 + th + 2r) x cols
    # [col0, col0 + tw + 2r); rows/cols beyond the image are zero-padding
    # on both sides (small images: a strip's span can overhang both edges).
    def rpad(lo, hi):  # rows [lo, hi) -> (slice, (pad_before, pad_after))
        return img[max(lo, 0):min(hi, H)], (max(-lo, 0), max(hi - H, 0))

    def cpad(lo, hi):
        return img[:, max(lo, 0):min(hi, W)], (max(-lo, 0), max(hi - W, 0))

    # top / bottom strips: (sh, W); windows span rows [-r, sh+r) / [H-sh-r,
    # H+r) x cols [-r, W+r)
    ts, tp = rpad(-r, sh + r)
    top = window_nm(f32(ts, (tp, (r, r))), -r, -r,
                    H, W, kernel_vals, sh, W, r)
    bs, bp = rpad(H - sh - r, H + r)
    bot = window_nm(f32(bs, (bp, (r, r))), H - sh - r, -r,
                    H, W, kernel_vals, sh, W, r)
    # left / right strips: (H, sv)
    ls, lp = cpad(-r, sv + r)
    left = window_nm(f32(ls, ((r, r), lp)), -r, -r,
                     H, W, kernel_vals, H, sv, r)
    rs, rp = cpad(W - sv - r, W + r)
    right = window_nm(f32(rs, ((r, r), rp)), -r,
                      W - sv - r, H, W, kernel_vals, H, sv, r)
    dt = nm.dtype
    nm = jax.lax.dynamic_update_slice(nm, left.astype(dt), (0, 0))
    nm = jax.lax.dynamic_update_slice(nm, right.astype(dt), (0, W - sv))
    nm = jax.lax.dynamic_update_slice(nm, top.astype(dt), (0, 0))
    nm = jax.lax.dynamic_update_slice(nm, bot.astype(dt), (H - sh, 0))
    return nm


def frontend_nm_xla(img, kernel_vals, *, whole_h: int = 1440,
                    band_h: int = 720, thresholds=None):
    """uint8 (H, W) -> int32 NMS magnitude: production XLA front end.

    One select-free whole-image program (:func:`frontend_nm_static`) for
    images up to ``whole_h`` rows; ``band_h``-row bands above that (v5e
    profile at 2160x3840: ~0.66 ms unmapped-banded vs 1.08 whole-image;
    at 1080p whole-image and banded tie at ~0.176 ms, so one program —
    zero stitching — wins; benchmarks/exp_bands.py).

    ``thresholds``: see :func:`frontend_nm_static` — returns packed
    (weak, strong) masks instead of nm, never materializing nm in HBM.
    """
    H, W = img.shape
    window = len(kernel_vals)
    c = window // 2
    r = c + 2
    if H <= whole_h:
        # select-free static formulation (see frontend_nm_static)
        padded = jnp.pad(img, r)
        if _PAD_F32:
            padded = padded.astype(jnp.float32)
        return frontend_nm_static(padded, 0, H, H, W, kernel_vals,
                                  thresholds=thresholds)
    # equalize band heights (minimal bottom padding: large pads from a fixed
    # band_h trigger a pathological Mosaic/XLA compile on the stack+map)
    nb = cdiv(H, band_h)
    bh = cdiv(cdiv(H, nb), 8) * 8
    return frontend_nm_banded(img, kernel_vals, band_h=bh,
                              thresholds=thresholds)


def frontend_nm_banded(img, kernel_vals, *, band_h: int = 512,
                       thresholds=None, max_unmapped_bands: int = 8):
    """uint8 (H, W) -> int32 NMS magnitude (H, W): XLA banded front end.

    Full-width row bands with stencil halos, each a band-sized 2-D
    program.  Bit-exact vs the stage composition.

    Band execution policy (measured on v5e, benchmarks/exp_bands.py):

    * ``nb <= max_unmapped_bands``: every band is its own independent
      static program on a slice of the shared padded image — no
      ``jnp.stack`` of band windows and no ``lax.map``, whose
      per-iteration window copies cost ~8% at 4K (0.72 -> 0.66 ms).
      Compile time grows with nb, so this is capped.
    * taller images: interior bands (dependency cone strictly inside the
      image, program independent of row0) share one program under
      ``lax.map``; border bands get their own static programs.

    ``thresholds``: see :func:`frontend_nm_static`.
    """
    H, W = img.shape
    window = len(kernel_vals)
    c = window // 2
    r = c + 2
    band_h = min(band_h, max(8, H))
    nb = cdiv(H, band_h)
    hp = nb * band_h

    padded = jnp.pad(img, ((r, hp - H + r), (r, r)))
    if _PAD_F32:
        padded = padded.astype(jnp.float32)

    def band_window(i):
        return padded[i * band_h:i * band_h + band_h + 2 * r, :]

    def is_interior(i):
        # every row in band i's dependency cone lies strictly inside the
        # image: rows touched span [i*band_h - r, (i+1)*band_h + r)
        return i * band_h - r >= 0 and (i + 1) * band_h + r <= H

    interior = [] if nb <= max_unmapped_bands else \
        [i for i in range(nb) if is_interior(i)]
    specials = [i for i in range(nb) if i not in interior]
    outs = [None] * nb
    if interior:
        stacked = jnp.stack([band_window(i) for i in interior])
        rep_row0 = interior[0] * band_h

        def one(band):
            return frontend_nm_static(band, rep_row0, band_h, H, W,
                                      kernel_vals, thresholds=thresholds)

        mapped = jax.lax.map(one, stacked)
        for k, i in enumerate(interior):
            outs[i] = jax.tree.map(lambda a, k=k: a[k], mapped)
    for i in specials:
        outs[i] = frontend_nm_static(band_window(i), i * band_h, band_h,
                                     H, W, kernel_vals,
                                     thresholds=thresholds)
    if thresholds is not None:
        return (jnp.concatenate([o[0] for o in outs], axis=0)[:H],
                jnp.concatenate([o[1] for o in outs], axis=0)[:H])
    return jnp.concatenate(outs, axis=0)[:H]
