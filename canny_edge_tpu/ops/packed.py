"""Bit-packed (32 pixels / uint32 lane) hysteresis flood.

The hysteresis fixed point (ops.stages.hysteresis) operates on boolean
masks: edges_{k+1} = weak & dilate8(edges_k).  Storing one pixel per lane
wastes 31/32 of every VPU lane on a 1-bit value; packing 32 horizontally
adjacent pixels into each uint32 turns every mask op into 32-pixel-parallel
bit arithmetic — measured ~6x faster per dilation step on TPU v5e (3.1 us vs
18.9 us per step at 1080p).

On top of the cheap dilation this module adds *segmented or-scan floods*:
log2-doubling propagation of edges along entire horizontal / vertical weak
runs in one O(log n)-step pass (15.6 us per full H+V round at 1080p), so
long straight contours converge in a few rounds instead of one dilation step
per pixel of contour length.

Equivalence: dilation and floods are monotone operators bounded by the weak
mask, and every pixel they add is 8-connected to an existing edge pixel
through weak pixels — so the fixed point is exactly the BFS result set
(connected components of weak pixels containing a strong pixel,
src/utils.cpp:322-427).  Termination at a round that changes nothing implies
in particular that one dilation step changes nothing, which is the exact
fixed-point condition of the unpacked formulation.

Layout: (H, ceil(W/32)) uint32, bit b of word j = column j*32 + b (LSB =
lowest column).  Width padding bits carry weak=0 so they never join an edge.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.constants import INNER_DILATE_XLA

_U1 = np.uint32(1)
_U31 = np.uint32(31)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# pack / unpack
# ---------------------------------------------------------------------------

def pack_mask(mask):
    """bool (..., H, W) -> uint32 (..., H, ceil(W/32)); pad bits are 0."""
    w = mask.shape[-1]
    wd = cdiv(w, 32)
    if wd * 32 != w:
        pad = [(0, 0)] * (mask.ndim - 1) + [(0, wd * 32 - w)]
        mask = jnp.pad(mask, pad)
    groups = mask.reshape(*mask.shape[:-1], wd, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(groups << shifts, axis=-1, dtype=jnp.uint32)


def unpack_mask(packed, w: int):
    """uint32 (..., H, Wd) -> bool (..., H, w)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[..., None] >> shifts) & _U1
    flat = bits.reshape(*packed.shape[:-1], packed.shape[-1] * 32)
    return flat[..., :w] != 0


def unpack_edges_np(packed: np.ndarray, w: int) -> np.ndarray:
    """Host-side unpack: uint32 (..., H, Wd) -> int16 {0,255} (..., H, w).

    The packed-output pipeline (models.canny.CannyTPU.packed /
    batch_packed) returns 0.031 B/px bitmasks — 16x less device->host
    transfer than the int16 edge map, which matters wherever the host
    link, not the chip, bounds streaming throughput.  This expands them
    to the reference's {0, 255} int16 frame on the host.
    """
    packed = np.asarray(packed, np.uint32)
    shifts = np.arange(32, dtype=np.uint32)
    bits = (packed[..., None] >> shifts) & np.uint32(1)
    flat = bits.reshape(*packed.shape[:-1], packed.shape[-1] * 32)
    return np.where(flat[..., :w] != 0, np.int16(255), np.int16(0))


# ---------------------------------------------------------------------------
# packed shifts (image-coordinate shifts over the bit-packed layout)
# ---------------------------------------------------------------------------

def _word_left(e):
    """Word from the next-lower column block (zero fill)."""
    return jnp.concatenate([jnp.zeros_like(e[..., :, :1]), e[..., :, :-1]],
                           axis=-1)


def _word_right(e):
    return jnp.concatenate([e[..., :, 1:], jnp.zeros_like(e[..., :, :1])],
                           axis=-1)


def shl1(e):
    """Shift the image one column toward higher column index."""
    return (e << _U1) | (_word_left(e) >> _U31)


def shr1(e):
    return (e >> _U1) | (_word_right(e) << _U31)


def _row_up(e):
    return jnp.concatenate([e[..., 1:, :], jnp.zeros_like(e[..., :1, :])],
                           axis=-2)


def _row_dn(e):
    return jnp.concatenate([jnp.zeros_like(e[..., :1, :]), e[..., :-1, :]],
                           axis=-2)


def dilate_packed(e, weak):
    """One 8-connected dilation step masked by weak (separable OR)."""
    h = e | shl1(e) | shr1(e)
    return weak & (h | _row_up(h) | _row_dn(h))


def strict_fix_packed(new, prev, weak, row0: int = 0, word0: int = 0):
    """Strict-reference correction on packed (H, Wd) masks.

    Re-derives global pixel (0, 1) — the target of the reference BFS's
    missing directed edge (1,0)->(0,1), src/utils.cpp:378,399 — from its
    *allowed* promotion sources (0,0), (0,2), (1,1), (1,2) after a
    dilation step.  The segmented or-scan floods never travel diagonally,
    so entries into (0,1) along runs always come through allowed sources
    and only the dilation needs this fix (ops.stages._strict_reference_fix
    is the unpacked analog).  The convergence-test dilation must use it
    too, else a strict fixed point reports "changed" forever.

    ``row0``/``word0``: packed coordinates of global row 0 / word 0 inside
    ``new`` (nonzero for the distributed flood's halo-extended arrays).
    Width-padding bits are zero in ``weak``/``prev``, so W == 2 needs no
    special case; W < 2 has no pixel (0,1) and callers skip the fix.

    This also runs inside the natural-layout Pallas flood kernel, where
    Mosaic has neither dynamic_update_slice nor a two-axis (1,1)->(M,N)
    vector broadcast — so the fix computes a full (1, Wd) strip of row
    ``row0`` (strip ops + a lane iota select), then merges it with a
    sublane-only broadcast.
    """
    u2 = np.uint32(2)
    p0 = prev[..., row0:row0 + 1, :]                  # (..., 1, Wd) strips
    p1 = prev[..., row0 + 1:row0 + 2, :]
    allowed = ((p0 & _U1) | ((p0 >> u2) & _U1)
               | ((p1 >> _U1) & _U1) | ((p1 >> u2) & _U1))
    w0 = weak[..., row0:row0 + 1, :]
    val = ((p0 >> _U1) & _U1) | (((w0 >> _U1) & _U1) & allowed)
    n0 = new[..., row0:row0 + 1, :]
    corrected = (n0 & ~u2) | (val << _U1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, n0.shape[-2:], 1)
    strip = jnp.where(lanes == word0, corrected, n0)  # only word0 fixed
    rows = jax.lax.broadcasted_iota(jnp.int32, new.shape[-2:], 0)
    return jnp.where(rows == row0,
                     jnp.broadcast_to(strip, new.shape), new)


# ---------------------------------------------------------------------------
# segmented or-scan floods (log-doubling transfer-function composition)
# ---------------------------------------------------------------------------
# Per pixel the one-step transfer is t(x) = a | (b & x) with a = "edge here",
# b = "weak here"; composition over a span doubles as
#   A' = A | (B & shift_s(A)),  B' = B & shift_s(B).

def hflood(e, weak, width: int):
    """Flood edges along entire horizontal weak runs (both directions)."""
    al, bl = e, weak    # propagate toward higher columns
    ar, br = e, weak    # toward lower columns
    s = 1
    while s < min(32, width):
        ss, cs = np.uint32(s), np.uint32(32 - s)
        al = al | (bl & ((al << ss) | (_word_left(al) >> cs)))
        bl = bl & ((bl << ss) | (_word_left(bl) >> cs))
        ar = ar | (br & ((ar >> ss) | (_word_right(ar) << cs)))
        br = br & ((br >> ss) | (_word_right(br) << cs))
        s *= 2
    wd = e.shape[-1]
    k = 1
    while k < wd:
        zl = jnp.zeros_like(al[..., :, :k])

        def wl(v):
            return jnp.concatenate([zl, v[..., :, :-k]], axis=-1)

        def wr(v):
            return jnp.concatenate([v[..., :, k:], zl], axis=-1)
        al = al | (bl & wl(al))
        bl = bl & wl(bl)
        ar = ar | (br & wr(ar))
        br = br & wr(br)
        k *= 2
    return e | (weak & (al | ar))


def vflood(e, weak, height: int):
    """Flood edges along entire vertical weak runs (both directions)."""
    au, bu = e, weak
    ad, bd = e, weak
    k = 1
    while k < height:
        zk = jnp.zeros_like(au[..., :k, :])

        def su(v):
            return jnp.concatenate([v[..., k:, :], zk], axis=-2)

        def sd(v):
            return jnp.concatenate([zk, v[..., :-k, :]], axis=-2)
        au = au | (bu & su(au))
        bu = bu & su(bu)
        ad = ad | (bd & sd(ad))
        bd = bd & sd(bd)
        k *= 2
    return e | (weak & (au | ad))


# ---------------------------------------------------------------------------
# hysteresis
# ---------------------------------------------------------------------------

def hysteresis_packed_masks(weak_p, strong_p, height: int, width: int,
                            inner_dilate: int = INNER_DILATE_XLA,
                            strict: bool = False, quirk_rw=(0, 0)):
    """Packed weak/strong masks -> packed edge mask + rounds-run stat.

    The round body is instantiated exactly once (inside the while_loop,
    whose initial "changed" flag is True so the first round runs there
    too) and the inner dilations run under a fori_loop — both choices
    halve-ish the compiled program size, which matters on this target's
    slow kernel-compile path.

    ``strict``: apply the strict-reference directed-edge exclusion to
    every dilation (see :func:`strict_fix_packed`); ``quirk_rw`` locates
    global (row 0, word 0) inside the arrays (halo-extended shards).
    """
    strict = strict and height >= 2 and width >= 2

    def dil(x):
        d = dilate_packed(x, weak_p)
        if strict:
            d = strict_fix_packed(d, x, weak_p, *quirk_rw)
        return d

    def one_round(e):
        e = jax.lax.fori_loop(0, inner_dilate, lambda i, x: dil(x), e)
        e = hflood(e, weak_p, width)
        e = vflood(e, weak_p, height)
        return e

    def body(state):
        e, _, rounds = state
        new = one_round(e)
        changed = jnp.any(new != e)
        return new, changed, rounds + 1

    # NOTE: the Pallas VMEM kernel uses a cheaper convergence test (one
    # dilation + lax.cond, kernels/hysteresis_packed.py); in XLA the cond
    # overhead costs more than the saved round (0.343 vs 0.287 ms for the
    # 1080p pipeline measured on v5e), so the plain full-round test stays.
    edges, _, rounds = jax.lax.while_loop(
        lambda s: s[1], body, (strong_p, jnp.asarray(True), jnp.int32(0)))
    return edges, rounds


def hysteresis_packed(nm, min_val, max_val,
                      inner_dilate: int = INNER_DILATE_XLA,
                      strict: bool = False):
    """int NMS magnitude (H, W) -> int16 {0,255}; bit-packed fixed point.

    Drop-in equivalent of ops.stages.hysteresis (identical result set; see
    module docstring for the equivalence argument), ~3-6x faster on TPU.
    ``strict``: strict-reference mode (the BFS bounds quirk, see
    :func:`strict_fix_packed`).
    """
    out, _ = hysteresis_packed_with_stats(nm, min_val, max_val, inner_dilate,
                                          strict=strict)
    return out


def hysteresis_packed_with_stats(nm, min_val, max_val,
                                 inner_dilate: int = INNER_DILATE_XLA,
                                 strict: bool = False):
    h, w = nm.shape[-2], nm.shape[-1]
    weak_p = pack_mask(nm >= min_val)
    strong_p = pack_mask(nm >= max_val)
    edges, rounds = hysteresis_packed_masks(weak_p, strong_p, h, w,
                                            inner_dilate, strict=strict)
    out = jnp.where(unpack_mask(edges, w), jnp.int16(255), jnp.int16(0))
    return out, rounds
