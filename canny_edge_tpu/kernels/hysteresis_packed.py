"""Pallas bit-packed hysteresis: the whole image's masks resident in VMEM.

The XLA formulation of the packed flood (ops.packed) re-materializes the
edge mask in HBM every while_loop iteration.  At 32 pixels per uint32 word
the packed masks are tiny — 260 KB at 1080p, 1 MB at 4K — so this kernel
keeps weak + edges entirely in VMEM and runs the complete fixed point
(rounds of K dilations + horizontal/vertical segmented or-scan floods,
ops/packed.py) inside one ``pallas_call``: zero HBM traffic between rounds,
one read of the packed masks and one write of the packed result in total.

**Layout**: the kernel computes in the *transposed* packed layout
(Wd, H) — word axis on sublanes, image rows on lanes.  In the natural
(H, Wd) layout the lane dimension is ceil(W/32) words: 60 at 1080p, i.e.
less than half of each (8, 128) VPU tile carries data, so every bit op
wastes >50% of the machine.  Transposing fills the tiles (~88%
utilization at 1080p) and measured 1.84x at 1080p / 1.16x at 4K on v5e
(benchmarks/exp_flood_t.py), bit-identical results.  The public entry
points keep the natural (H, Wd) mask interface — the two tiny transposes
(0.26 MB at 1080p) run in XLA around the kernel and are included in those
measured wins.

This is the TPU-native endpoint of the reference's hysteresis story: the
serial CPU BFS (src/utils.cpp:360-427, kept on the CPU even by the CUDA
path at src/cuda.cu:436) becomes a VMEM-resident bit-parallel flood.

Equivalence to the BFS result set: see ops/packed.py — identical operators,
identical fixed-point argument.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.packed import (cdiv, dilate_packed, hflood, pack_mask,
                          unpack_mask, vflood)
from ..utils.constants import (FLOOD_LIVE_WORD_ARRAYS, INNER_DILATE_VMEM,
                               INNER_DILATE_XLA, kernel_vmem_limit)


def _any_nonzero(d):
    """Nonzero test for a uint32 array without i1 vector reductions.

    (d >> 1) | (d & 1) maps any nonzero word to a nonzero value with the
    top bit clear, so an int32 max reduction is sign-safe."""
    nz = (d >> jnp.uint32(1)) | (d & jnp.uint32(1))
    return jnp.max(nz.astype(jnp.int32)) > 0


# ---------------------------------------------------------------------------
# transposed-layout shift helpers: array is (Wd, H) uint32, bit = column
# (word axis on sublanes, image rows on lanes — see module docstring)
# ---------------------------------------------------------------------------

_U1 = np.uint32(1)
_U31 = np.uint32(31)


def _wl_t(e):
    """Word from the next-lower column block (sublane shift, zero fill)."""
    return jnp.concatenate([jnp.zeros_like(e[:1, :]), e[:-1, :]], axis=0)


def _wr_t(e):
    return jnp.concatenate([e[1:, :], jnp.zeros_like(e[:1, :])], axis=0)


def _shl1_t(e):
    """Shift the image one column toward higher column index."""
    return (e << _U1) | (_wl_t(e) >> _U31)


def _shr1_t(e):
    return (e >> _U1) | (_wr_t(e) << _U31)


def _row_up_t(e):
    """Image row r+1 -> r (lane shift)."""
    return jnp.concatenate([e[:, 1:], jnp.zeros_like(e[:, :1])], axis=1)


def _row_dn_t(e):
    return jnp.concatenate([jnp.zeros_like(e[:, :1]), e[:, :-1]], axis=1)


def _dilate_t(e, weak):
    """One 8-connected dilation step masked by weak (separable OR)."""
    h = e | _shl1_t(e) | _shr1_t(e)
    return weak & (h | _row_up_t(h) | _row_dn_t(h))


_U2 = np.uint32(2)


def _strict_fix_t(new, prev, weak, word0: int = 0, row0: int = 0):
    """Strict-reference correction in the transposed (Wd, H) layout.

    Re-derives global pixel (0, 1) — bit 1 of word ``word0`` at lane
    ``row0`` — from its allowed promotion sources (0,0), (0,2), (1,1),
    (1,2) after a dilation (the packed analog of
    ops.stages._strict_reference_fix; see ops.packed.strict_fix_packed
    for the natural-layout version and the flood-safety argument).

    Mosaic constraints shape the formulation: no dynamic_update_slice
    lowering and no two-axis (1,1)->(M,N) vector broadcast, so the fix
    computes a full (1, H) strip of word ``word0`` (strip ops + a lane
    iota select), then merges it with a sublane-only broadcast.
    """
    pw = prev[word0:word0 + 1, :]                     # (1, H) word strip
    pw_up = jnp.concatenate([pw[:, 1:], jnp.zeros_like(pw[:, :1])], axis=1)
    allowed = ((pw & _U1) | ((pw >> _U2) & _U1)
               | ((pw_up >> _U1) & _U1) | ((pw_up >> _U2) & _U1))
    ww = weak[word0:word0 + 1, :]
    val = ((pw >> _U1) & _U1) | (((ww >> _U1) & _U1) & allowed)
    nw = new[word0:word0 + 1, :]
    corrected = (nw & ~_U2) | (val << _U1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, nw.shape, 1)
    strip = jnp.where(lanes == row0, corrected, nw)   # only lane row0 fixed
    words = jax.lax.broadcasted_iota(jnp.int32, new.shape, 0)
    return jnp.where(words == word0,
                     jnp.broadcast_to(strip, new.shape), new)


def _hflood_t(e, weak, width: int):
    """Flood edges along entire horizontal weak runs (both directions)."""
    al, bl = e, weak
    ar, br = e, weak
    s = 1
    while s < min(32, width):
        ss, cs = np.uint32(s), np.uint32(32 - s)
        al = al | (bl & ((al << ss) | (_wl_t(al) >> cs)))
        bl = bl & ((bl << ss) | (_wl_t(bl) >> cs))
        ar = ar | (br & ((ar >> ss) | (_wr_t(ar) << cs)))
        br = br & ((br >> ss) | (_wr_t(br) << cs))
        s *= 2
    wd = e.shape[0]
    k = 1
    while k < wd:
        zl = jnp.zeros_like(al[:k, :])

        def wlk(v):
            return jnp.concatenate([zl, v[:-k, :]], axis=0)

        def wrk(v):
            return jnp.concatenate([v[k:, :], zl], axis=0)
        al = al | (bl & wlk(al))
        bl = bl & wlk(bl)
        ar = ar | (br & wrk(ar))
        br = br & wrk(br)
        k *= 2
    return e | (weak & (al | ar))


def _vflood_t(e, weak, height: int):
    """Flood edges along entire vertical weak runs (both directions)."""
    au, bu = e, weak
    ad, bd = e, weak
    k = 1
    while k < height:
        zk = jnp.zeros_like(au[:, :k])

        def su(v):
            return jnp.concatenate([v[:, k:], zk], axis=1)

        def sd(v):
            return jnp.concatenate([zk, v[:, :-k]], axis=1)
        au = au | (bu & su(au))
        bu = bu & su(bu)
        ad = ad | (bd & sd(ad))
        bd = bd & sd(bd)
        k *= 2
    return e | (weak & (au | ad))


def _hyst_packed_kernel_t(weak_ref, strong_ref, out_ref, *, height, width,
                          inner_dilate, strict=False, quirk_rw=(0, 0)):
    w = weak_ref[:]

    def dil(e):
        d = _dilate_t(e, w)
        if strict:
            d = _strict_fix_t(d, e, w, quirk_rw[1], quirk_rw[0])
        return d

    def rest_of_round(e):
        e = jax.lax.fori_loop(0, inner_dilate - 1,
                              lambda i, x: dil(x), e)
        e = _hflood_t(e, w, width)
        e = _vflood_t(e, w, height)
        return e

    def body(state):
        e, _ = state
        # One dilation is the exact fixed-point test: dilate(e) == e means
        # no 8-neighbour expansion is possible, and floods only add pixels
        # a dilation would also add.  So the final (verification) round
        # costs one dilation + compare instead of a full round, and
        # non-final rounds lose nothing — the dilation is the round's
        # first step either way.  (In strict mode the test dilation must
        # carry the quirk fix too, else a strict fixed point would report
        # "changed" forever through the forbidden promotion.)
        d1 = dil(e)
        changed = _any_nonzero(d1 ^ e)
        new = jax.lax.cond(changed, rest_of_round, lambda x: x, d1)
        return new, changed

    # the round body is instantiated once, inside the loop (initial flag
    # True runs round 1 there) — the Mosaic program is half the size of the
    # peeled-first-round formulation, which this target compiles slowly
    edges, _ = jax.lax.while_loop(lambda s: s[1], body,
                                  (strong_ref[:], jnp.asarray(True)))
    out_ref[:] = edges


# natural-layout kernel, kept for A/B comparison (benchmarks/exp_flood_t.py)
def _hyst_packed_kernel(weak_ref, strong_ref, out_ref, *, height, width,
                        inner_dilate, strict=False, quirk_rw=(0, 0)):
    from ..ops.packed import strict_fix_packed

    w = weak_ref[:]

    def dil(e):
        d = dilate_packed(e, w)
        if strict:
            d = strict_fix_packed(d, e, w, *quirk_rw)
        return d

    def rest_of_round(e):
        e = jax.lax.fori_loop(0, inner_dilate - 1,
                              lambda i, x: dil(x), e)
        e = hflood(e, w, width)
        e = vflood(e, w, height)
        return e

    def body(state):
        e, _ = state
        d1 = dil(e)
        changed = _any_nonzero(d1 ^ e)
        new = jax.lax.cond(changed, rest_of_round, lambda x: x, d1)
        return new, changed

    edges, _ = jax.lax.while_loop(lambda s: s[1], body,
                                  (strong_ref[:], jnp.asarray(True)))
    out_ref[:] = edges


def flood_fits_vmem(height: int, width: int,
                    vmem_budget: int | None = None) -> bool:
    """Capacity guard: can the whole-image packed flood run VMEM-resident?

    The kernel keeps up to FLOOD_LIVE_WORD_ARRAYS (Wd, H) uint32 arrays
    live at once (while_loop state + or-scan doubling chains); past the
    budget Mosaic fails to allocate, so callers must dispatch to the
    HBM-streaming XLA flood instead (utils/constants.py for calibration).
    """
    if vmem_budget is None:
        vmem_budget = kernel_vmem_limit()
    arr_bytes = cdiv(width, 32) * height * 4
    return FLOOD_LIVE_WORD_ARRAYS * arr_bytes <= vmem_budget


def hysteresis_packed_pallas_masks(weak_p, strong_p, height: int, width: int,
                                   *, inner_dilate: int = INNER_DILATE_VMEM,
                                   interpret=None, layout: str = "transposed",
                                   vmem_budget: int | None = None,
                                   strict: bool = False, quirk_rw=(0, 0)):
    """Packed (H, Wd) uint32 masks -> packed edge mask, one VMEM kernel.

    ``layout``: "transposed" (default — compute in (Wd, H), see module
    docstring) or "rows" (natural (H, Wd) layout, kept for A/B).  Both
    produce bit-identical (H, Wd) results.

    Shapes whose flood working set exceeds the VMEM budget (8K frames and
    beyond — see :func:`flood_fits_vmem`) automatically fall back to the
    XLA packed flood (ops.packed), which streams the masks through HBM:
    same fixed point, same result, no compile-time cliff.  Degenerate
    shapes (a single packed word column or a single row) take the same
    fallback: their word/row shift helpers produce zero-size slices,
    which Mosaic cannot lower ("Invalid type" on slice, observed on v5e
    at H=1 or W<=32), and a kernel launch would cost more than the XLA
    flood on such sizes anyway.
    """
    strict = strict and height >= 2 and width >= 2
    if (not flood_fits_vmem(height, width, vmem_budget)
            or height < 2 or cdiv(width, 32) < 2):
        from ..ops.packed import hysteresis_packed_masks

        edges, _ = hysteresis_packed_masks(weak_p, strong_p, height, width,
                                           inner_dilate=INNER_DILATE_XLA,
                                           strict=strict, quirk_rw=quirk_rw)
        return edges
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    vmem = pltpu.CompilerParams(vmem_limit_bytes=kernel_vmem_limit())
    if layout == "transposed":
        kern = functools.partial(_hyst_packed_kernel_t, height=height,
                                 width=width, inner_dilate=inner_dilate,
                                 strict=strict, quirk_rw=quirk_rw)
        weak_t = jnp.swapaxes(weak_p, -2, -1)
        strong_t = jnp.swapaxes(strong_p, -2, -1)
        out_t = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(weak_t.shape, jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
            compiler_params=vmem,
        )(weak_t, strong_t)
        return jnp.swapaxes(out_t, -2, -1)
    kern = functools.partial(_hyst_packed_kernel, height=height, width=width,
                             inner_dilate=inner_dilate, strict=strict,
                             quirk_rw=quirk_rw)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(weak_p.shape, jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
        # the flood's doubling temporaries keep ~tens of (H, W/32) words
        # live at once; the packed masks are tiny (260 KB at 1080p) but the
        # default 16 MB scoped-vmem budget still needs raising at 4K
        compiler_params=vmem,
    )(weak_p, strong_p)


def hysteresis_packed_pallas(nm, min_val, max_val, *,
                             inner_dilate: int = INNER_DILATE_VMEM,
                             interpret=None, strict: bool = False):
    """int NMS magnitude (H, W) -> int16 {0,255} via the VMEM flood kernel.

    Thresholding/packing/unpacking run in XLA (they fuse with neighboring
    stages); the fixed point runs in one Pallas call.
    """
    h, w = nm.shape[-2], nm.shape[-1]
    weak_p = pack_mask(nm >= min_val)
    strong_p = pack_mask(nm >= max_val)
    if nm.ndim == 3:
        f = functools.partial(hysteresis_packed_pallas_masks, height=h,
                              width=w, inner_dilate=inner_dilate,
                              interpret=interpret, strict=strict)
        edges = jax.vmap(f)(weak_p, strong_p)
    else:
        edges = hysteresis_packed_pallas_masks(
            weak_p, strong_p, h, w, inner_dilate=inner_dilate,
            interpret=interpret, strict=strict)
    return jnp.where(unpack_mask(edges, w), jnp.int16(255), jnp.int16(0))
