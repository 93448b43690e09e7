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

from ..ops.window import frontend_nm_strips, window_nm, window_nm_interior
from ..utils.constants import frontend_vmem_budget, kernel_vmem_limit

_NMS_OOB = -32768


def _cdiv(a, b):
    return -(-a // b)


def _round_up(a, b):
    return _cdiv(a, b) * b


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
    i = pl.program_id(0)
    j = pl.program_id(1)
    # Mosaic has no direct uint8->f32 cast; go through int32
    x = img_ref[0, 0].astype(jnp.int32).astype(jnp.float32)
    nm = window_nm(x, i * th - r, j * tw - r, H, W, kernel_vals, th, tw, r)
    nm_ref[0, 0] = nm.astype(jnp.int16)


def _auto_tile_h(H: int, W: int, r: int) -> int:
    """Largest 8-aligned tile height whose working set fits scoped VMEM.

    Fewer grid invocations measured strictly faster for this kernel
    (0.266 ms at th=272 vs 0.207 at th=1080 for 1080p on v5e — the
    unrolled tap chain's VMEM temporaries defeat double-buffering gains
    anyway), so use one invocation when the whole image fits, else the
    fewest balanced tiles that keep the f32 window times the ~11 live
    temporaries under the ~110 MB scoped-VMEM budget.
    """
    rc = _round_up(r, 64)
    # device-keyed scoped-VMEM budget (utils/constants.py); 1080p
    # whole-image (9 MB window) compiles within it on every known chip
    budget = frontend_vmem_budget()
    th_max = budget // (11 * 4 * (W + 2 * rc)) - 2 * _round_up(r, 8)
    th_max = max(8, (th_max // 8) * 8)
    H8 = _round_up(H, 8)
    if th_max >= H8:
        return H8          # one invocation, zero padded-row waste
    # Tiled mode: Mosaic's scoped-vmem accounting measures up to ~1.21x
    # the 11-temporary model at wide tiles (4K th=544 predicts 93 MiB,
    # Mosaic reports 112.7 MiB), so size tiles with a 14-temporary model
    # to stay under kernel_vmem_limit with margin.  Whole-image shapes up
    # to 1080p are empirically validated against the 11-temp model above.
    th_max = budget // (14 * 4 * (W + 2 * rc)) - 2 * _round_up(r, 8)
    th_max = max(8, (th_max // 8) * 8)
    nty = _cdiv(H8, th_max)
    return _round_up(_cdiv(H8, nty), 8)  # balanced tile heights


def frontend_nm(img, kernel_vals, *, tile=None, interpret=None,
                indexing: str = "element", border: str = "strips"):
    """uint8 (H, W) -> int16 NMS magnitude (H, W), fused in one Pallas pass.

    Bit-exact vs ops.stages blur+sobel+nms composition.

    ``indexing``:
      * "element" (default) — overlapping halo windows are read straight
        from one zero-padded copy of the image via ``pl.Element`` block
        dims, and the output is written in natural (H, W) layout: no tile
        restack on the input and no transpose/relayout pass on the output.
      * "restack" — round-1 formulation: the input is restacked in XLA into
        (nty, ntx, TH+2R, TW+2R) non-overlapping halo tiles and the tiled
        output is re-assembled with a transpose.  Kept as a fallback while
        Element-indexed BlockSpecs are newer API surface.

    ``border``: "strips" (default — exact masked border overwrite, the
    production setting) or "none" (interior math only; the r-wide border
    frame is NOT bit-exact).  "none" exists for perf attribution in
    benchmarks/profile_components.py — never use it for real outputs.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    H, W = img.shape
    window = len(kernel_vals)
    c = window // 2
    r = c + 2
    if tile is None:
        tile = (_auto_tile_h(H, W, r), W)
    th = min(tile[0], max(8, H))
    tw = min(tile[1], max(128, W))
    nty, ntx = _cdiv(H, th), _cdiv(W, tw)

    vmem_params = pltpu.CompilerParams(vmem_limit_bytes=kernel_vmem_limit())

    if indexing == "element":
        # Mosaic requires Element windows with (8, 128)-divisible shapes, so
        # the halo is rounded up to the alignment grid (rr rows, rc cols >= r)
        # and tap slices fold the (rr-r, rc-r) offset into their indices.
        # Window starts land on (i*th, j*tw) — always aligned.
        #
        # The kernel body is the maskless interior math; the r-wide border
        # frame (the only region where masks matter — dependency-cone
        # radius is exactly r) is overwritten afterwards with the exact
        # masked strips in XLA (ops.window.frontend_nm_strips).
        th = _round_up(th, 8)
        tw = _round_up(tw, 128)
        nty, ntx = _cdiv(H, th), _cdiv(W, tw)
        rr = _round_up(r, 8)
        rc = _round_up(r, 64)   # 2*rc must divide 128
        padded = jnp.pad(img, ((rr, nty * th - H + rr),
                               (rc, ntx * tw - W + rc)))

        def kern(img_ref, nm_ref):
            xf = img_ref[...].astype(jnp.int32).astype(jnp.float32)
            nm = window_nm_interior(xf, kernel_vals, th, tw, r,
                                    row_off=rr - r, col_off=rc - r)
            nm_ref[...] = nm.astype(jnp.int16)

        out = pl.pallas_call(
            kern,
            grid=(nty, ntx),
            in_specs=[pl.BlockSpec(
                (pl.Element(th + 2 * rr), pl.Element(tw + 2 * rc)),
                lambda i, j: (i * th, j * tw),
                memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((th, tw), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nty * th, ntx * tw), jnp.int16),
            interpret=interpret,
            compiler_params=vmem_params,
        )(padded)
        nm = out[:H, :W]
        if border == "none":
            return nm
        return frontend_nm_strips(nm, img, kernel_vals, r)

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
        # the unrolled tap chain keeps several f32 window temporaries live;
        # large tiles (fewer => less halo-overlap waste) need more scoped
        # VMEM than the 16 MB default
        compiler_params=vmem_params,
    )(tiles)
    full = out.transpose(0, 2, 1, 3).reshape(nty * th, ntx * tw)
    return full[:H, :W]
