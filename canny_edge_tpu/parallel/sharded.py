"""Spatially partitioned Canny pipeline: shard_map over a ("data","y","x") mesh.

The image batch is sharded (B/Pd, H/Py, W/Px) per device.  Every stage runs
on the local block with ICI halo exchange supplying neighbor pixels, and the
reference's image-border semantics (renormalized blur taps, clamped/dropped
Sobel terms, never-suppressing NMS neighbors) applied only at the true image
border — so the sharded pipeline is bit-exact against the single-chip path
and the golden oracle for any mesh shape.

Two engine generations coexist:

* **static** (production, round 3) — the round-2 single-chip engines on the
  mesh.  Key observation: under SPMD a block's border behavior depends on
  its position only through *which image borders its dependency cone
  touches*, and every block of a given border class (top/mid/bottom ×
  left/mid/right) compiles to the **identical** program with **host-static**
  offsets — the mid classes because no border mask fires anywhere in them,
  the border classes because equal block sizes pin their offsets (0 or
  (n-1)·block).  The frontend therefore runs as a ``lax.switch`` over at
  most 9 statically specialized branches, each using the select-free static
  machinery of ops.window (host count vectors, near-one interior division
  split, trace-time-elided masks) — no per-pixel traced border selects
  anywhere.  Hysteresis is the bit-packed distributed flood: 32 px/word
  masks, one packed word-column + one packed row of 2-phase ``ppermute``
  halo per round, the whole local fixed point inside the VMEM Pallas flood
  kernel (or the XLA packed flood on CPU meshes), and a global ``psum`` of
  the changed-word count as the termination test.  At mesh 1×1×1 this
  degenerates to exactly the single-chip ``fused`` engines.
* **generic** (round 1, fallback) — traced-offset masked stages +
  int8-unpacked dilation hysteresis; still bit-exact, used automatically
  for degenerate block geometries where the static class analysis does not
  hold (see ``ShardedCanny._static_ok``).

This is the TPU-native replacement for a multi-GPU decomposition the
reference never had (it is single-GPU, single-frame; SURVEY.md §2.2).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..golden.reference import gaussian_kernel
from ..ops.numerics import (exact_div_by_vector, isqrt_int32, mul_const_f32,
                            quantize_angle_int)
from ..ops.packed import cdiv, pack_mask, unpack_mask
from ..utils.constants import INNER_DILATE_XLA
from .halo import halo_exchange_2d, halo_exchange_cols, halo_exchange_rows

EDGE = 255
NOEDGE = 0
_NMS_OOB = -32768

DATA_AXIS = "data"
Y_AXIS = "y"
X_AXIS = "x"


# ---------------------------------------------------------------------------
# mesh construction
# ---------------------------------------------------------------------------

def make_mesh(devices: Sequence[jax.Device] | None = None,
              data: int | None = None, y: int | None = None,
              x: int | None = None) -> Mesh:
    """Build a ("data", "y", "x") mesh over the given devices.

    With no explicit shape, factors the device count as evenly as possible
    into a 2-D spatial grid with no data parallelism (the 4K-single-image
    config); pass ``data=...`` for batch sharding.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None and y is None and x is None:
        data = 1
        y, x = _factor2(n)
    data = data or 1
    if y is None and x is None:
        y, x = _factor2(n // data)
    y = y or (n // (data * (x or 1)))
    x = x or (n // (data * y))
    if data * y * x != n:
        raise ValueError(f"mesh {data}x{y}x{x} != {n} devices")
    arr = np.asarray(devices).reshape(data, y, x)
    return Mesh(arr, (DATA_AXIS, Y_AXIS, X_AXIS))


def _factor2(n: int) -> tuple[int, int]:
    """Factor n into the most-square (y, x) pair."""
    best = (1, n)
    for y in range(1, int(np.sqrt(n)) + 1):
        if n % y == 0:
            best = (y, n // y)
    return best


# ---------------------------------------------------------------------------
# local (per-shard) stage implementations with global-coordinate masks
# ---------------------------------------------------------------------------

def _global_offsets(hl: int, wl: int):
    """(row0, col0) of this device's block in the global image."""
    iy = lax.axis_index(Y_AXIS)
    ix = lax.axis_index(X_AXIS)
    return iy * hl, ix * wl


def _blur_shard(img, kernel_vals, H: int, W: int):
    """Sharded renormalized separable blur; bit-exact vs golden."""
    kernel = np.asarray(kernel_vals, np.float32)
    window = kernel.shape[0]
    c = window // 2
    hl, wl = img.shape[-2], img.shape[-1]
    gr0, gc0 = _global_offsets(hl, wl)
    x = img.astype(jnp.float32)

    # x pass
    xp = halo_exchange_cols(x, c, X_AXIS)          # (..., hl, wl + 2c)
    gcol = gc0 + lax.broadcasted_iota(jnp.int32, (1, wl), 1)
    acc = jnp.zeros(x.shape, jnp.float32)
    cnt = jnp.zeros((1, wl), jnp.float32)
    for t in range(window):
        tap = xp[..., :, t:t + wl]
        m = ((gcol + (t - c)) >= 0) & ((gcol + (t - c)) < W)
        # beyond-global-border halo is zero-filled => tap*k adds +0.0 there,
        # identical to the reference's skipped out-of-bounds taps (no
        # accumulator mask needed)
        acc = acc + mul_const_f32(tap, kernel[t])
        cnt = cnt + jnp.where(m, jnp.float32(kernel[t]), jnp.float32(0.0))
    temp = exact_div_by_vector(acc, cnt)

    # y pass
    tp = halo_exchange_rows(temp, c, Y_AXIS)       # (..., hl + 2c, wl)
    grow = gr0 + lax.broadcasted_iota(jnp.int32, (hl, 1), 0)
    acc = jnp.zeros(x.shape, jnp.float32)
    cnt = jnp.zeros((hl, 1), jnp.float32)
    for t in range(window):
        tap = tp[..., t:t + hl, :]
        m = ((grow + (t - c)) >= 0) & ((grow + (t - c)) < H)
        acc = acc + mul_const_f32(tap, kernel[t])
        cnt = cnt + jnp.where(m, jnp.float32(kernel[t]), jnp.float32(0.0))
    out = exact_div_by_vector(acc, cnt)
    return out.astype(jnp.int16)


def _sobel_shard(img, H: int, W: int):
    """Sharded Sobel with reference border rules via coordinate masks."""
    hl, wl = img.shape[-2], img.shape[-1]
    gr0, gc0 = _global_offsets(hl, wl)
    x = img.astype(jnp.int32)
    xp = halo_exchange_2d(x, 1, Y_AXIS, X_AXIS)    # (..., hl+2, wl+2)

    gcol = gc0 + lax.broadcasted_iota(jnp.int32, (1, wl), 1)
    grow = gr0 + lax.broadcasted_iota(jnp.int32, (hl, 1), 0)

    # gx: column-clamped horizontal difference, row terms dropped off-image
    center_cols = xp[..., :, 1:-1]
    xleft = jnp.where(gcol - 1 >= 0, xp[..., :, :-2], center_cols)
    xright = jnp.where(gcol + 1 < W, xp[..., :, 2:], center_cols)
    d = xright - xleft                              # (..., hl+2, wl)
    gx = (2 * d[..., 1:-1, :]
          + jnp.where(grow + 1 < H, d[..., 2:, :], 0)
          + jnp.where(grow - 1 >= 0, d[..., :-2, :], 0))

    # gy: row-clamped vertical difference (below - above), col terms dropped
    center_rows = xp[..., 1:-1, :]
    xup = jnp.where(grow - 1 >= 0, xp[..., :-2, :], center_rows)
    xdn = jnp.where(grow + 1 < H, xp[..., 2:, :], center_rows)
    e = xdn - xup                                   # (..., hl, wl+2)
    gy = (2 * e[..., :, 1:-1]
          + jnp.where(gcol + 1 < W, e[..., :, 2:], 0)
          + jnp.where(gcol - 1 >= 0, e[..., :, :-2], 0))

    mag = isqrt_int32(gx * gx + gy * gy)
    ang = quantize_angle_int(gx, gy)
    return mag, ang


def _nms_shard(mag, ang, H: int, W: int):
    hl, wl = mag.shape[-2], mag.shape[-1]
    gr0, gc0 = _global_offsets(hl, wl)
    m = mag.astype(jnp.int32)
    mp = halo_exchange_2d(m, 1, Y_AXIS, X_AXIS)
    gcol = gc0 + lax.broadcasted_iota(jnp.int32, (1, wl), 1)
    grow = gr0 + lax.broadcasted_iota(jnp.int32, (hl, 1), 0)

    def nb(dr, dc):
        v = mp[..., 1 + dr:1 + dr + hl, 1 + dc:1 + dc + wl]
        inb = ((grow + dr >= 0) & (grow + dr < H)
               & (gcol + dc >= 0) & (gcol + dc < W))
        return jnp.where(inb, v, jnp.int32(_NMS_OOB))

    keep0 = (m > nb(0, -1)) & (m > nb(0, 1))
    keep45 = (m > nb(-1, 1)) & (m > nb(1, -1))
    keep90 = (m > nb(-1, 0)) & (m > nb(1, 0))
    keep135 = (m > nb(-1, -1)) & (m > nb(1, 1))
    keep = jnp.where(
        ang == 0, keep0,
        jnp.where(ang == 45, keep45, jnp.where(ang == 90, keep90, keep135)))
    return jnp.where(keep, m, NOEDGE)


def _hysteresis_shard(nm, min_val, max_val, H, W, steps_per_round: int = 8,
                      strict: bool = False):
    """Distributed fixed point: K-wide halo exchange + K local dilations per
    round, terminated by a global psum of the changed count.

    ``H``/``W`` are the *true* image dims: texels in the bottom/right padding
    introduced for non-divisible shapes are masked out of the weak set so
    padding can never bridge two real components (relevant when min_val=0,
    where every padding zero would otherwise count as weak).

    ``strict``: strict-reference mode — every dilation re-derives global
    pixel (0, 1) from its allowed promotion sources, excluding (1, 0) (the
    reference BFS bounds quirk, src/utils.cpp:378,399), on the one shard
    that holds it (top-left; extended coords (k, k+1)).  The fix's source
    reads (rows k..k+1, cols k..k+2) are shard-local and current at every
    inner iteration, and absent/padded sources are masked false by
    ``in_image``, so no global-dim special cases are needed."""
    k = steps_per_round
    hl, wl = nm.shape[-2], nm.shape[-1]
    gr0, gc0 = _global_offsets(hl, wl)
    grow = gr0 + lax.broadcasted_iota(jnp.int32, (hl, 1), 0)
    gcol = gc0 + lax.broadcasted_iota(jnp.int32, (1, wl), 1)
    in_image = (grow < H) & (gcol < W)
    weak = (nm >= min_val) & in_image
    strong = (nm >= max_val) & in_image
    # weak mask is loop-invariant: exchange its halo once
    wk = halo_exchange_2d(weak.astype(jnp.int8), k, Y_AXIS, X_AXIS) > 0
    if strict and (hl < 2 or wl < 3):
        # unreachable with the generic geometry (block dims >= the round
        # halo, default 8); guard so a future geometry change cannot read
        # stale halo texels in the fix below
        raise ValueError("strict sharded hysteresis needs blocks >= 2x3")
    is_quirk = ((lax.axis_index(Y_AXIS) == 0) & (lax.axis_index(X_AXIS) == 0))

    def round_fn(edges):
        e = halo_exchange_2d(edges.astype(jnp.int8), k, Y_AXIS, X_AXIS) > 0
        for _ in range(k):
            grow = (e
                    | jnp.pad(e[..., :, 1:], _pad_last(e.ndim, (0, 1)))
                    | jnp.pad(e[..., :, :-1], _pad_last(e.ndim, (1, 0))))
            grow = (grow
                    | jnp.pad(grow[..., 1:, :], _pad_row(e.ndim, (0, 1)))
                    | jnp.pad(grow[..., :-1, :], _pad_row(e.ndim, (1, 0))))
            new = wk & grow
            if strict:
                allowed = (e[..., k, k] | e[..., k + 1, k + 1]
                           | e[..., k, k + 2] | e[..., k + 1, k + 2])
                val = e[..., k, k + 1] | (wk[..., k, k + 1] & allowed)
                new = new.at[..., k, k + 1].set(
                    jnp.where(is_quirk, val, new[..., k, k + 1]))
            e = new
        return e[..., k:-k, k:-k]

    def body(state):
        edges, _ = state
        new = round_fn(edges)
        changed_local = jnp.sum((new != edges).astype(jnp.int32))
        changed = lax.psum(changed_local,
                           (DATA_AXIS, Y_AXIS, X_AXIS)) > 0
        return new, changed

    edges, _ = lax.while_loop(lambda s: s[1], body,
                              (strong, jnp.asarray(True)))
    return jnp.where(edges, jnp.int16(EDGE), jnp.int16(NOEDGE))


def _pad_last(ndim, lohi):
    return [(0, 0)] * (ndim - 1) + [lohi]


def _pad_row(ndim, lohi):
    return [(0, 0)] * (ndim - 2) + [lohi, (0, 0)]


# ---------------------------------------------------------------------------
# static border-class engine (the round-2 single-chip engines on the mesh)
# ---------------------------------------------------------------------------

def _axis_classes(n: int, block: int) -> list[int]:
    """Static base offsets of the border classes along one mesh axis.

    n == 1: the single block touches both borders (base 0).
    n == 2: first (base 0) and last (base (n-1)*block) — no interior.
    n >= 3: plus one shared interior class represented by base == block.
    The interior representative is valid for *every* interior block because
    ShardedCanny._static_ok guarantees each interior block's dependency
    cone lies strictly inside the image: no border mask fires and every
    renormalization count vector equals the full kernel sum, so the
    compiled interior program is offset-independent.
    """
    if n == 1:
        return [0]
    if n == 2:
        return [0, block]
    return [0, block, (n - 1) * block]


def _class_index(axis_name: str, n: int):
    """Traced class id of this device along one axis (None when n == 1)."""
    if n == 1:
        return None
    i = lax.axis_index(axis_name)
    if n == 2:
        return jnp.where(i == 0, 0, 1).astype(jnp.int32)
    return jnp.where(i == 0, 0,
                     jnp.where(i == n - 1, 2, 1)).astype(jnp.int32)


def _frontend_shard_static(img, mn, mx, *, kernel_vals, H, W, hl, wl,
                           ny, nx):
    """(hl, wl) uint8 block -> bit-packed (weak, strong) uint32 (hl, wl//32).

    One 2-phase halo exchange of the raw uint8 block (r = c + 2 texels),
    then a ``lax.switch`` over the statically specialized select-free
    frontends for each border class (ops.window machinery: host count
    vectors, near-one interior division split, trace-time mask elision).
    Thresholding + 32-to-1 bit packing fuse into every branch, so the nm
    map never reaches HBM — the same fusion the single-chip fused backend
    uses (models/canny.py).  Branches contain no collectives, so per-device
    branch divergence is safe.
    """
    from ..ops.window import frontend_nm_static, window_nm

    kernel = np.asarray(kernel_vals, np.float32)
    c = kernel.shape[0] // 2
    r = c + 2
    wd = wl // 32
    xp = halo_exchange_2d(img, r, Y_AXIS, X_AXIS).astype(jnp.float32)

    def branch_fn(gr0: int, gc0: int):
        def branch(op):
            x, mn, mx = op
            if nx == 1:
                # The block spans the full image width: the row-banded
                # select-free program applies directly (its packing tail
                # emits ceil(W/32) words; pad to the block's word count).
                # Tall blocks split into row bands with static per-band
                # offsets — XLA:TPU per-pixel stencil cost grows sharply
                # with program height (ops/window.frontend_nm_xla uses the
                # identical 1440/720 policy: 4K whole-image 1.08 ms vs
                # banded 0.66 ms on v5e, benchmarks/exp_bands.py).
                nb = 1 if hl <= 1440 else cdiv(hl, 720)
                bh = -(-cdiv(hl, nb) // 8) * 8
                ws, ss = [], []
                for k in range(nb):
                    r0 = k * bh
                    nr = min(bh, hl - r0)
                    if nr <= 0:
                        break
                    wk, sk = frontend_nm_static(
                        x[r0:r0 + nr + 2 * r, :], gr0 + r0, nr, H, W,
                        kernel_vals, thresholds=(mn, mx))
                    ws.append(wk)
                    ss.append(sk)
                weak = jnp.concatenate(ws, axis=0) if len(ws) > 1 else ws[0]
                strong = jnp.concatenate(ss, axis=0) if len(ss) > 1 else ss[0]
                if weak.shape[0] < hl:  # nb*bh rounding shortfall
                    padr = ((0, hl - weak.shape[0]), (0, 0))
                    weak, strong = jnp.pad(weak, padr), jnp.pad(strong, padr)
                padw = wd - weak.shape[1]
                if padw:
                    weak = jnp.pad(weak, ((0, 0), (0, padw)))
                    strong = jnp.pad(strong, ((0, 0), (0, padw)))
                return weak, strong
            nm = window_nm(x, gr0 - r, gc0 - r, H, W, kernel_vals,
                           hl, wl, r)
            weak = nm >= mn
            strong = nm >= mx
            # zero the padding rows/cols beyond the true image — static
            # per class (min_val == 0 would otherwise mark padding weak
            # and bridge components across the pad, VERDICT r1)
            if gr0 + hl > H:
                rowm = lax.broadcasted_iota(jnp.int32, (hl, 1), 0) < H - gr0
                weak, strong = weak & rowm, strong & rowm
            if gc0 + wl > W:
                colm = lax.broadcasted_iota(jnp.int32, (1, wl), 1) < W - gc0
                weak, strong = weak & colm, strong & colm
            return pack_mask(weak), pack_mask(strong)
        return branch

    y_bases = _axis_classes(ny, hl)
    x_bases = _axis_classes(nx, wl)
    branches = [branch_fn(gr0, gc0) for gr0 in y_bases for gc0 in x_bases]
    op = (xp, mn, mx)
    if len(branches) == 1:
        return branches[0](op)
    cy = _class_index(Y_AXIS, ny)
    cx = _class_index(X_AXIS, nx)
    idx = jnp.int32(0)
    if cy is not None:
        idx = idx + cy * len(x_bases)
    if cx is not None:
        idx = idx + cx
    return lax.switch(idx, branches, op)


def _flood_distributed(weak_p, strong_p, hl: int, wl: int, engine: str,
                       ny: int = 0, nx: int = 0, strict: bool = False):
    """Distributed bit-packed hysteresis fixed point on (hl, wl//32) masks.

    Per round: a 2-phase ``ppermute`` halo of one packed word-column
    (32 px) + one packed word-row, then the complete LOCAL fixed point —
    inside the VMEM-resident Pallas flood kernel (engine="vmem") or the
    XLA packed flood (engine="xla") — then a global ``psum`` of the
    changed-word count as the termination test.  Round count equals the
    longest inter-device propagation chain; a converged verification round
    costs one early-exit dilation in the VMEM kernel.

    Correctness: halo bits are a consistent snapshot of true neighbor
    edge/weak state, so every bit the local flood adds is justified by a
    real 8-connected weak path from a seed (monotone flood); a globally
    unchanged round implies the one-step dilation fixed point everywhere,
    which is exactly the BFS result set (ops/packed.py equivalence).
    """
    if ny == 1 and nx == 1:
        # Degenerate spatial mesh (any data-axis size): each device holds
        # whole frames, so the LOCAL fixed point IS the global one — run
        # the single-chip flood engine once, with no halo extension, no
        # round loop, and no psum (VERDICT r3 weak #4: the round-3 loop
        # paid a full verification round + 2 psums at mesh 1x1x1).
        if engine == "vmem":
            from ..kernels.hysteresis_packed import (
                hysteresis_packed_pallas_masks)

            return hysteresis_packed_pallas_masks(weak_p, strong_p, hl, wl,
                                                  strict=strict)
        from ..ops.packed import hysteresis_packed_masks

        edges, _ = hysteresis_packed_masks(weak_p, strong_p, hl, wl,
                                           inner_dilate=INNER_DILATE_XLA,
                                           strict=strict)
        return edges
    wd = wl // 32
    ext_h, ext_w = hl + 2, (wd + 2) * 32
    # weak halo is loop-invariant: exchange once
    wk_ext = halo_exchange_2d(weak_p, 1, Y_AXIS, X_AXIS)

    if engine == "vmem":
        from ..kernels.hysteresis_packed import (
            hysteresis_packed_pallas_masks)

        def local_flood(e_ext, is_quirk_shard):
            # carries its own per-shard VMEM capacity guard.  In strict
            # mode the quirk's directed-edge exclusion applies only on the
            # shard holding global pixel (0, 1) — the top-left spatial
            # shard — at halo-extended coordinates (row 1, word 1); the
            # branches hold no collectives, so divergence is safe.
            def flood(s):
                def run(e):
                    return hysteresis_packed_pallas_masks(
                        wk_ext, e, ext_h, ext_w, strict=s, quirk_rw=(1, 1))
                return run
            if not strict:
                return flood(False)(e_ext)
            return lax.cond(is_quirk_shard, flood(True), flood(False),
                            e_ext)
    else:
        from ..ops.packed import hysteresis_packed_masks

        def local_flood(e_ext, is_quirk_shard):
            def flood(s):
                def run(e):
                    edges, _ = hysteresis_packed_masks(
                        wk_ext, e, ext_h, ext_w,
                        inner_dilate=INNER_DILATE_XLA, strict=s,
                        quirk_rw=(1, 1))
                    return edges
                return run
            if not strict:
                return flood(False)(e_ext)
            return lax.cond(is_quirk_shard, flood(True), flood(False),
                            e_ext)

    is_quirk_shard = ((lax.axis_index(Y_AXIS) == 0)
                      & (lax.axis_index(X_AXIS) == 0))

    def body(state):
        e, _ = state
        e_ext = halo_exchange_2d(e, 1, Y_AXIS, X_AXIS)
        new = local_flood(e_ext, is_quirk_shard)[1:-1, 1:-1]
        changed = lax.psum(jnp.sum((new != e).astype(jnp.int32)),
                           (DATA_AXIS, Y_AXIS, X_AXIS)) > 0
        return new, changed

    edges, _ = lax.while_loop(lambda s: s[1], body,
                              (strong_p, jnp.asarray(True)))
    return edges


def _canny_shard_static(img, min_val, max_val, *, kernel_vals, H, W,
                        hl, wl, ny, nx, flood_engine, strict=False):
    """Full static-engine pipeline on a (bl, hl, wl) local block."""

    def one(frame):
        weak_p, strong_p = _frontend_shard_static(
            frame, min_val, max_val, kernel_vals=kernel_vals, H=H, W=W,
            hl=hl, wl=wl, ny=ny, nx=nx)
        edges_p = _flood_distributed(weak_p, strong_p, hl, wl, flood_engine,
                                     ny=ny, nx=nx, strict=strict)
        return jnp.where(unpack_mask(edges_p, wl), jnp.int16(EDGE),
                         jnp.int16(NOEDGE))

    # sequential per-frame programs, matching the single-chip batching
    # choice (models/canny.canny_fn_batched); collectives inside the map
    # body are uniform across devices (same local batch size everywhere).
    # A single-frame local batch skips the map's dynamic-slice/update
    # wrappers around the full-size arrays entirely.
    if img.shape[0] == 1:
        return one(img[0])[None]
    return lax.map(one, img)


# ---------------------------------------------------------------------------
# the sharded pipeline
# ---------------------------------------------------------------------------

def _canny_shard(img, min_val, max_val, *, kernel_vals, H, W,
                 hysteresis_steps, strict=False):
    smoothed = _blur_shard(img, kernel_vals, H, W)
    mag, ang = _sobel_shard(smoothed, H, W)
    nm = _nms_shard(mag, ang, H, W)
    return _hysteresis_shard(nm, min_val, max_val, H, W, hysteresis_steps,
                             strict=strict)


class ShardedCanny:
    """Batch-of-frames Canny over a ("data", "y", "x") device mesh.

    Input: uint8 (B, H, W) with B % data == 0.  Arbitrary H, W: images whose
    dims do not divide the spatial mesh are zero-padded internally to the
    shard grid (SURVEY §7 hard part 5 — the reference GPU path silently
    *drops* non-divisible remainders, src/cuda.cu:121-122); the stage math
    applies the true-border semantics via global-coordinate masks, and the
    padding is sliced off the output, so results are bit-exact vs the
    single-chip path at every shape.  Output: int16 {0,255} (B, H, W).

    Example::

        mesh = make_mesh(y=2, x=4)          # 8 chips, 2x4 spatial grid
        model = ShardedCanny(mesh, sigma=1.4, image_shape=(2160, 3840))
        edges = model(batch_u8, 50, 150)
    """

    def __init__(self, mesh: Mesh, sigma: float, image_shape: tuple[int, int],
                 hysteresis_steps: int = 8, frontend: str = "auto",
                 flood: str = "auto", hysteresis_mode: str = "component"):
        if hysteresis_mode not in ("component", "strict-reference"):
            raise ValueError(f"unknown hysteresis mode: {hysteresis_mode!r}")
        strict = hysteresis_mode == "strict-reference"
        self.hysteresis_mode = hysteresis_mode
        self.mesh = mesh
        self.sigma = sigma
        self.kernel = gaussian_kernel(sigma)
        self.H, self.W = image_shape
        ny = mesh.shape[Y_AXIS]
        nx = mesh.shape[X_AXIS]
        c = len(self.kernel) // 2
        r = c + 2
        kernel_vals = tuple(float(v) for v in self.kernel)

        if frontend not in ("auto", "static", "generic"):
            raise ValueError(f"unknown frontend: {frontend}")
        if flood not in ("auto", "vmem", "xla", "generic"):
            raise ValueError(f"unknown flood engine: {flood}")

        hl = wl = None
        if frontend in ("auto", "static"):
            hl, wl = self._static_geometry(ny, nx, r)
            if hl is None and frontend == "static":
                raise ValueError(
                    f"static engine needs every interior block's dependency "
                    f"cone inside the image; {self.H}x{self.W} over "
                    f"{ny}x{nx} blocks violates it — use frontend='auto'")
        self.engine = "static" if hl is not None else "generic"

        if self.engine == "static":
            self.Hp, self.Wp = hl * ny, wl * nx
            if flood == "auto":
                platform = mesh.devices.flat[0].platform
                flood = "vmem" if platform == "tpu" else "xla"
            elif flood == "generic":
                flood = "xla"
            self.flood = flood
            fn = functools.partial(
                _canny_shard_static, kernel_vals=kernel_vals,
                H=self.H, W=self.W, hl=hl, wl=wl, ny=ny, nx=nx,
                flood_engine=flood, strict=strict)
        else:
            # round-1 generic geometry: per-shard dims ceil-divided, grown
            # to the widest halo any stage exchanges
            halo = max(c, hysteresis_steps, 1)
            hl = max(-(-self.H // ny), halo)
            wl = max(-(-self.W // nx), halo)
            self.Hp, self.Wp = hl * ny, wl * nx
            self.flood = "generic"
            fn = functools.partial(
                _canny_shard, kernel_vals=kernel_vals, H=self.H, W=self.W,
                hysteresis_steps=hysteresis_steps, strict=strict)
        spec = P(DATA_AXIS, Y_AXIS, X_AXIS)
        mapped = jax.shard_map(
            fn, mesh=mesh,
            in_specs=(spec, P(), P()),
            out_specs=spec,
            check_vma=False,
        )
        Hp, Wp, H, W = self.Hp, self.Wp, self.H, self.W
        sharding = NamedSharding(mesh, spec)

        def wrapped(imgs, min_val, max_val):
            # pad/slice live inside jit so the entry point works on global
            # (multi-process) arrays, where eager host-side ops would fail
            if imgs.shape[1:] != (Hp, Wp):
                imgs = jnp.pad(imgs, ((0, 0), (0, Hp - imgs.shape[1]),
                                      (0, Wp - imgs.shape[2])))
            imgs = jax.lax.with_sharding_constraint(imgs, sharding)
            return mapped(imgs, min_val, max_val)[:, :H, :W]

        self._fn = jax.jit(wrapped)
        self._in_sharding = sharding

    def _static_geometry(self, ny: int, nx: int, r: int):
        """Block dims (hl, wl) for the static border-class engine, or
        (None, None) when the class analysis doesn't hold.

        Requirements: blocks at least r wide/tall (halo exchange sources a
        full strip from each neighbor), block width a multiple of 32 (bit
        packing never straddles a shard boundary), and — when interior
        classes exist — every interior block's dependency cone strictly
        inside the image, so one compiled interior program serves them all
        (see _axis_classes).  Tries 8-row-aligned blocks first (VPU sublane
        granularity), then exact ceil-division before giving up.
        """
        def up(a, m):
            return -(-a // m) * m

        for align_h in (8, 1):
            hl = up(max(cdiv(self.H, ny), r), align_h)
            wl = up(max(cdiv(self.W, nx), r), 32)
            ok = ((ny < 3 or (ny - 1) * hl + r <= self.H)
                  and (nx < 3 or (nx - 1) * wl + r <= self.W))
            if ok:
                return hl, wl
        return None, None

    def shard_batch(self, imgs: np.ndarray):
        """Pad a host batch to the shard grid and place it onto the mesh."""
        imgs = np.asarray(imgs)
        ph, pw = self.Hp - imgs.shape[-2], self.Wp - imgs.shape[-1]
        if ph or pw:
            imgs = np.pad(imgs, ((0, 0), (0, ph), (0, pw)))
        return jax.device_put(imgs, self._in_sharding)

    def __call__(self, imgs, min_val: int, max_val: int):
        if imgs.ndim != 3:
            raise ValueError("expected (B, H, W)")
        return self._fn(imgs, jnp.int32(min_val), jnp.int32(max_val))
