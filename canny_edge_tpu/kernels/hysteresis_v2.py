"""Raster-scan Pallas hysteresis: banded wavefront propagation.

v1 (kernels.hysteresis) converges each tile by iterated 3x3 dilation — worst
case O(tile diameter) VPU sweeps per tile (hundreds for long contours).
This version replaces dilation with the classic two-pass connected-labeling
recurrence, vectorized across row bands:

* The image splits into horizontal bands of ``band_h`` rows (full width:
  no vertical seams, so horizontal flooding never crosses a tile boundary).
* A forward pass walks rows downward; each row grows from the *already
  updated* row above (including diagonals) and is then flooded horizontally
  to its full weak runs by a segmented or-scan (log2(W) doubling steps).
  A backward pass mirrors it upward.  One forward+backward round resolves
  arbitrary monotone paths; bends/spirals converge in a couple of rounds
  (in-kernel while_loop on the changed count).
* The row recurrence is vectorized across a group of bands processed
  simultaneously — each step updates a (G, W) slab, keeping the VPU busy
  despite the sequential row dependency.  The evolving state lives in a
  VMEM scratch ref (Mosaic supports dynamic row indexing on refs, not on
  values).
* Cross-band coupling happens via outer sweeps: band halos are refreshed
  from neighbor bands and the kernel reruns until a global fixed point.

The horizontal segmented or-scan composes the per-pixel transfer function
t(x) = a | (b & x) (a = "edge here", b = "weak/transparent here"), which is
closed under composition: doubling the span s combines
A' = A | (B & shift_s(A)), B' = B & shift_s(B).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .frontend import _cdiv


def _shift_right_lanes(x, s):
    """y[..., c] = x[..., c-s] (toward higher lane index), zero fill."""
    pad = jnp.zeros(x.shape[:-1] + (s,), x.dtype)
    return jnp.concatenate([pad, x[..., :-s]], axis=-1)


def _shift_left_lanes(x, s):
    pad = jnp.zeros(x.shape[:-1] + (s,), x.dtype)
    return jnp.concatenate([x[..., s:], pad], axis=-1)


def _hflood(cur, w):
    """Flood edges along full weak runs in each row: segmented or-scan,
    both directions, log-step doubling.  cur/w: (G, W) int32 0/1."""
    width = cur.shape[-1]
    a_l, b_l = cur, w
    a_r, b_r = cur, w
    s = 1
    while s < width:
        a_l = a_l | (b_l & _shift_right_lanes(a_l, s))
        b_l = b_l & _shift_right_lanes(b_l, s)
        a_r = a_r | (b_r & _shift_left_lanes(a_r, s))
        b_r = b_r & _shift_left_lanes(b_r, s)
        s *= 2
    return (w & (a_l | a_r)) | cur


def _band_kernel(weak_ref, edges_ref, out_ref, changed_ref, scratch,
                 *, band_h):
    """One sweep over a group of bands, to in-group fixed point.

    weak_ref/edges_ref: (G, band_h+2, W) int8 (read once, statically).
    scratch: (G, band_h+2, W) int32 — bit 0 = edge, bit 1 = weak (packing
    both masks into one scratch halves VMEM so whole-image groups fit;
    Mosaic also cannot vector.load i8 at dynamic row indices, so the
    dynamically-indexed working state must be int32 anyway).
    """
    scratch[:] = (edges_ref[:].astype(jnp.int32)
                  | jax.lax.shift_left(weak_ref[:].astype(jnp.int32), 1))
    base = jnp.sum(scratch[:, 1:-1, :] & 1)

    def vrow(r):
        return scratch[:, pl.ds(r, 1), :][:, 0, :]

    def _step(r, nb_r):
        v = vrow(r)
        wr = jax.lax.shift_right_logical(v, 1)
        er = v & 1
        nbr = vrow(nb_r) & 1
        grow = nbr | _shift_left_lanes(nbr, 1) | _shift_right_lanes(nbr, 1)
        cur = _hflood(er | (grow & wr), wr)
        scratch[:, pl.ds(r, 1), :] = (
            jax.lax.shift_left(wr, 1) | cur)[:, None, :]

    def fwd_body(r, carry):
        _step(r, r - 1)
        return carry

    def bwd_body(i, carry):
        r = band_h + 1 - i  # rows band_h .. 1
        _step(r, r + 1)
        return carry

    def pending_growth():
        """Vectorized fixed-point test: pixels one dilate step would add.

        Replaces a whole confirmation round of the (row-loop) passes with
        ~15 full-tensor VPU ops.  Band halos are rows in the tensor, so the
        per-band dilation along axis 1 respects band boundaries.
        """
        v = scratch[:]
        e = v & 1
        w = jax.lax.shift_right_logical(v, 1)
        h = e | _shift_left_lanes(e, 1) | _shift_right_lanes(e, 1)
        zrow = jnp.zeros_like(h[:, :1, :])
        up = jnp.concatenate([h[:, 1:, :], zrow], axis=1)
        dn = jnp.concatenate([zrow, h[:, :-1, :]], axis=1)
        new = w & (h | up | dn)
        return jnp.sum(new[:, 1:-1, :] - e[:, 1:-1, :])

    def round_fn(_):
        jax.lax.fori_loop(1, band_h + 2, fwd_body, jnp.int32(0))
        jax.lax.fori_loop(1, band_h + 1, bwd_body, jnp.int32(0))
        return pending_growth()

    pending = round_fn(jnp.int32(0))
    jax.lax.while_loop(lambda p: p > 0, round_fn, pending)
    out_ref[:] = (scratch[:, 1:-1, :] & 1).astype(jnp.int8)
    changed_ref[0, 0, 0] = jnp.sum(scratch[:, 1:-1, :] & 1) - base


def _to_bands(x, band_h, nb):
    """(H', W) int8 -> (nb, band_h+2, W) with 1-row halos (zeros at ends)."""
    padded = jnp.pad(x, ((1, 1), (0, 0)))
    rows = [padded[i * band_h:i * band_h + band_h + 2, :] for i in range(nb)]
    return jnp.stack(rows)


def hysteresis_banded(nm, min_val, max_val, *, band_h: int | None = None,
                      group: int | None = None, interpret=None):
    """int NMS magnitude (H, W) -> int16 {0,255} via banded raster scans.

    Defaults: ~270-row bands (few bands => few cross-band sweeps) grouped
    to fit the packed int32 scratch plus the int8 blocks in ~10 MB of VMEM.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    H, W = nm.shape
    # Cost model: row-steps per sweep = ng * 2 * band_h = 2H/g, so the group
    # width g should be as large as the VMEM budget allows (scratch int32 +
    # three int8 blocks ~= 7 bytes per texel); band_h trades cross-band
    # sweep count (fewer, taller bands) against group width.
    if band_h is None:
        band_h = 64 if H >= 512 else max(8, H)
    band_h = min(band_h, max(8, H))
    nb = _cdiv(H, band_h)
    if group is None:
        # observed VMEM footprint ~16 B/texel: int32 scratch + int8 blocks
        # with Pallas double/triple buffering of inputs and outputs
        per_band = (band_h + 2) * W * 16
        group = max(1, min(nb, int(15e6 // per_band)))
    g = min(group, nb)
    ng = _cdiv(nb, g)
    nb = ng * g                      # pad bands to a multiple of the group
    hp = nb * band_h

    weak = jnp.pad((nm >= min_val).astype(jnp.int8), ((0, hp - H), (0, 0)))
    strong = jnp.pad((nm >= max_val).astype(jnp.int8), ((0, hp - H), (0, 0)))
    weak_bands = _to_bands(weak, band_h, nb)

    kern = functools.partial(_band_kernel, band_h=band_h)
    grid_spec = dict(
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((g, band_h + 2, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, band_h + 2, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((g, band_h, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[pltpu.VMEM((g, band_h + 2, W), jnp.int32)],
    )

    def sweep(edges_flat):
        edge_bands = _to_bands(edges_flat, band_h, nb)
        out, changed = pl.pallas_call(
            kern,
            out_shape=[
                jax.ShapeDtypeStruct((nb, band_h, W), jnp.int8),
                jax.ShapeDtypeStruct((ng, 1, 1), jnp.int32),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            **grid_spec,
        )(weak_bands, edge_bands)
        return out.reshape(hp, W), jnp.sum(changed)

    def needs_more(e):
        """Global fixed-point test in XLA (one dilate step): cheaper than
        discovering convergence with a full extra sweep."""
        zc = jnp.zeros_like(e[:, :1])
        h = e | jnp.concatenate([e[:, 1:], zc], axis=1) \
            | jnp.concatenate([zc, e[:, :-1]], axis=1)
        zr = jnp.zeros_like(h[:1, :])
        d = h | jnp.concatenate([h[1:, :], zr], axis=0) \
            | jnp.concatenate([zr, h[:-1, :]], axis=0)
        new = weak & d
        return jnp.sum((new - e).astype(jnp.int32)) > 0

    edges, _ = sweep(strong)

    def body(state):
        e, _ = state
        e2, _ = sweep(e)
        return e2, needs_more(e2)

    edges, _ = jax.lax.while_loop(lambda s: s[1], body,
                                  (edges, needs_more(edges)))
    return jnp.where(edges[:H] > 0, jnp.int16(255), jnp.int16(0))
