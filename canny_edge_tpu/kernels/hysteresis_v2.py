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

    weak_ref: (G, band_h+2, W) int32; edges_ref: same shape int8.
    scratch: (G, band_h+2, W) int32 VMEM working state.
    """
    scratch[:] = edges_ref[:].astype(jnp.int32)
    base = jnp.sum(scratch[:, 1:-1, :])

    def wrow(r):
        # weak is int32: Mosaic cannot vector.load i8 at a dynamic row index
        return weak_ref[:, pl.ds(r, 1), :][:, 0, :]

    def erow(r):
        return scratch[:, pl.ds(r, 1), :][:, 0, :]

    def fwd_body(r, carry):
        prev = erow(r - 1)
        grow = prev | _shift_left_lanes(prev, 1) | _shift_right_lanes(prev, 1)
        wr = wrow(r)
        cur = erow(r) | (grow & wr)
        scratch[:, pl.ds(r, 1), :] = _hflood(cur, wr)[:, None, :]
        return carry

    def bwd_body(i, carry):
        r = band_h + 1 - i  # rows band_h .. 1
        nxt = erow(r + 1)
        grow = nxt | _shift_left_lanes(nxt, 1) | _shift_right_lanes(nxt, 1)
        wr = wrow(r)
        cur = erow(r) | (grow & wr)
        scratch[:, pl.ds(r, 1), :] = _hflood(cur, wr)[:, None, :]
        return carry

    def round_fn(prev_total):
        jax.lax.fori_loop(1, band_h + 2, fwd_body, jnp.int32(0))
        jax.lax.fori_loop(1, band_h + 1, bwd_body, jnp.int32(0))
        return jnp.sum(scratch[:, 1:-1, :])

    def cond(state):
        prev_total, cur_total = state
        return cur_total > prev_total

    def body(state):
        _, cur_total = state
        return cur_total, round_fn(cur_total)

    first = round_fn(base)
    _, _ = jax.lax.while_loop(cond, body, (base, first))
    out_ref[:] = scratch[:, 1:-1, :].astype(jnp.int8)
    changed_ref[0, 0, 0] = jnp.sum(scratch[:, 1:-1, :]) - base


def _to_bands(x, band_h, nb):
    """(H', W) int8 -> (nb, band_h+2, W) with 1-row halos (zeros at ends)."""
    padded = jnp.pad(x, ((1, 1), (0, 0)))
    rows = [padded[i * band_h:i * band_h + band_h + 2, :] for i in range(nb)]
    return jnp.stack(rows)


def hysteresis_banded(nm, min_val, max_val, *, band_h: int = 128,
                      group: int = 4, interpret=None):
    """int NMS magnitude (H, W) -> int16 {0,255} via banded raster scans."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    H, W = nm.shape
    band_h = min(band_h, max(8, H))
    nb = _cdiv(H, band_h)
    g = min(group, nb)
    ng = _cdiv(nb, g)
    nb = ng * g                      # pad bands to a multiple of the group
    hp = nb * band_h

    weak = jnp.pad((nm >= min_val).astype(jnp.int8), ((0, hp - H), (0, 0)))
    strong = jnp.pad((nm >= max_val).astype(jnp.int8), ((0, hp - H), (0, 0)))
    weak_bands = _to_bands(weak, band_h, nb).astype(jnp.int32)

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
            **grid_spec,
        )(weak_bands, edge_bands)
        return out.reshape(hp, W), jnp.sum(changed)

    edges, _ = sweep(strong)

    def body(state):
        e, _ = state
        return sweep(e)

    edges, _ = jax.lax.while_loop(lambda s: s[1] > 0, body,
                                  (edges, jnp.int32(1)))
    return jnp.where(edges[:H] > 0, jnp.int16(255), jnp.int16(0))
