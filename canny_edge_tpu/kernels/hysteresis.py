"""Pallas hysteresis v1: per-tile fixed-point convergence sweeps.

The reference's hysteresis is a serial CPU BFS (src/utils.cpp:360-427) that
even the CUDA path falls back to (src/cuda.cu:436).  The naive data-parallel
replacement (one 3x3 dilation per step) needs O(edge length) HBM sweeps.
This kernel cuts that to O(tiles crossed): each grid step loads a tile of
the weak/strong masks into VMEM and runs the dilation *to local convergence*
on-chip (a lax.while_loop over VPU ops at VMEM bandwidth), so a global sweep
costs one HBM pass and information propagates a whole tile per sweep; an
outer while_loop with a changed-count reduction detects the fixed point.
(Each sweep's tiles read the pre-sweep state, so sweep order is irrelevant —
a round-1 serpentine variant was measured equivalent and removed.)

State is int8 (0/1) to minimize HBM traffic.  Superseded as the production
engine by kernels/hysteresis_packed.py; kept as the bounded-worst-case
reference implementation for the tiled-convergence strategy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .frontend import _cdiv, make_halo_tiles


def _dilate_tile(e):
    """3x3 OR-dilation on an int8 0/1 tile (separable max)."""
    h = jnp.maximum(e, jnp.maximum(
        jnp.pad(e[:, 1:], ((0, 0), (0, 1))),
        jnp.pad(e[:, :-1], ((0, 0), (1, 0)))))
    return jnp.maximum(h, jnp.maximum(
        jnp.pad(h[1:, :], ((0, 1), (0, 0))),
        jnp.pad(h[:-1, :], ((1, 0), (0, 0)))))


def _hyst_kernel(weak_ref, edges_ref, out_ref, changed_ref):
    # int8 in HBM for bandwidth; int32 in VMEM (Mosaic cannot legalize i8
    # vector max)
    w = weak_ref[0, 0].astype(jnp.int32)
    e0 = edges_ref[0, 0].astype(jnp.int32)

    def cond(state):
        _, ndiff = state
        return ndiff > 0

    def body(state):
        e, _ = state
        new = jnp.minimum(w, _dilate_tile(e))        # weak & dilate(edges)
        # integer scalar carry: Mosaic cannot relayout i1 vector reductions
        ndiff = jnp.sum(new - e)
        return new, ndiff

    # first step unrolled so the while_loop carry init is fully traced
    # (Pallas kernels cannot capture concrete-array constants)
    first = body((e0, None))
    e1, _ = jax.lax.while_loop(cond, body, first)
    out_ref[0, 0] = e1[1:-1, 1:-1].astype(jnp.int8)
    # growth is monotone (e1 >= e0), so the changed count is a plain sum
    changed_ref[0, 0, 0, 0] = jnp.sum(e1[1:-1, 1:-1] - e0[1:-1, 1:-1])


def _sweep(weak_tiles, edges, th, tw, nty, ntx, interpret):
    """One global pass: per-tile local convergence; returns new edges and
    the number of changed pixels."""
    edge_tiles = make_halo_tiles(edges, th, tw, 1)

    out, changed = pl.pallas_call(
        _hyst_kernel,
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec((1, 1, th + 2, tw + 2),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, th + 2, tw + 2),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, th, tw), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nty, ntx, th, tw), jnp.int8),
            jax.ShapeDtypeStruct((nty, ntx, 1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(weak_tiles, edge_tiles)
    h, w = edges.shape
    new_edges = out.transpose(0, 2, 1, 3).reshape(nty * th, ntx * tw)[:h, :w]
    return new_edges, jnp.sum(changed)


def hysteresis_pallas(nm, min_val, max_val, *, tile=(128, 512),
                      interpret=None):
    """int NMS magnitude (H, W) -> int16 {0,255}, Pallas fixed point."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    H, W = nm.shape
    th = min(tile[0], max(8, H))
    tw = min(tile[1], max(128, W))
    nty, ntx = _cdiv(H, th), _cdiv(W, tw)

    weak = (nm >= min_val).astype(jnp.int8)
    strong = (nm >= max_val).astype(jnp.int8)
    weak_tiles = make_halo_tiles(weak, th, tw, 1)

    sweep = functools.partial(_sweep, weak_tiles, th=th, tw=tw, nty=nty,
                              ntx=ntx, interpret=interpret)

    # sweep 0 always runs; keep sweeping until a sweep changes nothing
    edges, _ = sweep(strong)

    def cond(state):
        _, changed = state
        return changed > 0

    def body(state):
        edges, _ = state
        return sweep(edges)

    edges, _ = jax.lax.while_loop(cond, body, (edges, jnp.int32(1)))
    return jnp.where(edges > 0, jnp.int16(255), jnp.int16(0))
