"""Static shift helpers for stencil ops.

All stencils in the pipeline are expressed as sums/ORs of statically shifted
arrays (shift amounts are Python ints fixed at trace time), which XLA fuses
into single VPU loops — the TPU-idiomatic replacement for the reference's
per-pixel index arithmetic (src/utils.cpp) and shared-memory halo tiles
(src/cuda.cu:115-178).
"""

from __future__ import annotations

import jax.numpy as jnp


def shift_cols(x, off: int, fill=0):
    """y[..., j] = x[..., j+off] where valid, ``fill`` elsewhere."""
    w = x.shape[-1]
    fill = jnp.asarray(fill, x.dtype)
    if off == 0:
        return x
    if abs(off) >= w:
        return jnp.full_like(x, fill)
    pad = [(0, 0)] * (x.ndim - 1)
    if off > 0:
        return jnp.pad(x[..., off:], pad + [(0, off)], constant_values=fill)
    return jnp.pad(x[..., :w + off], pad + [(-off, 0)], constant_values=fill)


def shift_rows(x, off: int, fill=0):
    """y[..., i, :] = x[..., i+off, :] where valid, ``fill`` elsewhere."""
    h = x.shape[-2]
    fill = jnp.asarray(fill, x.dtype)
    if off == 0:
        return x
    if abs(off) >= h:
        return jnp.full_like(x, fill)
    pad = [(0, 0)] * (x.ndim - 2)
    if off > 0:
        return jnp.pad(x[..., off:, :], pad + [(0, off), (0, 0)],
                       constant_values=fill)
    return jnp.pad(x[..., :h + off, :], pad + [(-off, 0), (0, 0)],
                   constant_values=fill)


def shift2d(x, dr: int, dc: int, fill=0):
    return shift_rows(shift_cols(x, dc, fill), dr, fill)


def clamp_shift_cols(x, off: int):
    """Shift with edge replication (column clamp), |off| == 1 only."""
    if off == 1:
        return jnp.concatenate([x[..., 1:], x[..., -1:]], axis=-1)
    if off == -1:
        return jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
    raise ValueError(off)


def clamp_shift_rows(x, off: int):
    if off == 1:
        return jnp.concatenate([x[..., 1:, :], x[..., -1:, :]], axis=-2)
    if off == -1:
        return jnp.concatenate([x[..., :1, :], x[..., :-1, :]], axis=-2)
    raise ValueError(off)
