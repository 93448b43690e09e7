"""ICI halo exchange for spatially partitioned stencils.

The reference keeps stencil halos in CUDA ``__shared__`` tiles within one GPU
(src/cuda.cu:115-178).  Here the same pattern is promoted to the device mesh:
images are block-partitioned over mesh axes ("y", "x") and each stencil stage
exchanges its halo strips with neighbor devices via ``jax.lax.ppermute``
(compiled to XLA collective-permutes that ride the ICI torus).

Non-periodic boundaries: ppermute leaves devices with no source as zeros;
global image-border semantics are applied by the stage math itself via
global-coordinate masks, so the halo fill value at the true image border is
never observed.

Corners: two-phase exchange (x then y of the already-x-padded block)
transfers corner halos through the neighbor's edge strips, the standard
trick for 2-D stencil decomposition.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _shift_from_lower(strip, axis_name):
    """Each device receives the strip from its lower-indexed neighbor."""
    n = lax.axis_size(axis_name)
    if n == 1:
        return jnp.zeros_like(strip)
    return lax.ppermute(strip, axis_name, [(i, i + 1) for i in range(n - 1)])


def _shift_from_upper(strip, axis_name):
    n = lax.axis_size(axis_name)
    if n == 1:
        return jnp.zeros_like(strip)
    return lax.ppermute(strip, axis_name, [(i, i - 1) for i in range(1, n)])


def halo_exchange_cols(x, r: int, axis_name: str):
    """(..., H, W) -> (..., H, W + 2r): exchange column halos along mesh axis.

    Requires the local width >= r.  Devices at the global image border get
    zero-filled halos (masked out by the caller's border semantics).
    """
    if r == 0:
        return x
    if lax.axis_size(axis_name) == 1:
        # no neighbors: the halo is pure image-border zero fill, emitted
        # as a pad (fuses into the consumer) rather than zeros+concat
        # (which XLA:TPU materializes as its own full-size lane-axis
        # array — part of the round-3 degenerate-mesh overhead)
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(r, r)])
    left_halo = _shift_from_lower(x[..., -r:], axis_name)
    right_halo = _shift_from_upper(x[..., :r], axis_name)
    return jnp.concatenate([left_halo, x, right_halo], axis=-1)


def halo_exchange_rows(x, r: int, axis_name: str):
    """(..., H, W) -> (..., H + 2r, W): exchange row halos along mesh axis."""
    if r == 0:
        return x
    if lax.axis_size(axis_name) == 1:
        return jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(r, r), (0, 0)])
    top_halo = _shift_from_lower(x[..., -r:, :], axis_name)
    bottom_halo = _shift_from_upper(x[..., :r, :], axis_name)
    return jnp.concatenate([top_halo, x, bottom_halo], axis=-2)


def halo_exchange_2d(x, r: int, y_axis: str, x_axis: str):
    """Two-phase 2-D halo exchange with corners: (..., H+2r, W+2r)."""
    return halo_exchange_rows(halo_exchange_cols(x, r, x_axis), r, y_axis)
