"""Pallas backend for the full pipeline: fused front end + tiled hysteresis.

Drop-in replacement for the XLA stage composition (models.canny backend
"pallas"), bit-exact against it and the golden oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .frontend import frontend_nm
from .hysteresis import hysteresis_pallas
from .hysteresis_packed import hysteresis_packed_pallas
from .hysteresis_v2 import hysteresis_banded


def _auto_interpret():
    return jax.default_backend() == "cpu"


def canny_fused(img, min_val, max_val, *, kernel_vals, hysteresis_steps=4,
                tile=None, interpret=None, hysteresis_impl="packed",
                strict=False):
    """uint8 (H, W) -> int16 {0,255} via Pallas kernels.

    ``hysteresis_steps`` is accepted for signature parity with the XLA path
    (the Pallas hysteresis converges on-chip, so the parameter is unused).
    ``interpret=None`` auto-selects interpreter mode on CPU backends so the
    same code runs in tests and on TPU.
    ``hysteresis_impl``: "packed" (bit-packed VMEM-resident flood, default
    — see kernels/hysteresis_packed.py), "banded" (raster-scan wavefront)
    or "dilate" (v1 tiled dilation fixed point).
    ``strict``: strict-reference hysteresis (the reference BFS bounds
    quirk, src/utils.cpp:378,399) — packed impls only.
    """
    del hysteresis_steps
    if interpret is None:
        interpret = _auto_interpret()
    if strict and hysteresis_impl not in ("packed", "packed-xla"):
        raise ValueError("strict mode: use hysteresis_impl packed/packed-xla")
    if img.ndim == 3:
        f = lambda x: canny_fused(  # noqa: E731
            x, min_val, max_val, kernel_vals=kernel_vals, tile=tile,
            interpret=interpret, hysteresis_impl=hysteresis_impl,
            strict=strict)
        return jax.vmap(f)(img)
    nm = frontend_nm(img, kernel_vals, tile=tile, interpret=interpret)
    if hysteresis_impl == "packed":
        return hysteresis_packed_pallas(nm, min_val, max_val,
                                        interpret=interpret, strict=strict)
    if hysteresis_impl == "packed-xla":
        from ..ops.packed import hysteresis_packed

        return hysteresis_packed(nm, min_val, max_val, strict=strict)
    if hysteresis_impl == "banded":
        return hysteresis_banded(nm, min_val, max_val, interpret=interpret)
    return hysteresis_pallas(nm, min_val, max_val,
                             **({} if tile is None else {"tile": tile}),
                             interpret=interpret)
