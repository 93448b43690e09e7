"""Pallas bit-packed hysteresis: the whole image's masks resident in VMEM.

The XLA formulation of the packed flood (ops.packed) re-materializes the
edge mask in HBM every while_loop iteration.  At 32 pixels per uint32 word
the packed masks are tiny — 260 KB at 1080p, 1 MB at 4K — so this kernel
keeps weak + edges entirely in VMEM and runs the complete fixed point
(rounds of K dilations + horizontal/vertical segmented or-scan floods,
ops/packed.py) inside one ``pallas_call``: zero HBM traffic between rounds,
one read of the packed masks and one write of the packed result in total.

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


def _any_nonzero(d):
    """Nonzero test for a uint32 array without i1 vector reductions.

    (d >> 1) | (d & 1) maps any nonzero word to a nonzero value with the
    top bit clear, so an int32 max reduction is sign-safe."""
    nz = (d >> jnp.uint32(1)) | (d & jnp.uint32(1))
    return jnp.max(nz.astype(jnp.int32)) > 0


def _hyst_packed_kernel(weak_ref, strong_ref, out_ref, *, height, width,
                        inner_dilate):
    w = weak_ref[:]

    def rest_of_round(e):
        e = jax.lax.fori_loop(0, inner_dilate - 1,
                              lambda i, x: dilate_packed(x, w), e)
        e = hflood(e, w, width)
        e = vflood(e, w, height)
        return e

    def body(state):
        e, _ = state
        # One dilation is the exact fixed-point test: dilate(e) == e means
        # no 8-neighbour expansion is possible, and floods only add pixels
        # a dilation would also add.  So the final (verification) round
        # costs one dilation + compare instead of a full round (~6 us vs
        # ~28 us at 1080p), and non-final rounds lose nothing — the
        # dilation is the round's first step either way.
        d1 = dilate_packed(e, w)
        changed = _any_nonzero(d1 ^ e)
        new = jax.lax.cond(changed, rest_of_round, lambda x: x, d1)
        return new, changed

    # the round body is instantiated once, inside the loop (initial flag
    # True runs round 1 there) — the Mosaic program is half the size of the
    # peeled-first-round formulation, which this target compiles slowly
    edges, _ = jax.lax.while_loop(lambda s: s[1], body,
                                  (strong_ref[:], jnp.asarray(True)))
    out_ref[:] = edges


def hysteresis_packed_pallas_masks(weak_p, strong_p, height: int, width: int,
                                   *, inner_dilate: int = 6, interpret=None):
    """Packed (H, Wd) uint32 masks -> packed edge mask, one VMEM kernel."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    kern = functools.partial(_hyst_packed_kernel, height=height, width=width,
                             inner_dilate=inner_dilate)
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(weak_p, strong_p)


def hysteresis_packed_pallas(nm, min_val, max_val, *, inner_dilate: int = 6,
                             interpret=None):
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
                              interpret=interpret)
        edges = jax.vmap(f)(weak_p, strong_p)
    else:
        edges = hysteresis_packed_pallas_masks(
            weak_p, strong_p, h, w, inner_dilate=inner_dilate,
            interpret=interpret)
    return jnp.where(unpack_mask(edges, w), jnp.int16(255), jnp.int16(0))
