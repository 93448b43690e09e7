"""Single-chip Canny pipeline model (the TPU equivalent of the reference's
``canny()`` orchestrator, src/utils.cpp:429-492, and ``cuda_canny()``,
src/cuda.cu:392-450).

Unlike the reference's GPU path — which round-trips every stage through host
memory (src/cuda.cu:96,229) and runs hysteresis on the CPU (src/cuda.cu:436)
— the whole four-stage pipeline here is one jit-compiled XLA program: the
image is transferred to HBM once, all stages fuse on-device (including the
hysteresis fixed point inside a lax.while_loop), and the binary edge map is
transferred back once.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..golden.reference import gaussian_kernel
from ..ops import stages


def canny_fn(img, min_val, max_val, *, kernel_vals, hysteresis_steps=4,
             backend: str = "xla", hysteresis_mode: str = "component"):
    """Traceable full pipeline: uint8 (..., H, W) -> int16 {0,255}.

    ``kernel_vals``: static tuple of float32 Gaussian weights (host-computed
    by golden.gaussian_kernel so TPU and oracle share identical weights).
    ``hysteresis_steps``: dilations per convergence check for the *unpacked*
    dilation engine (the strict-reference path and ops.stages.hysteresis).
    The packed flood engines used by every production backend converge
    on-chip with tuned inner_dilate values (4 XLA / 10 VMEM kernel — see the
    notes below) and deliberately ignore this knob; it never affects
    results, only engine round granularity.
    ``backend``:
      * "fused" — production path: best measured engine per stage
        (select-free static XLA front end with fused threshold+packing +
        Pallas VMEM bit-packed hysteresis flood; v5e profile ~0.22 ms at
        1080p, ~0.85 ms at 4K).
      * "xla" — pure jnp/XLA ops end to end (no Pallas kernels).
      * "pallas" — all-Pallas compute path (fused front-end kernel + VMEM
        hysteresis), the reference point for kernel-vs-XLA comparisons.
    ``hysteresis_mode``: "component" (clean 8-connected rule) or
    "strict-reference" (bit-identical to the reference binary including
    its BFS bounds quirk).  Since round 4 strict mode runs on the SAME
    production engines as component mode — the quirk is one masked bit in
    word 0 of rows 0/1 of the packed flood (ops.packed.strict_fix_packed)
    — at measured zero cost (0.202 ms both modes at 1080p, strict row in
    docs/bench_run_all_r5.json), not the round-3 unpacked-dilation detour.
    """
    if hysteresis_mode not in ("component", "strict-reference"):
        raise ValueError(f"unknown hysteresis mode: {hysteresis_mode!r}")
    strict = hysteresis_mode == "strict-reference"
    if backend == "pallas":
        from ..kernels import fused as pallas_fused

        return pallas_fused.canny_fused(
            img, min_val, max_val, kernel_vals=kernel_vals,
            hysteresis_steps=hysteresis_steps, strict=strict)
    from ..ops.window import frontend_nm_xla

    if backend == "fused":
        from ..kernels.hysteresis_packed import hysteresis_packed_pallas_masks
        from ..ops.packed import unpack_mask

        # thresholds fused into the front-end program: the full-size nm map
        # is never materialized in HBM — the front end writes 0.52 MB of
        # bit-packed weak/strong masks (1080p) which the Pallas
        # VMEM-resident flood kernel (0.066 ms vs 0.101 ms for the XLA
        # packed flood) consumes directly
        h, w = img.shape[-2], img.shape[-1]
        weak_p, strong_p = frontend_nm_xla(img, kernel_vals,
                                           thresholds=(min_val, max_val))
        # inner_dilate / VMEM capacity guard live in utils/constants.py and
        # kernels/hysteresis_packed.py (over-budget shapes, e.g. 8K frames,
        # automatically stream through the XLA flood instead)
        edges = hysteresis_packed_pallas_masks(weak_p, strong_p, h, w,
                                               strict=strict)
        return jnp.where(unpack_mask(edges, w), jnp.int16(255), jnp.int16(0))
    nm = frontend_nm_xla(img, kernel_vals)
    from ..ops.packed import hysteresis_packed

    # bit-packed flood: same fixed point as stages.hysteresis, ~3-6x faster
    # (ops/packed.py); its default inner_dilate is the tuned
    # INNER_DILATE_XLA — the XLA flood's full-round convergence test makes
    # extra dilations per round cost more than they save (the VMEM kernel
    # above defaults to the larger INNER_DILATE_VMEM, retuned in round 2
    # for its cheap early-exit test; utils/constants.py is the single
    # source of truth for both)
    return hysteresis_packed(nm, min_val, max_val, strict=strict)


def canny_fn_packed(img, min_val, max_val, *, kernel_vals,
                    hysteresis_mode: str = "component"):
    """Traceable pipeline with *bit-packed* output: uint8 (H, W) ->
    uint32 (H, ceil(W/32)) edge bitmask (ops.packed layout; bit b of word
    j = column j*32 + b, set iff the pixel is an edge).

    The fused production engines already hold the edge state bit-packed;
    this entry point simply skips the final unpack + int16 expansion, so
    the device output is 0.031 B/px instead of 2 B/px.  That is the fix
    for the round-3 batch finding (benchmarks/exp_batch.py): at 64x1080p
    the stacked int16 output buffer was 265 MB — the entire +11%/frame
    batch overhead — vs 8.3 MB packed.  Unpack on the host with
    ops.packed.unpack_edges_np (or on device with ops.packed.unpack_mask).

    Replaces the reference's one-frame-at-a-time loop (src/main.cpp:120)
    for high-throughput streaming.
    """
    from ..kernels.hysteresis_packed import hysteresis_packed_pallas_masks
    from ..ops.window import frontend_nm_xla

    if hysteresis_mode not in ("component", "strict-reference"):
        raise ValueError(f"unknown hysteresis mode: {hysteresis_mode!r}")
    h, w = img.shape[-2], img.shape[-1]
    weak_p, strong_p = frontend_nm_xla(img, kernel_vals,
                                       thresholds=(min_val, max_val))
    return hysteresis_packed_pallas_masks(
        weak_p, strong_p, h, w,
        strict=hysteresis_mode == "strict-reference")


def canny_fn_batched(imgs, min_val, max_val, *, kernel_vals,
                     hysteresis_steps=8, hysteresis_mode="component",
                     backend="xla"):
    """Batched pipeline: ``lax.map`` of the full single-frame pipeline.

    XLA:TPU per-pixel stencil cost grows sharply with program size, so a
    sequence of single-frame programs (each internally whole-image or
    band-mapped, see ops.window) beats any jointly-batched formulation —
    measured 3197 MP/s vs 1208-1350 MP/s for 3-D/tall-stacked variants on
    8x1080p.  (A split-stage variant — all front ends under ``lax.map``
    emitting stacked packed masks, then one vmapped flood launch — was
    measured *slower*, 17.4 vs 16.0 ms at 64x1080p: materializing the
    stacked masks costs more than the per-frame kernel launches.)
    """
    return jax.lax.map(
        lambda f: canny_fn(f, min_val, max_val, kernel_vals=kernel_vals,
                           hysteresis_steps=hysteresis_steps,
                           hysteresis_mode=hysteresis_mode,
                           backend=backend), imgs)


def canny_with_intermediates(img, min_val, max_val, *, kernel_vals,
                             hysteresis_steps=4):
    """Pipeline returning per-stage intermediates (the ``-s`` equivalent)."""
    smoothed = stages._gaussian_blur_with_kernel(img, kernel_vals)
    mag, ang = stages.sobel(smoothed)
    nm = stages.nonmax_suppression(mag, ang)
    out, frontier_iters = stages.hysteresis_with_stats(
        nm, min_val, max_val, hysteresis_steps)
    return out, {
        "smoothed": smoothed,
        "magnitude": mag.astype(jnp.int16),
        "angle": ang,
        "nonmax": nm.astype(jnp.int16),
        "frontier_iterations": frontier_iters,
    }


@dataclass
class CannyTPU:
    """Flagship single-chip model: compiled Canny edge detector.

    Example::

        model = CannyTPU(sigma=1.0)
        edges = model(img_u8, 50, 150)           # (H, W) int16 {0,255}
        edges = model.batch(frames_u8, 50, 150)  # (B, H, W)

    sigma is static (determines the blur window / compiled stencil);
    min_val/max_val are traced, so retuning thresholds does not recompile.

    ``hysteresis_steps`` affects ONLY the ``with_intermediates``
    observability path (dilations per convergence check of the unpacked
    engine, whose step count it also reports).  The production backends
    (fused/xla/pallas) converge with tuned inner-dilation counts
    (utils/constants.py) and never read it — results are identical either
    way, so this knob is granularity-of-reporting, not behavior.
    """

    sigma: float = 1.0
    hysteresis_steps: int = 4
    backend: str = "fused"
    hysteresis_mode: str = "component"
    kernel: np.ndarray = field(init=False)

    def __post_init__(self):
        self.kernel = gaussian_kernel(self.sigma)
        kernel_vals = tuple(float(v) for v in self.kernel)
        base = functools.partial(
            canny_fn, kernel_vals=kernel_vals,
            hysteresis_steps=self.hysteresis_steps, backend=self.backend,
            hysteresis_mode=self.hysteresis_mode)
        self._single = jax.jit(base)
        # batched path: lax.map of single-frame programs with per-frame
        # hysteresis convergence (see canny_fn_batched); the all-Pallas
        # backend vmaps its 2-D kernels instead
        if self.backend in ("xla", "fused"):
            self._batched = jax.jit(functools.partial(
                canny_fn_batched, kernel_vals=kernel_vals,
                hysteresis_steps=self.hysteresis_steps,
                hysteresis_mode=self.hysteresis_mode, backend=self.backend))
        else:
            self._batched = jax.jit(jax.vmap(base, in_axes=(0, None, None)))
        self._intermediates = jax.jit(functools.partial(
            canny_with_intermediates, kernel_vals=kernel_vals,
            hysteresis_steps=self.hysteresis_steps))
        # packed-output entry points (fused engines regardless of backend:
        # the packed mask IS the fused path's native state)
        packed_base = functools.partial(
            canny_fn_packed, kernel_vals=kernel_vals,
            hysteresis_mode=self.hysteresis_mode)
        self._packed = jax.jit(packed_base)
        self._batch_packed = jax.jit(
            lambda imgs, mn, mx: jax.lax.map(
                lambda f: packed_base(f, mn, mx), imgs))

    @property
    def window(self) -> int:
        return int(self.kernel.shape[0])

    def __call__(self, img, min_val: int, max_val: int):
        self._validate(img, min_val, max_val)
        return self._single(img, jnp.int32(min_val), jnp.int32(max_val))

    def batch(self, imgs, min_val: int, max_val: int):
        assert imgs.ndim == 3, "batch expects (B, H, W)"
        self._validate(imgs[0], min_val, max_val)
        return self._batched(imgs, jnp.int32(min_val), jnp.int32(max_val))

    def packed(self, img, min_val: int, max_val: int):
        """Edge bitmask (H, ceil(W/32)) uint32 — see canny_fn_packed."""
        self._validate(img, min_val, max_val)
        return self._packed(img, jnp.int32(min_val), jnp.int32(max_val))

    def batch_packed(self, imgs, min_val: int, max_val: int):
        """(B, H, W) -> (B, H, ceil(W/32)) uint32 edge bitmasks.

        The production batch path for streaming: the 64x1080p device
        output is 8.3 MB instead of 265 MB, which restores per-frame
        parity with the single-frame pipeline (benchmarks/exp_batch.py).
        """
        assert imgs.ndim == 3, "batch_packed expects (B, H, W)"
        self._validate(imgs[0], min_val, max_val)
        return self._batch_packed(imgs, jnp.int32(min_val),
                                  jnp.int32(max_val))

    def with_intermediates(self, img, min_val: int, max_val: int):
        self._validate(img, min_val, max_val)
        return self._intermediates(img, jnp.int32(min_val), jnp.int32(max_val))

    @staticmethod
    def _validate(img, min_val, max_val):
        # mirrors the reference CLI validation (src/main.cpp:63-76)
        if max_val <= min_val:
            raise ValueError("minVal must be less than maxVal")
        if not (0 <= min_val <= 255):
            raise ValueError("minVal must be in the range of [0,255]")
        if not (0 <= max_val <= 255):
            raise ValueError("maxVal must be in the range of [0,255]")
        if img.dtype != np.uint8 and img.dtype != jnp.uint8:
            raise TypeError("input image must be uint8 grayscale")
