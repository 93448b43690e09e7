"""Band-decomposition experiment for the XLA front end (checksum-slope).

ops/window.py notes that XLA:TPU per-pixel stencil cost grows superlinearly
with program height (30.6 GP/s at 540x1920 vs ~13.5 effective at 1080x1920),
yet production runs 1080p as ONE whole-image program because the *banded*
formulation (jnp.stack of band windows + lax.map) measured slower — its
overhead, not the band programs, lost.  This experiment measures a third
formulation: every band is its own independent static program on a slice of
one shared padded image — no stack, no map, no per-iteration copies — and
the packed-mask outputs concatenate (tiny: 60 uint32 words per row).

Variants (1080p and 4K, thresholds fused so outputs are packed masks):
  fe_whole       current production single program
  fe_bandsK      K independent static band programs (no map)
  full_bandsK    fe_bandsK + VMEM flood (the production pipeline shape)
  fe_b540_alone  single 540x1920 program on a 540-row image (sanity check
                 of the 30.6 GP/s small-program claim)

Usage: python benchmarks/exp_bands.py [name ...]   (from benchmarks/)
"""

from __future__ import annotations

import os
import sys
import time

# run from anywhere: make both benchmarks/ and the repo root importable
# (do NOT touch PYTHONPATH here — the axon TPU plugin lives on it)
_here = os.path.dirname(os.path.abspath(__file__))
for p in (_here, os.path.dirname(_here)):
    if p not in sys.path:
        sys.path.insert(0, p)

import numpy as np

from profile_components import make_image, slope_ms  # noqa: E402


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from canny_edge_tpu.golden.reference import gaussian_kernel
    from canny_edge_tpu.kernels.hysteresis_packed import (
        hysteresis_packed_pallas_masks)
    from canny_edge_tpu.ops.packed import unpack_mask
    from canny_edge_tpu.ops.window import cdiv, frontend_nm_static

    sigma = 1.4
    kernel_vals = tuple(float(v) for v in gaussian_kernel(sigma))
    window = len(kernel_vals)
    r = window // 2 + 2
    sel = sys.argv[1:]

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform}) sigma={sigma}")
    t0 = time.time()
    np.asarray(jax.jit(lambda v: v * 2 + 1)(np.ones((8, 128), np.float32)))
    log(f"env compile init: {time.time() - t0:.0f}s")

    TH = (jnp.int32(50), jnp.int32(150))

    def fe_bands(x, H, W, band_h):
        """Independent static band programs; returns packed masks (H, Wd)."""
        nb = cdiv(H, band_h)
        hp = nb * band_h
        padded = jnp.pad(x, ((r, hp - H + r), (r, r))).astype(jnp.float32)
        outs = [frontend_nm_static(
            padded[i * band_h:i * band_h + band_h + 2 * r, :],
            i * band_h, band_h, H, W, kernel_vals, thresholds=TH)
            for i in range(nb)]
        weak = jnp.concatenate([o[0] for o in outs], axis=0)[:H]
        strong = jnp.concatenate([o[1] for o in outs], axis=0)[:H]
        return weak, strong

    def runner_fe_whole(H, W):
        def f(x):
            padded = jnp.pad(x, r).astype(jnp.float32)
            w, s = frontend_nm_static(padded, 0, H, H, W, kernel_vals,
                                      thresholds=TH)
            return w + s
        return f

    def runner_fe_bands(H, W, band_h):
        def f(x):
            w, s = fe_bands(x, H, W, band_h)
            return w + s
        return f

    def runner_full_bands(H, W, band_h):
        def f(x):
            w, s = fe_bands(x, H, W, band_h)
            e = hysteresis_packed_pallas_masks(w, s, H, W, inner_dilate=6)
            return jnp.where(unpack_mask(e, W), jnp.int16(255), jnp.int16(0))
        return f

    comps = {}
    # 1080p
    comps["fe_whole_1080"] = (1080, 1920, runner_fe_whole(1080, 1920))
    for bh in (360, 544, 272):
        comps[f"fe_bands{bh}_1080"] = (1080, 1920,
                                       runner_fe_bands(1080, 1920, bh))
    comps["full_bands544_1080"] = (1080, 1920,
                                   runner_full_bands(1080, 1920, 544))
    comps["full_bands360_1080"] = (1080, 1920,
                                   runner_full_bands(1080, 1920, 360))
    # small-program sanity check
    comps["fe_b540_alone"] = (540, 1920, runner_fe_whole(540, 1920))
    comps["fe_b360_alone"] = (360, 1920, runner_fe_whole(360, 1920))
    # 4K
    for bh in (360, 544, 720):
        comps[f"fe_bands{bh}_4k"] = (2160, 3840,
                                     runner_fe_bands(2160, 3840, bh))
    comps["full_bands544_4k"] = (2160, 3840,
                                 runner_full_bands(2160, 3840, 544))

    imgs = {}
    for name, (H, W, fn) in comps.items():
        if sel and name not in sel:
            continue
        if (H, W) not in imgs:
            imgs[(H, W)] = jax.device_put(make_image(H, W))
        mp = H * W / 1e6
        try:
            ms, cs = slope_ms(fn, imgs[(H, W)])
            log(f"{name:<22} {ms:8.3f} ms  {mp / ms * 1e3:8.0f} MP/s   "
                f"wall {cs:5.1f}s")
        except Exception as e:
            log(f"{name:<22} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
