"""Transposed packed-flood layout experiment (checksum-slope).

At 1080p the packed hysteresis masks are (1080, 60) uint32 — only 60 of
each (8, 128) VPU tile's lanes carry data, so every bit op in the VMEM
flood kernel wastes ~53% of the machine.  Transposing the layout to
(Wd, H) = (60, 1080) fills the tiles (~88% utilization: 60->64 sublanes,
1080->1152 lanes) at the cost of moving the word-carry shifts to the
sublane axis and the row shifts to the lane axis.

First measured 2026-08-18 (v5e, same process, incl. the two XLA
transposes around the kernel): 1080p 0.127 -> 0.069 ms (1.84x),
4K 0.254 -> 0.219 ms (1.16x), bit-identical — after which "transposed"
became the production default (kernels/hysteresis_packed.py) and this
script A/Bs the two layouts of the production entry point.

Usage: python benchmarks/exp_flood_t.py [flood_rows|flood_t ...]
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

    from canny_edge_tpu.kernels.hysteresis_packed import (
        hysteresis_packed_pallas_masks)
    from canny_edge_tpu.ops.packed import pack_mask

    sel = sys.argv[1:]

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")
    t0 = time.time()
    np.asarray(jax.jit(lambda v: v * 2 + 1)(np.ones((8, 128), np.float32)))
    log(f"env compile init: {time.time() - t0:.0f}s")

    for H, W in ((1080, 1920), (2160, 3840)):
        img = make_image(H, W)
        img_dev = jax.device_put(img)
        mp = H * W / 1e6

        def masks_from(x):
            nm = x.astype(jnp.int32) * 2
            return pack_mask(nm >= 160), pack_mask(nm >= 400)

        def flood_rows(x):
            w, s = masks_from(x)
            return hysteresis_packed_pallas_masks(w, s, H, W,
                                                  inner_dilate=6,
                                                  layout="rows")

        def flood_t(x):
            w, s = masks_from(x)
            return hysteresis_packed_pallas_masks(w, s, H, W,
                                                  inner_dilate=6,
                                                  layout="transposed")

        # correctness first
        a = np.asarray(jax.jit(flood_rows)(img_dev))
        b = np.asarray(jax.jit(flood_t)(img_dev))
        eq = "OK" if (a == b).all() else "MISMATCH!"
        log(f"[{H}x{W}] equality: {eq}")

        for name, fn in (("flood_rows", flood_rows), ("flood_t", flood_t)):
            if sel and name not in sel:
                continue
            ms, cs = slope_ms(fn, img_dev)
            log(f"[{H}x{W}] {name:<12} {ms:8.3f} ms  "
                f"{mp / ms * 1e3:8.0f} MP/s   wall {cs:5.1f}s")


if __name__ == "__main__":
    main()
