"""Bit-pack traffic experiment: can the frontend's threshold+pack tail
stop materializing full-size u32 arrays?

The round-3 HLO materialization audit (utils.opcount, exp_hlo_audit)
found the compiled fused frontend writes ~56.6 B/px across 47 ENTRY
instructions; four of the fourteen full-size arrays (2 u32 fusions +
2 layout copies, ~50 MB of 117 MB at 1080p) belong to the
threshold+pack tail: ``pack_mask`` reshapes to (H, Wd, 32), shifts in
u32 (4 B/px!), and reduces — and the (.., 32)-minor layout forces a
relayout copy before the reduce.

Variant ``u8pack`` stages through bytes instead: pred -> u8 (1 B/px),
reduce 8 bits into a u8 word, then a reshape+bitcast (u8[..,4] -> u32)
assembles 32-bit words with zero arithmetic.  Identical output words
(little-endian byte order; gated below), ~1/4 the pack traffic.

Run: python benchmarks/exp_pack.py

MEASURED (v5e 1080p sigma=1.4, 2026-08-19):
    fe+pack (production)  0.173 ms
    fe+u8pack             0.196 ms   <- REFUTED: the byte-staged pack's
                                        extra reshape/bitcast relayouts
                                        cost more than the 4x traffic cut
    fe nm-i16 (no pack)   0.149 ms   -> the threshold+pack tail is worth
                                        0.024 ms (14% of the frontend)
CONCLUSION: the u32 pack stays.  Moving packing into the VMEM flood
kernel would need a Mosaic cross-lane 32->1 reduction, the exact op class
exp_nms.py measured as Mosaic's weak spot; the 0.024 ms tail is the
accepted cost of never materializing nm in HBM (which the r2 A/B showed
is the better end-to-end trade).
"""

from __future__ import annotations

import os
import sys
import time

_here = os.path.dirname(os.path.abspath(__file__))
for p in (_here, os.path.dirname(_here)):
    if p not in sys.path:
        sys.path.insert(0, p)

import numpy as np

from profile_components import enable_compile_cache, make_image  # noqa: E402


def log(*a):
    print(*a, flush=True)


def pack_mask_u8(mask):
    """Byte-staged bit pack; bit-identical words to ops.packed.pack_mask."""
    import jax
    import jax.numpy as jnp

    h, w = mask.shape[-2], mask.shape[-1]
    wd = -(-w // 32)
    if wd * 32 != w:
        mask = jnp.pad(mask, [(0, 0)] * (mask.ndim - 1) + [(0, wd * 32 - w)])
    u8 = mask.astype(jnp.uint8)
    g8 = u8.reshape(*mask.shape[:-1], wd * 4, 8)
    s8 = jnp.arange(8, dtype=jnp.uint8)
    b = jnp.sum(g8 << s8, axis=-1, dtype=jnp.uint8)
    return jax.lax.bitcast_convert_type(
        b.reshape(*mask.shape[:-1], wd, 4), jnp.uint32)


def main():
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from canny_edge_tpu.golden.reference import gaussian_kernel
    from canny_edge_tpu.ops import packed
    from canny_edge_tpu.ops.window import frontend_nm_xla
    from canny_edge_tpu.utils.timing import checksum_slope_seconds

    H, W = 1080, 1920
    kv = tuple(float(v) for v in gaussian_kernel(1.4))
    img = make_image(H, W)
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}  {H}x{W} sigma=1.4")

    def fe(x, mn, mx):
        w, s = frontend_nm_xla(x, kv, thresholds=(mn, mx))
        return w + s

    def fe_nm(x, mn, mx):   # no pack: lower bound reference
        return frontend_nm_xla(x, kv).astype(jnp.int16) + mn.astype(jnp.int16)

    orig = packed.pack_mask
    # correctness gate on this backend (bitcast byte order)
    a = np.asarray(jax.jit(fe)(img, jnp.int32(30), jnp.int32(90)))
    packed.pack_mask = pack_mask_u8
    try:
        b = np.asarray(jax.jit(fe)(img, jnp.int32(30), jnp.int32(90)))
        assert (a == b).all(), "u8pack diverges on this backend!"
        log("gate: u8pack bit-identical on this backend")
        t0 = time.time()
        sec = checksum_slope_seconds(fe, img, samples=3)
        log(f"fe+u8pack   {sec * 1e3:7.3f} ms  wall {time.time() - t0:.0f}s")
    finally:
        packed.pack_mask = orig
    t0 = time.time()
    sec = checksum_slope_seconds(fe, img, samples=3)
    log(f"fe+pack     {sec * 1e3:7.3f} ms  wall {time.time() - t0:.0f}s")
    t0 = time.time()
    sec = checksum_slope_seconds(fe_nm, img, samples=3)
    log(f"fe nm-i16   {sec * 1e3:7.3f} ms  wall {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
