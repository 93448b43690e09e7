"""Round-4: cost of the packed->int16 unpack tail, and cheaper variants.

The fused pipeline's hysteresis marginal (0.047 ms at 1080p,
benchmarks/exp_decomp.py) exceeds the flood kernel's own ~0.028 ms: the
rest is the XLA unpack (broadcast-shift staging + lane reshape) and the
int16 output write.  Variants:

  packed   -- pipeline stops at the packed edge mask (no unpack): the
              floor, and the production path for the packed batch API.
  current  -- jnp.where(unpack_mask(edges), 255, 0)  (reshape relayout)
  repeat   -- per-lane variable shift of a 32x repeated word vector
              (no (H, Wd, 32) staging, no reshape)
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from canny_edge_tpu.golden.reference import gaussian_kernel
from canny_edge_tpu.io.imageio import synthetic_image
from canny_edge_tpu.kernels.hysteresis_packed import (
    hysteresis_packed_pallas_masks)
from canny_edge_tpu.ops.packed import unpack_mask
from canny_edge_tpu.ops.window import frontend_nm_xla
from canny_edge_tpu.utils.timing import checksum_slope_seconds

H, W = 1080, 1920
SIGMA = 1.4
PX = H * W


def unpack_repeat_i16(packed, w: int):
    """packed (H, Wd) u32 -> (H, w) int16 {0,255} without a lane reshape.

    Each output lane reads its word via a 32x repeat and extracts its own
    bit with a per-lane shift from an iota — one broadcast + one variable
    shift + compare, instead of the (H, Wd, 32) staging + (H, Wd*32)
    reshape relayout of unpack_mask.
    """
    wd = packed.shape[-1]
    rep = jnp.repeat(packed, 32, axis=-1)[..., :w]
    lane = jax.lax.broadcasted_iota(jnp.uint32, rep.shape, rep.ndim - 1)
    bit = (rep >> (lane & jnp.uint32(31))) & jnp.uint32(1)
    return jnp.where(bit != 0, jnp.int16(255), jnp.int16(0))


def main():
    kv = tuple(float(v) for v in gaussian_kernel(SIGMA))
    img = synthetic_image(H, W)

    def to_packed(x, a, b):
        weak_p, strong_p = frontend_nm_xla(x, kv, thresholds=(a, b))
        return hysteresis_packed_pallas_masks(weak_p, strong_p, H, W)

    def full_current(x, a, b):
        e = to_packed(x, a, b)
        return jnp.where(unpack_mask(e, W), jnp.int16(255), jnp.int16(0))

    def full_repeat(x, a, b):
        return unpack_repeat_i16(to_packed(x, a, b), W)

    # equality check on device
    dev = jax.device_put(img)
    mn, mx = jnp.int32(30), jnp.int32(90)
    a = np.asarray(jax.jit(full_current)(dev, mn, mx))
    b = np.asarray(jax.jit(full_repeat)(dev, mn, mx))
    assert (a == b).all(), "repeat unpack mismatch!"
    print("repeat unpack == current: OK", flush=True)

    for name, fn in [("packed", to_packed), ("current", full_current),
                     ("repeat", full_repeat)]:
        sec = checksum_slope_seconds(fn, img, samples=3)
        print(f"{name:8s} {sec * 1e3:7.4f} ms", flush=True)


if __name__ == "__main__":
    main()
