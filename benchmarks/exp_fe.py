"""Front-end XLA-vs-Pallas stage matrix (checksum-slope, 1080p sigma=1.4).

The production XLA front end runs at ~2.4x its ALU speed-of-light.  Two
competing explanations:
  (a) XLA materializes every multi-offset stencil operand (temp, sm, mag
      ...) in HBM — ~5 full f32 arrays x 8.3 MB round trips ~= 100 us of
      pure bandwidth at 819 GB/s, which would make the "ALU-bound" label
      wrong in practice;
  (b) the op-count floor underestimates shift/relayout ops.
A VMEM-resident Pallas kernel pays neither HBM materialization nor (in
principle) relayout overhead, yet the full Pallas front end measures
*slower* than XLA.  This experiment truncates both pipelines after each
stage to locate exactly where Mosaic loses to XLA:

  {xla,pal} x {blur, sobel (blur+grad+mag), nmsfull (complete front end)}

All Pallas bodies run maskless-interior math on the whole image in one
invocation (border strips excluded on both sides for apples-to-apples).

Usage: python benchmarks/exp_fe.py [name ...]
"""

from __future__ import annotations

import functools
import os
import sys
import time

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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from canny_edge_tpu.golden.reference import gaussian_kernel
    from canny_edge_tpu.ops.numerics import (div_by_near_one, isqrt_f32,
                                             mul_const_f32, nms_bin_masks_f32)
    from canny_edge_tpu.ops.window import _kernel_sum

    H, W = 1080, 1920
    sigma = 1.4
    kernel = np.asarray(gaussian_kernel(sigma), np.float32)
    window = kernel.shape[0]
    c = window // 2
    r = c + 2
    s = _kernel_sum(kernel)
    mp = H * W / 1e6
    sel = sys.argv[1:]

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})  {H}x{W} sigma={sigma}")
    t0 = time.time()
    np.asarray(jax.jit(lambda v: v * 2 + 1)(np.ones((8, 128), np.float32)))
    log(f"env compile init: {time.time() - t0:.0f}s")

    img_dev = jax.device_put(make_image(H, W))

    # ---- shared maskless-interior stage bodies.  All slicing is anchored
    # at the array's top-left so the same body runs on the exactly-padded
    # (H+2r, W+2r) XLA window AND the alignment-padded VMEM window (extra
    # bottom/right rows produce junk that the final (H, W) slice drops).
    # Coordinate map: input (i, j) = image (i - r, j - r); sm (ii, jj) =
    # image (ii - 2, jj - 2); gx/gy/mag (a, b) = image (a - 1, b - 1). ----

    def blur_body(x):
        hp, wp = x.shape
        wo = wp - 2 * c
        acc = jnp.zeros((hp, wo), jnp.float32)
        for t in range(window):
            acc = acc + mul_const_f32(x[:, t:t + wo], kernel[t])
        temp = div_by_near_one(acc, s)
        ho = hp - 2 * c
        acc = jnp.zeros((ho, wo), jnp.float32)
        for t in range(window):
            acc = acc + mul_const_f32(temp[t:t + ho, :], kernel[t])
        return jnp.floor(div_by_near_one(acc, s))

    def sobel_body(sm):
        two = np.float32(2)
        d = sm[:, 2:] - sm[:, :-2]
        gx = two * d[1:-1, :] + d[2:, :] + d[:-2, :]
        e = sm[2:, :] - sm[:-2, :]
        gy = two * e[:, 1:-1] + e[:, 2:] + e[:, :-2]
        mag = isqrt_f32(gx * gx + gy * gy)
        return gx, gy, mag

    def nms_body(gx, gy, mag):
        b0a, b45a, b90a, b135a = nms_bin_masks_f32(gx, gy)

        def nb(dr, dc):
            return mag[1 + dr:1 + dr + H, 1 + dc:1 + dc + W]

        m0 = nb(0, 0)
        keep0 = (m0 > nb(0, -1)) & (m0 > nb(0, 1))
        keep45 = (m0 > nb(-1, 1)) & (m0 > nb(1, -1))
        keep90 = (m0 > nb(-1, 0)) & (m0 > nb(1, 0))
        keep135 = (m0 > nb(-1, -1)) & (m0 > nb(1, 1))

        def core(b):
            return b[1:1 + H, 1:1 + W]

        keep = ((core(b0a) & keep0) | (core(b45a) & keep45)
                | (core(b90a) & keep90) | (core(b135a) & keep135))
        return jnp.where(keep, m0, np.float32(0))

    def pad_f32(x):
        return jnp.pad(x, r).astype(jnp.float32)

    # ---- XLA variants ----
    def xla_blur(x):
        return blur_body(pad_f32(x))[:H, :W].astype(jnp.int32)

    def xla_sobel(x):
        _, _, mag = sobel_body(blur_body(pad_f32(x)))
        return mag[1:1 + H, 1:1 + W].astype(jnp.int32)

    def xla_nmsfull(x):
        gx, gy, mag = sobel_body(blur_body(pad_f32(x)))
        return nms_body(gx, gy, mag).astype(jnp.int32)

    # ---- Pallas variants (whole image, one invocation, VMEM-resident) ----
    vmem = pltpu.CompilerParams(vmem_limit_bytes=112 * 1024 * 1024)

    def pallas_call_u8(body, out_shape):
        def kern(x_ref, o_ref):
            xf = x_ref[...].astype(jnp.int32).astype(jnp.float32)
            o_ref[...] = body(xf)
        H8 = -(-((H + 2 * r)) // 8) * 8
        W128 = -(-(W + 2 * r) // 128) * 128

        def run(x):
            xp = jnp.pad(x, ((r, H8 - H - r), (r, W128 - W - r)))
            return pl.pallas_call(
                kern,
                out_shape=out_shape,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=jax.default_backend() == "cpu",
                compiler_params=vmem,
            )(xp)
        return run

    i32hw = jax.ShapeDtypeStruct((H, W), jnp.int32)

    def pal_blur_body(xf):
        return blur_body(xf)[:H, :W].astype(jnp.int32)

    def pal_sobel_body(xf):
        _, _, mag = sobel_body(blur_body(xf))
        return mag[1:1 + H, 1:1 + W].astype(jnp.int32)

    def pal_nmsfull_body(xf):
        gx, gy, mag = sobel_body(blur_body(xf))
        return nms_body(gx, gy, mag).astype(jnp.int32)

    comps = {
        "xla_blur": xla_blur,
        "xla_sobel": xla_sobel,
        "xla_nmsfull": xla_nmsfull,
        "pal_blur": pallas_call_u8(pal_blur_body, i32hw),
        "pal_sobel": pallas_call_u8(pal_sobel_body, i32hw),
        "pal_nmsfull": pallas_call_u8(pal_nmsfull_body, i32hw),
    }

    for name, fn in comps.items():
        if sel and name not in sel:
            continue
        try:
            ms, cs = slope_ms(fn, img_dev)
            log(f"{name:<14} {ms:8.3f} ms  {mp / ms * 1e3:8.0f} MP/s   "
                f"wall {cs:5.1f}s")
        except Exception as e:
            log(f"{name:<14} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
