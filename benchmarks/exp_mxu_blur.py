"""MXU-blur experiment log: why the blur stays on the VPU.

VERDICT r2 item 3 proposed reformulating the separable blur as a banded
matrix multiply on the MXU (bf16 hi/lo weight splitting, f32 accumulate).
Two independent findings kill it:

1. EXACTNESS (analytic).  The bit-exactness contract is *sequential
   tap-ordered float32 rounding*: acc = fl(fl(acc + fl(x_t * k_t)))
   (src/utils.cpp:41-47 — each product rounded to f32, each partial sum
   rounded to f32, in tap order).  An MXU contraction computes
   round(sum_t x_t * k_t) with exact products and one (or tree-ordered)
   accumulation — a DIFFERENT quantity at the LSB.  Limb decomposition
   cannot bridge this: splitting k into 8-bit limbs makes each partial
   matmul exact (8b x 8b products, <=20-bit sums), but recombining the
   exact limb sums yields the correctly rounded full sum, not the
   tap-order-rounded chain the golden model (and the C++ reference)
   defines.  There is no MXU formulation of "round after every tap".

2. THROUGHPUT (measured below).  Even ignoring exactness, a dense banded
   matmul does W/window ~= 175x the FLOPs of the stencil at 1080p
   (window 11): blur-x as (1088, 1942) @ (1942, 1920) is ~8.1 GFLOP vs
   ~45 MFLOP-equivalent for the VPU tap chain.  At v5e's ~197 bf16
   TFLOP/s that is ~41 us *minimum* per pass — worse than the measured
   VPU pass — and a block-banded decomposition that avoids the waste
   degenerates into many tiny matmuls that cannot fill the 128x128
   systolic array.

Run:  python benchmarks/exp_mxu_blur.py
Prints the measured MXU dense-banded blur-x time vs the VPU stencil
blur-x time (both non-border, single pass, 1080p sigma=1.4).

MEASURED (v5e, 2026-08-19):  mxu_dot 0.075 ms/pass vs vpu_taps 0.052
ms/pass — the MXU formulation loses on throughput alone, before the
exactness impossibility.  CONCLUSION: the blur's VPU formulation is
structural; item closed as 'bound is structural' per VERDICT r2 item 3.
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


def main():
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from canny_edge_tpu.golden.reference import gaussian_kernel
    from canny_edge_tpu.ops.numerics import mul_const_f32
    from canny_edge_tpu.utils.timing import checksum_slope_seconds

    H, W = 1080, 1920
    sigma = 1.4
    kernel = np.asarray(gaussian_kernel(sigma), np.float32)
    window = kernel.shape[0]
    c = window // 2
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}  {H}x{W} sigma={sigma} window={window}")

    img = make_image(H, W)
    Wp = W + 2 * c

    # banded blur-x matrix: M[j + t, j] = kernel[t]
    M = np.zeros((Wp, W), np.float32)
    for j in range(W):
        M[j:j + window, j] += kernel
    M_bf16 = jnp.asarray(M, jnp.bfloat16)

    def mxu_blur_x(x, mn, mx):
        xp = jnp.pad(x, ((0, 0), (c, c))).astype(jnp.bfloat16)
        return jnp.dot(xp, M_bf16,
                       preferred_element_type=jnp.float32)

    def vpu_blur_x(x, mn, mx):
        xp = jnp.pad(x, ((0, 0), (c, c))).astype(jnp.float32)
        acc = jnp.zeros((H, W), jnp.float32)
        for t in range(window):
            acc = acc + mul_const_f32(xp[:, t:t + W], kernel[t])
        return acc

    for name, fn in (("mxu_dot", mxu_blur_x), ("vpu_taps", vpu_blur_x)):
        t0 = time.time()
        sec = checksum_slope_seconds(fn, img, samples=3)
        log(f"{name:<10} {sec * 1e3:7.3f} ms/pass   "
            f"wall {time.time() - t0:4.0f}s")


if __name__ == "__main__":
    main()
