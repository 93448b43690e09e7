"""Round-3 perf attribution experiments (checksum-slope protocol).

Answers, on the real chip at 1080p sigma=1.4:
  1. What do the exact border strips cost the all-Pallas front end?
     (fe_pallas vs fe_pallas_nostrips vs the XLA static front end)
  2. Is the fused path's flood kernel inner_dilate=6 still optimal on a
     realistic NMS mask?  (sweep 2/4/6/8/10)
  3. Per-piece times of the production fused path: frontend+pack, flood,
     unpack (attribution for the roofline).

Usage: python benchmarks/exp_r3.py [name ...]
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
    from canny_edge_tpu.kernels.frontend import frontend_nm
    from canny_edge_tpu.kernels.hysteresis_packed import (
        hysteresis_packed_pallas_masks)
    from canny_edge_tpu.ops.packed import pack_mask, unpack_mask
    from canny_edge_tpu.ops.window import frontend_nm_strips, frontend_nm_xla

    H, W = 1080, 1920
    sigma = 1.4
    kernel_vals = tuple(float(v) for v in gaussian_kernel(sigma))
    window = len(kernel_vals)
    r = window // 2 + 2
    mp = H * W / 1e6
    sel = sys.argv[1:]

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})  {H}x{W} sigma={sigma}")
    t0 = time.time()
    np.asarray(jax.jit(lambda v: v * 2 + 1)(np.ones((8, 128), np.float32)))
    log(f"env compile init: {time.time() - t0:.0f}s")

    img = make_image(H, W)
    img_dev = jax.device_put(img)

    def fe_fused(x):
        w, s = frontend_nm_xla(x, kernel_vals,
                               thresholds=(jnp.int32(50), jnp.int32(150)))
        return w + s

    def fe_pallas(x):
        return frontend_nm(x, kernel_vals, interpret=False)

    def fe_pallas_nostrips(x):
        return frontend_nm(x, kernel_vals, interpret=False, border="none")

    def strips_only(x):
        nm = x.astype(jnp.int16) * jnp.int16(3)
        return frontend_nm_strips(nm, x, kernel_vals, r)

    def full_fused(x):
        w, s = frontend_nm_xla(x, kernel_vals,
                               thresholds=(jnp.int32(50), jnp.int32(150)))
        e = hysteresis_packed_pallas_masks(w, s, H, W, inner_dilate=6)
        return jnp.where(unpack_mask(e, W), jnp.int16(255), jnp.int16(0))

    def make_flood(inner):
        def flood(x):
            # realistic sparsity: derive weak/strong from the actual nm-like
            # content (x is the perturbed image, so every chain step floods
            # a different mask — no elision)
            nm = x.astype(jnp.int32) * 2
            w = pack_mask(nm >= 160)
            s = pack_mask(nm >= 400)
            e = hysteresis_packed_pallas_masks(w, s, H, W,
                                               inner_dilate=inner)
            return e
        return flood

    # ---- perf-attribution counterfactuals (NOT bit-exact at borders) ----
    import jax.numpy as jnp2
    from canny_edge_tpu.ops.numerics import (div_by_near_one, isqrt_f32,
                                             mul_const_f32)
    from canny_edge_tpu.ops.window import _kernel_sum

    kernel = np.asarray(kernel_vals, np.float32)
    c = window // 2
    s = _kernel_sum(kernel)

    def _blur(x):
        xp = jnp2.pad(x, c).astype(jnp2.float32)
        acc = jnp2.zeros((H + 2 * c, W), jnp2.float32)
        for t in range(window):
            acc = acc + mul_const_f32(xp[:, t:t + W], kernel[t])
        temp = div_by_near_one(acc, s)
        acc = jnp2.zeros((H, W), jnp2.float32)
        for t in range(window):
            acc = acc + mul_const_f32(temp[t:t + H, :], kernel[t])
        return jnp2.floor(div_by_near_one(acc, s))

    def fe_blur_only(x):
        return _blur(x).astype(jnp2.int32)

    def fe_blur_sobel(x):
        sm = jnp2.pad(_blur(x), 1, mode="edge")
        two = np.float32(2)
        d = sm[:, 2:] - sm[:, :-2]
        gx = two * d[1:-1, :] + d[2:, :] + d[:-2, :]
        e = sm[2:, :] - sm[:-2, :]
        gy = two * e[:, 1:-1] + e[:, 2:] + e[:, :-2]
        return isqrt_f32(gx * gx + gy * gy).astype(jnp2.int32)

    # ---- batch-overhead attribution (B=8; times reported per frame via
    # the mp scaling being per single frame — divide by 8 mentally or
    # compare MP/s directly) ----
    def full_fused_single(f):
        w, s = frontend_nm_xla(f, kernel_vals,
                               thresholds=(jnp.int32(50), jnp.int32(150)))
        e = hysteresis_packed_pallas_masks(w, s, H, W, inner_dilate=6)
        return jnp.where(unpack_mask(e, W), jnp.int16(255), jnp.int16(0))

    def batch8_map_full(x):
        frames = jnp.stack([jnp.roll(x, i, axis=0) for i in range(8)])
        return jax.lax.map(full_fused_single, frames).astype(jnp.int32)[0]

    def batch8_map_fe(x):
        frames = jnp.stack([jnp.roll(x, i, axis=0) for i in range(8)])

        def fe1(f):
            w, s = frontend_nm_xla(f, kernel_vals,
                                   thresholds=(jnp.int32(50),
                                               jnp.int32(150)))
            return w + s
        return jax.lax.map(fe1, frames)[0]

    comps = {
        "fe_fused": fe_fused,
        "fe_blur_only": fe_blur_only,
        "fe_blur_sobel": fe_blur_sobel,
        "fe_pallas": fe_pallas,
        "fe_pallas_nostrips": fe_pallas_nostrips,
        "strips_only": strips_only,
        "full_fused": full_fused,
        "batch8_map_full": batch8_map_full,
        "batch8_map_fe": batch8_map_fe,
    }
    for inner in (2, 4, 6, 8, 10):
        comps[f"flood_id{inner}"] = make_flood(inner)

    for name, fn in comps.items():
        if sel and name not in sel:
            continue
        try:
            if name.startswith("batch8"):
                # 8x work per chain step: shorten chains to keep device
                # programs near the ~1.5 s watchdog-safe target
                ms, cs = slope_ms(fn, img_dev, k1=12, k2=240)
                ms8 = ms / 8.0
                log(f"{name:<20} {ms8:8.3f} ms/frame "
                    f"({mp / ms8 * 1e3:8.0f} MP/s)   wall {cs:5.1f}s")
                continue
            ms, cs = slope_ms(fn, img_dev)
            log(f"{name:<20} {ms:8.3f} ms  {mp / ms * 1e3:8.0f} MP/s   "
                f"wall {cs:5.1f}s")
        except Exception as e:
            log(f"{name:<20} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
