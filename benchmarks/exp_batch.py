"""Batch-throughput gap attribution (VERDICT r2 weak #3 / item 6).

Round 2 recorded batch-64 1080p at 8,897 MP/s vs 10,213 single-frame
(-13%) while claiming the lax.map wrapper costs ~4%.  This experiment
separates the candidates, all on the fused backend at 1080p sigma=1.4:

  * content variance — the run_all batch uses 4 distinct images tiled,
    the single-frame config a different image; flood round counts are
    content-dependent.  Measured here by timing batches of B COPIES of
    the single-frame image (identical per-frame work by construction).
  * lax.map wrapper cost — per-frame time vs B for identical content.
  * per-frame checksum/dispatch — the measurement protocol itself.

Usage: python benchmarks/exp_batch.py

MEASURED + ATTRIBUTED (v5e, 2026-08-19):
  B=1 0.201 ms/fr; copies B=4/16/32/48 0.206-0.213; B=64 0.229;
  B=64 distinct == B=64 copies (0.229) -> content variance: ZERO.
  Threshold-only chain (no input perturbation): single 0.201, B=16
  0.202 (parity!), B=64 0.223 -> the input-roll in the default protocol
  adds ~0.006/frame at the 132 MB batch footprint (protocol artifact,
  not pipeline).
  Small-output variant (per-frame checksum rows instead of the (B,H,W)
  int16 stack): B=64 0.200 ms/frame == single-frame parity.
=> The whole residual gap is materializing the 265 MB stacked int16
   output buffer (~5x write amplification vs the 4.1 MB/frame raw
   bytes); lax.map itself and the per-frame programs are at parity.
   Production guidance: stream in <=32-frame device batches (the CLI
   default of small batches is already right); the 13% figure in
   round-2 artifacts was protocol + output-stack, not pipeline.
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

from profile_components import enable_compile_cache, make_image  # noqa: E402


def log(*a):
    print(*a, flush=True)


def main():
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from canny_edge_tpu.golden.reference import gaussian_kernel
    from canny_edge_tpu.models.canny import canny_fn, canny_fn_batched
    from canny_edge_tpu.utils.timing import checksum_slope_seconds

    H, W = 1080, 1920
    sigma = 1.4
    kv = tuple(float(v) for v in gaussian_kernel(sigma))
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}  {H}x{W} sigma={sigma} backend=fused")

    img = make_image(H, W)
    single = functools.partial(canny_fn, kernel_vals=kv, backend="fused",
                               hysteresis_steps=8)
    t0 = time.time()
    s1 = checksum_slope_seconds(single, img, samples=3)
    log(f"B=1 (single program)     {s1 * 1e3:7.3f} ms/frame  "
        f"({H * W / s1 / 1e6:6.0f} MP/s)  wall {time.time() - t0:.0f}s")

    batched = functools.partial(canny_fn_batched, kernel_vals=kv,
                                backend="fused", hysteresis_steps=8)
    for B in (4, 16, 64):
        # identical content per frame: any per-frame slowdown vs B=1 is
        # the batching machinery, not the workload
        bat = np.broadcast_to(img, (B, H, W)).copy()
        t0 = time.time()
        sec = checksum_slope_seconds(batched, bat, samples=3)
        per = sec / B
        log(f"B={B:<3} (lax.map, copies)  {per * 1e3:7.3f} ms/frame  "
            f"({H * W / per / 1e6:6.0f} MP/s)  wall {time.time() - t0:.0f}s")

    # the run_all workload: 4 distinct images tiled — content variance
    B = 64
    four = np.stack([make_image(H, W, seed=i) for i in range(4)])
    bat = np.tile(four, (B // 4, 1, 1))
    t0 = time.time()
    sec = checksum_slope_seconds(batched, bat, samples=3)
    per = sec / B
    log(f"B=64 (4 distinct tiled)  {per * 1e3:7.3f} ms/frame  "
        f"({H * W / per / 1e6:6.0f} MP/s)  wall {time.time() - t0:.0f}s")

    # round-4 fix: packed output (the 265 MB stacked int16 buffer blamed
    # above becomes 8.3 MB of bitmasks).  Measured 2026-08-19 on v5e:
    # B=1 int16 0.198 / B=1 packed 0.182 / B=16 packed 0.184 / B=64
    # packed 0.188 ms/frame — batch parity restored (and better than the
    # single-frame int16 pipeline, which pays the unpack tail).
    from canny_edge_tpu.models.canny import canny_fn_packed

    def batched_packed(imgs, mn, mx):
        return jax.lax.map(
            lambda f: canny_fn_packed(f, mn, mx, kernel_vals=kv), imgs)

    for B in (16, 64):
        bat = np.tile(four, (B // 4, 1, 1))
        t0 = time.time()
        sec = checksum_slope_seconds(batched_packed, bat, samples=3)
        per = sec / B
        log(f"B={B:<3} (packed output)   {per * 1e3:7.3f} ms/frame  "
            f"({H * W / per / 1e6:6.0f} MP/s)  wall {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
