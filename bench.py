"""Headline benchmark: full-pipeline megapixels/sec/chip at 1080p.

Prints ONE JSON line to stdout:
    {"metric": ..., "value": ..., "unit": "MP/s/chip", "vs_baseline": ...}

Baseline: the reference's tiled CUDA kernels on an RTX 2070 Max-Q sum to
~1.342 ms for stages 1-3 on a 0.307 MP frame => ~229 MP/s (BASELINE.md,
derived from figures/tiling.png) — kernels only, hysteresis excluded and
run on the CPU (src/cuda.cu:436).  Our number is the *full* 4-stage
pipeline including the hysteresis fixed point, measured steady-state on
device (input resident in HBM, K chained iterations inside one jit so host
dispatch/tunnel latency is excluded; iterations are serialized by a
threshold perturbation + carry dependency so XLA cannot hoist the loop
body).

Detail lines go to stderr.
"""

import functools
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = 96 + 64 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
    img += 80 * (((xx - w / 2) ** 2 + (yy - h / 2) ** 2) < (min(h, w) / 3) ** 2)
    img += rng.normal(0, 6, size=(h, w))
    return np.clip(img, 0, 255).astype(np.uint8)


def main():
    import jax
    import jax.numpy as jnp

    from canny_edge_tpu.golden.reference import gaussian_kernel
    from canny_edge_tpu.models.canny import canny_fn

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")

    H, W = 1080, 1920
    sigma = 1.4
    K = 20
    kernel_vals = tuple(float(v) for v in gaussian_kernel(sigma))
    pipe = functools.partial(canny_fn, kernel_vals=kernel_vals,
                             hysteresis_steps=8)

    @jax.jit
    def bench_k(img, acc):
        def body(i, carry):
            acc = carry
            # iteration-dependent threshold + carry fold defeat CSE/hoisting
            out = pipe(img, jnp.int32(50) + (i % 2), jnp.int32(150))
            return acc + out[0, 0].astype(jnp.int32) + out[H // 2, W // 2].astype(jnp.int32)
        return jax.lax.fori_loop(0, K, body, acc)

    img = jax.device_put(make_image(H, W), dev)
    t0 = time.time()
    r = bench_k(img, jnp.int32(0))
    r.block_until_ready()
    log(f"compile + first run: {time.time() - t0:.1f}s")

    # steady state: best of 3 timed K-iteration runs
    times = []
    for _ in range(3):
        t0 = time.time()
        bench_k(img, jnp.int32(1)).block_until_ready()
        times.append((time.time() - t0) / K)
    per_frame = min(times)
    mps = H * W / per_frame / 1e6
    log(f"per-frame: {per_frame * 1000:.3f} ms  ({mps:.0f} MP/s)")

    baseline_mps = 229.0  # BASELINE.md derived: tiled RTX-2070 kernels
    print(json.dumps({
        "metric": "full-pipeline 1080p megapixels/sec/chip (sigma=1.4, 50/150)",
        "value": round(mps, 1),
        "unit": "MP/s/chip",
        "vs_baseline": round(mps / baseline_mps, 2),
    }))


if __name__ == "__main__":
    main()
