"""Weak-scaling benchmark: throughput per device as the mesh grows.

Usage:  python benchmarks/weak_scaling.py [--platform cpu|tpu] [--work 128]

Each scale processes a workload proportional to its device count (weak
scaling): a batch of B = devices frames of fixed size, block-partitioned as
(data, y, x).  Efficiency at scale N = (throughput_N / N) / throughput_1.
On the 8-device virtual CPU mesh this validates the sharded pipeline's
scaling *behavior* (collective overhead visibility); real ICI numbers
require a pod slice — the same script runs unchanged there.

The BASELINE.json target is >=80% weak-scaling efficiency.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--work", type=int, default=256,
                    help="frame edge length per device tile")
    ap.add_argument("--frames-per-device", type=int, default=2)
    args = ap.parse_args()

    if args.platform == "cpu":
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from canny_edge_tpu.io import synthetic_image
    from canny_edge_tpu.parallel import ShardedCanny, make_mesh

    ndev = len(jax.devices())
    scales = [n for n in (1, 2, 4, 8, 16, 32) if n <= ndev]
    results = []
    base_tput = None
    for n in scales:
        devices = jax.devices()[:n]
        # spatial-only mesh: 4K-image-style block partition
        ny = 1
        for y in range(1, int(n ** 0.5) + 1):
            if n % y == 0:
                ny = y
        nx = n // ny
        mesh = make_mesh(devices, data=1, y=ny, x=nx)
        H, W = args.work * ny, args.work * nx
        model = ShardedCanny(mesh, sigma=1.4, image_shape=(H, W),
                             hysteresis_steps=4)
        B = args.frames_per_device
        imgs = np.stack([synthetic_image(H, W, seed=i) for i in range(B)])
        dev_imgs = model.shard_batch(imgs)

        # checksum-slope protocol (DESIGN.md §4): plain block_until_ready
        # wall timing is untrustworthy in this environment (execution
        # elision, async tunnel) — chain K data-dependent runs on device and
        # take the slope between two chain lengths.
        def chain(k):
            @jax.jit
            def run(x0, seed):
                def body(i, carry):
                    chk, x = carry
                    x2 = jnp.roll(x, chk % 7 + i, axis=1) ^ (
                        (chk + i) % 5).astype(jnp.uint8)
                    out = model._fn(x2, jnp.int32(30) + (chk % 3),
                                    jnp.int32(90))
                    chk2 = (chk * jnp.int32(16777619)
                            + jnp.sum(out[:, ::31, ::37].astype(jnp.int32))
                            ) & jnp.int32(0x7FFFFFFF)
                    return chk2, x
                chk, _ = jax.lax.fori_loop(0, k, body, (seed, x0))
                return chk
            return run

        k1, k2 = 2, 8
        r1, r2 = chain(k1), chain(k2)
        int(np.asarray(r1(dev_imgs, jnp.int32(1))))      # compile
        int(np.asarray(r2(dev_imgs, jnp.int32(1))))
        slopes = []
        for s in (2, 3, 4):
            t0 = time.perf_counter()
            c1 = int(np.asarray(r1(dev_imgs, jnp.int32(s))))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            c2 = int(np.asarray(r2(dev_imgs, jnp.int32(s))))
            t2 = time.perf_counter() - t0
            assert c1 != c2, "identical checksums: execution elision suspected"
            slopes.append((t2 - t1) / (k2 - k1))
        dt = float(np.median(slopes))
        tput = imgs.size / dt / 1e6          # MP/s total
        per_dev = tput / n
        if base_tput is None:
            base_tput = per_dev
        eff = per_dev / base_tput
        results.append({"devices": n, "mesh": [1, ny, nx],
                        "image": [H, W], "mp_per_s": round(tput, 1),
                        "mp_per_s_per_device": round(per_dev, 1),
                        "efficiency": round(eff, 3)})
        print(f"n={n} mesh=1x{ny}x{nx} {H}x{W}: {tput:.1f} MP/s "
              f"({per_dev:.1f}/dev, eff {eff:.2f})", file=sys.stderr)

    print(json.dumps({"platform": jax.default_backend(),
                      "results": results}, indent=1))


if __name__ == "__main__":
    main()
