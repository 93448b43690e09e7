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
        # elision, async tunnel).  dev_imgs is already mesh-sharded;
        # checksum_slope_seconds uses placed jax.Arrays as-is.
        from canny_edge_tpu.utils.timing import checksum_slope_seconds

        dt = checksum_slope_seconds(model._fn, dev_imgs, k1=2, k2=8)
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
