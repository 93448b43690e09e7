"""Weak-scaling benchmark: workload grows with the mesh.

Usage:  python benchmarks/weak_scaling.py [--platform cpu|tpu] [--work 256]

Each scale processes a workload proportional to its device count (weak
scaling): B frames of (work*ny, work*nx), block-partitioned over a
(1, ny, nx) spatial mesh (the 4K-over-ICI BASELINE configuration shape).

Metrics — and what each one means on which platform:

* ``total_mp_per_s`` — end-to-end throughput of the whole mesh.
* ``efficiency`` — classic weak-scaling efficiency
  (per-device throughput at N) / (per-device throughput at 1).
  **Only meaningful on real hardware** where every device is its own
  chip.  On a virtual CPU mesh (``--xla_force_host_platform_device_count``)
  all "devices" share one host compute thread pool: one virtual device
  already saturates the host, so per-device efficiency is ~1/N *by
  construction* and says nothing about the algorithm.
* ``overhead_ratio`` — total_mp_per_s(N) / total_mp_per_s(1).  The
  honest weak-scaling proxy a shared-host virtual mesh CAN measure: the
  host does N× the work in N× the time iff the distributed machinery
  (halo ppermutes, border-class switch, flood rounds + psum termination)
  adds no extra compute.  The BASELINE >=80% efficiency target maps to
  overhead_ratio >= 0.8 here.  Ratios *above* 1.0 are fixed-cost
  amortization, not magic: throughput of the UNSHARDED single-device
  engine also grows with frame area (see ``single_engine_mp_per_s``),
  because small frames underfill the vector units and pay fixed flood
  rounds.  The size-controlled overhead measure is therefore
* ``vs_single_engine`` — total_mp_per_s / single_engine_mp_per_s at the
  SAME global image on ONE device (the unsharded engine family the mesh
  build composes: XLA frontend + packed flood).  This is the per-scale
  cost of the distributed machinery with frame-size effects cancelled
  (VERDICT r3 weak #6: the cross-scale overhead_ratio conflated the two).
* ``no_edge_mp_per_s`` — same program with thresholds that produce no
  seeds (thresholds are traced, so this is the identical executable):
  bounds the cost of hysteresis convergence rounds separately from the
  frontend + exchange cost.  Must be >= total within noise; both carry
  ``*_spread_pct`` (max-min over median of the slope samples) so an
  apparent inversion can be judged against the noise floor.

Real ICI efficiency numbers require a pod slice; this script runs
unchanged there (drop --platform cpu) and the efficiency column becomes
the real thing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spread_pct(samples):
    med = float(np.median(samples))
    return round(100.0 * (max(samples) - min(samples)) / med, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--work", type=int, default=256,
                    help="frame edge length per device tile")
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--samples", type=int, default=7)
    args = ap.parse_args()

    if args.platform == "cpu":
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import functools

    from canny_edge_tpu.golden.reference import gaussian_kernel
    from canny_edge_tpu.io import synthetic_image
    from canny_edge_tpu.models.canny import canny_fn_batched
    from canny_edge_tpu.parallel import ShardedCanny, make_mesh
    from canny_edge_tpu.utils.timing import checksum_slope_seconds

    ndev = len(jax.devices())
    on_cpu = jax.default_backend() == "cpu"
    virtual = (on_cpu and "xla_force_host_platform_device_count"
               in os.environ.get("XLA_FLAGS", ""))
    # the single-device engine family the mesh build composes per shard:
    # XLA static frontend + packed flood on CPU meshes, + VMEM flood on TPU
    single_backend = "xla" if on_cpu else "fused"
    kernel_vals = tuple(float(v) for v in gaussian_kernel(1.4))
    # planning throughput for chain sizing (total chain ~1.5 s per call)
    plan_mps = 8e6 if on_cpu else 6e9

    def slope(fn, dev_imgs, pixels, mn, mx):
        k2 = int(np.clip(1.5 / (pixels / plan_mps), 8, 400))
        k1 = max(2, k2 // 8)
        return checksum_slope_seconds(fn, dev_imgs, k1=k1, k2=k2,
                                      samples=args.samples, min_val=mn,
                                      max_val=mx, return_samples=True)

    scales = [n for n in (1, 2, 4, 8, 16, 32) if n <= ndev]
    results = []
    base_total = None
    base_per_dev = None
    for n in scales:
        devices = jax.devices()[:n]
        ny = 1
        for y in range(1, int(n ** 0.5) + 1):
            if n % y == 0:
                ny = y
        nx = n // ny
        mesh = make_mesh(devices, data=1, y=ny, x=nx)
        H, W = args.work * ny, args.work * nx
        model = ShardedCanny(mesh, sigma=1.4, image_shape=(H, W))
        imgs = np.stack([synthetic_image(H, W, seed=i)
                         for i in range(args.frames)])
        dev_imgs = model.shard_batch(imgs)

        # checksum-slope protocol (DESIGN.md §4): plain block_until_ready
        # wall timing is untrustworthy in this environment (execution
        # elision, async dispatch); dev_imgs is already mesh-sharded and
        # used as-is.
        s_tot = slope(model._fn, dev_imgs, imgs.size, 30, 90)
        s_ne = slope(model._fn, dev_imgs, imgs.size, 250, 253)
        # the same global image through the UNSHARDED single-device engine
        # (one device, whole image): the size-controlled reference
        single = jax.jit(functools.partial(
            canny_fn_batched, kernel_vals=kernel_vals,
            backend=single_backend))
        s_one = slope(lambda x, a, b: single(x, a, b),
                      jax.device_put(imgs, jax.devices()[0]), imgs.size,
                      30, 90)
        dt, dt_ne, dt_one = (float(np.median(s))
                             for s in (s_tot, s_ne, s_one))
        total = imgs.size / dt / 1e6
        per_dev = total / n
        one = imgs.size / dt_one / 1e6
        if base_total is None:
            base_total, base_per_dev = total, per_dev
        row = {"devices": n, "mesh": [1, ny, nx], "image": [H, W],
               "engine": model.engine, "flood": model.flood,
               "total_mp_per_s": round(total, 1),
               "total_spread_pct": _spread_pct(s_tot),
               "mp_per_s_per_device": round(per_dev, 1),
               "efficiency": round(per_dev / base_per_dev, 3),
               "overhead_ratio": round(total / base_total, 3),
               "single_engine_mp_per_s": round(one, 1),
               "single_engine_spread_pct": _spread_pct(s_one),
               "vs_single_engine": round(total / one, 3),
               "no_edge_mp_per_s": round(imgs.size / dt_ne / 1e6, 1),
               "no_edge_spread_pct": _spread_pct(s_ne),
               "no_edge_inverted": bool(imgs.size / dt_ne / 1e6 < total)}
        results.append(row)
        print(f"n={n} mesh=1x{ny}x{nx} {H}x{W} [{model.engine}/"
              f"{model.flood}]: {total:.1f} MP/s total (spread "
              f"{row['total_spread_pct']}%), single-engine {one:.1f}, "
              f"vs_single {row['vs_single_engine']:.2f}, no-edge "
              f"{row['no_edge_mp_per_s']:.1f} (spread "
              f"{row['no_edge_spread_pct']}%)",
              file=sys.stderr)

    out = {
        "platform": jax.default_backend(),
        "virtual_mesh": virtual,
        "host_cpu_count": os.cpu_count(),
        "single_engine_backend": single_backend,
        "samples": args.samples,
        "metric_semantics": (
            "virtual mesh: all devices share one host thread pool, so "
            "'efficiency' is ~1/N by construction; 'overhead_ratio' "
            "(total throughput vs 1 device at Nx work) is the cross-scale "
            "weak-scaling proxy (>=0.8 maps to the BASELINE >=80% target) "
            "but conflates frame-size effects; 'vs_single_engine' divides "
            "them out by referencing the unsharded single-device engine on "
            "the SAME image. On real multi-chip hardware 'efficiency' is "
            "the real weak-scaling efficiency." if virtual else
            "real devices: 'efficiency' is true weak-scaling efficiency"),
        "results": results,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
