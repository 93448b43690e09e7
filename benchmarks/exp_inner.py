"""Tune inner_dilate of the transposed VMEM flood on the REAL pipeline
(realistic NMS sparsity), plus frontend attribution (checksum-slope)."""
from __future__ import annotations
import os, sys, time
_here = os.path.dirname(os.path.abspath(__file__))
for p in (_here, os.path.dirname(_here)):
    if p not in sys.path:
        sys.path.insert(0, p)
import numpy as np
from profile_components import make_image, slope_ms


def main():
    import jax
    import jax.numpy as jnp
    from canny_edge_tpu.golden.reference import gaussian_kernel
    from canny_edge_tpu.kernels.hysteresis_packed import (
        hysteresis_packed_pallas_masks)
    from canny_edge_tpu.ops.packed import unpack_mask
    from canny_edge_tpu.ops.window import frontend_nm_xla

    H, W = 1080, 1920
    sigma = 1.4
    kernel_vals = tuple(float(v) for v in gaussian_kernel(sigma))
    mp = H * W / 1e6
    sel = sys.argv[1:]
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    t0 = time.time()
    np.asarray(jax.jit(lambda v: v * 2 + 1)(np.ones((8, 128), np.float32)))
    print(f"env compile init: {time.time() - t0:.0f}s", flush=True)
    img_dev = jax.device_put(make_image(H, W))

    def make_full(inner):
        def f(x):
            w, s = frontend_nm_xla(x, kernel_vals,
                                   thresholds=(jnp.int32(50), jnp.int32(150)))
            e = hysteresis_packed_pallas_masks(w, s, H, W, inner_dilate=inner)
            return jnp.where(unpack_mask(e, W), jnp.int16(255), jnp.int16(0))
        return f

    comps = {f"full_id{k}": make_full(k) for k in (4, 6, 8, 10, 14)}
    for name, fn in comps.items():
        if sel and name not in sel:
            continue
        ms, cs = slope_ms(fn, img_dev)
        print(f"{name:<12} {ms:8.3f} ms  {mp / ms * 1e3:8.0f} MP/s   "
              f"wall {cs:5.1f}s", flush=True)


if __name__ == "__main__":
    main()
