"""Time decomposition of the fused 1080p frontend (round 4).

Measures cumulative prefixes of the frontend with the checksum-slope
protocol so each stage's marginal cost is a difference of two slope
measurements taken in the same session:

  blur      = pass-x + pass-y (+floor)          [frontend_nm_static prefix]
  +sobel    = ... + gx/gy/mag
  +nms      = ... + the max-cascade NMS (nm i32 out)
  +pack     = ... + thresholds + bit-packing (production output)
  pipeline  = ... + VMEM flood hysteresis
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from canny_edge_tpu.golden.reference import gaussian_kernel
from canny_edge_tpu.io.imageio import synthetic_image
from canny_edge_tpu.models.canny import CannyTPU
from canny_edge_tpu.ops.window import (_host_cnt, _kernel_sum,
                                       _split_div_static, frontend_nm_xla,
                                       mul_const_f32)
from canny_edge_tpu.utils.timing import checksum_slope_seconds

H, W = 1080, 1920
SIGMA = 1.4
PX = H * W


def blur_only(img, kv):
    """pass-x + pass-y of frontend_nm_static (whole-image), floor fused."""
    kernel = np.asarray(kv, np.float32)
    window = kernel.shape[0]
    c = window // 2
    r = c + 2
    s = _kernel_sum(kernel)
    x = jnp.pad(img, r).astype(jnp.float32)
    acc = jnp.zeros((x.shape[0], W), jnp.float32)
    for t in range(window):
        acc = acc + mul_const_f32(x[:, r - c + t:r - c + t + W], kernel[t])
    temp = _split_div_static(acc, _host_cnt(0, W, W, kernel), s, axis=1)
    nsm = H + 4
    t0 = r - c - 2
    acc = jnp.zeros((nsm, W), jnp.float32)
    for t in range(window):
        acc = acc + mul_const_f32(temp[t0 + t:t0 + t + nsm, :], kernel[t])
    return _split_div_static(acc, _host_cnt(-2, nsm, H, kernel), s, axis=0,
                             post=jnp.floor)


def main():
    kv = tuple(float(v) for v in gaussian_kernel(SIGMA))
    img = synthetic_image(H, W)
    model = CannyTPU(sigma=SIGMA, backend="fused")

    rows = []

    def t(name, fn):
        sec = checksum_slope_seconds(fn, img, samples=3)
        rows.append((name, sec * 1e3))
        print(f"{name:12s} {sec * 1e3:7.4f} ms", flush=True)
        return sec

    t("blur", lambda x, a, b: blur_only(x, kv) + a.astype(jnp.float32))
    t("fe->nm", lambda x, a, b: frontend_nm_xla(x, kv) + a)
    t("fe->packed", lambda x, a, b: frontend_nm_xla(
        x, kv, thresholds=(a, b))[0])
    t("pipeline", lambda x, a, b: model._single(x, a, b))

    ms = dict(rows)
    print(f"\nmarginals: blur {ms['blur']:.4f} | sobel+nms "
          f"{ms['fe->nm'] - ms['blur']:.4f} | thr+pack "
          f"{ms['fe->packed'] - ms['fe->nm']:.4f} (incl. saved nm-i32 "
          f"write) | hysteresis {ms['pipeline'] - ms['fe->packed']:.4f}")


if __name__ == "__main__":
    main()
