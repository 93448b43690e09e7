"""Sweep the frontend HBM-restructure knobs (exp_hbm.py companion).

Times the fused 1080p frontend for every combination of:
  * div-stitch via concat on {none, axis0, axis1, both}
  * padded input window f32 vs u8
checking bit-exactness vs the golden oracle for each.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import canny_edge_tpu.ops.window as WIN
from canny_edge_tpu.golden import reference as G
from canny_edge_tpu.golden.reference import gaussian_kernel
from canny_edge_tpu.io.imageio import synthetic_image
from canny_edge_tpu.ops.packed import unpack_mask
from canny_edge_tpu.utils.opcount import hbm_materialization_bytes
from canny_edge_tpu.utils.timing import checksum_slope_seconds

H, W = 1080, 1920
SIGMA = 1.4
PX = H * W


def main():
    kv = tuple(float(v) for v in gaussian_kernel(SIGMA))
    img = synthetic_image(H, W)
    dev = jax.device_put(img)
    mn, mx = jnp.int32(30), jnp.int32(90)
    nm_g = G.nonmax_suppression(*G.sobel(G.gaussian_blur(img, SIGMA)))

    for axes in (frozenset(), frozenset({0}), frozenset({1}),
                 frozenset({0, 1})):
        for pad_f32 in (True, False):
            WIN._DIV_CONCAT_AXES = axes
            WIN._PAD_F32 = pad_f32

            def fe(x, a, b):
                return WIN.frontend_nm_xla(x, kv, thresholds=(a, b))

            w_p, s_p = jax.jit(fe)(dev, mn, mx)
            ok = ((np.asarray(unpack_mask(w_p, W)) == (nm_g >= 30)).all()
                  and (np.asarray(unpack_mask(s_p, W)) == (nm_g >= 90)).all())
            txt = jax.jit(fe).lower(dev, mn, mx).compile().as_text()
            bpp = hbm_materialization_bytes(txt, PX)["hbm_write_bytes_per_px"]
            sec = checksum_slope_seconds(lambda x, a, b: fe(x, a, b)[0],
                                         img, samples=3)
            print(f"concat_axes={sorted(axes)!s:8s} pad_f32={pad_f32!s:5s} "
                  f"{sec * 1e3:7.4f} ms  {bpp:5.1f} B/px  "
                  f"{'OK' if ok else 'MISMATCH!'}", flush=True)


if __name__ == "__main__":
    main()
