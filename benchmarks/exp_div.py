"""Renormalization-division formulations vs HBM materialization.

The round-3 HLO audit (exp_hlo_audit) shows the production frontend's
ENTRY computation materializes ~14 full-size arrays; up to 4 of them are
the `_split_div_static` edge stitches (near-one interior division +
2 `dynamic_update_slice` fixups per blur pass).  The DUS nodes cost HBM
round trips unless XLA aliases them in place — while a host-seeded exact
fixer over the FULL array (exact_div_by_vector with a trace-time count
vector and correctly rounded host reciprocals) costs ~27 more ALU ops/px
(~15 us at 1080p) but ONE fused producer and zero stitches.

Variants (identical bit-exact output, gated):
  split   — production: near-one interior + host-seeded edge fixups via
            dynamic_update_slice (ops/window._split_div_static)
  fixall  — host count vector + host reciprocal, 2-iteration exact fixer
            over the full array, no split, no DUS

Run: python benchmarks/exp_div.py
"""

from __future__ import annotations

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
    from canny_edge_tpu.ops import window
    from canny_edge_tpu.ops.numerics import exact_div_by_vector
    from canny_edge_tpu.utils.timing import checksum_slope_seconds

    H, W = 1080, 1920
    kv = tuple(float(v) for v in gaussian_kernel(1.4))
    img = make_image(H, W)
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}  {H}x{W} sigma=1.4")

    def fe(x, mn, mx):
        w, s = window.frontend_nm_xla(x, kv, thresholds=(mn, mx))
        return w + s

    def split_fixall(acc, cnt_np, s, axis):
        cv = np.where(cnt_np == 0, np.float32(1), cnt_np).astype(np.float32)
        recip = (np.float32(1) / cv).astype(np.float32)
        k = cv.shape[0]
        sh = (1, k) if axis == 1 else (k, 1)
        return exact_div_by_vector(acc, jnp.asarray(cv.reshape(sh)),
                                   recip=jnp.asarray(recip.reshape(sh)))

    orig = window._split_div_static
    a = np.asarray(jax.jit(fe)(img, jnp.int32(30), jnp.int32(90)))
    window._split_div_static = split_fixall
    try:
        b = np.asarray(jax.jit(fe)(img, jnp.int32(30), jnp.int32(90)))
        assert (a == b).all(), "fixall diverges!"
        log("gate: fixall bit-identical")
        t0 = time.time()
        sec = checksum_slope_seconds(fe, img, samples=3)
        log(f"fe fixall  {sec * 1e3:7.3f} ms   wall {time.time() - t0:.0f}s")
    finally:
        window._split_div_static = orig
    t0 = time.time()
    sec = checksum_slope_seconds(fe, img, samples=3)
    log(f"fe split   {sec * 1e3:7.3f} ms   wall {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
