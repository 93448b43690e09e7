"""Round-5: can roll-lowered lane taps beat slice taps in the frontend?

exp_opcost2.py measured per-idiom movement rates: lane-axis slice shifts
1.79 T elem-ops/s, jnp.roll 2.61, sublane slices 7.46.  Per tap step the
roll idiom nets ~10% cheaper despite auditing more ops — an untried
lever for the x-pass, whose 11 lane-slice taps are the frontend's single
largest movement contributor.

This times the REAL production frontend (frontend_nm_xla, packed-mask
tail) with the x-pass tap reads swapped between mechanisms:

  * slice (production): acc += k[t] * x[:, r-c+t : r-c+t+W]
  * roll:               acc += k[t] * roll(x, -(r-c+t), axis=1)[:, :W]

Value-identical (the roll's wrapped elements land beyond column W and
are cropped: shift r-c+t <= 2r = pad width), so bit-exactness is checked
then the full pipeline is timed.  Same A/B for the y-pass (sublane) as a
control — expected to hurt or wash since sublane slices are already the
cheap class.

Usage (TPU env): python benchmarks/exp_taps.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

from profile_components import make_image, slope_ms  # noqa: E402

H, W = 1080, 1920
SIGMA = 1.4
MN, MX = 50, 150


def main():
    import jax
    import jax.numpy as jnp

    from canny_edge_tpu import golden
    from canny_edge_tpu.golden.reference import gaussian_kernel
    from canny_edge_tpu.kernels.hysteresis_packed import (
        hysteresis_packed_pallas_masks)
    from canny_edge_tpu.ops import window as win
    from canny_edge_tpu.ops.numerics import mul_const_f32
    from canny_edge_tpu.ops.packed import unpack_mask

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    t0 = time.time()
    np.asarray(jax.jit(lambda v: v * 2 + 1)(np.ones((8, 128), np.float32)))
    print(f"env compile init: {time.time() - t0:.0f}s", flush=True)

    kv = tuple(float(v) for v in gaussian_kernel(SIGMA))
    img = make_image(H, W)
    ref = golden.canny(img, SIGMA, MN, MX)
    img_dev = jax.device_put(img)
    report = {"device": dev.device_kind}

    # patch points: the two tap-accumulation loops in frontend_nm_static
    # live in window.py as inline loops; rather than fork the function,
    # monkeypatch mul_const_f32's operand via a tap-read hook is not
    # available — so this experiment carries a minimal copy of the x-pass
    # swap through window.frontend_nm_static's module-level knob.
    assert hasattr(win, "_TAP_MECHANISM"), \
        "window._TAP_MECHANISM knob missing"

    def full(x):
        w_p, s_p = win.frontend_nm_xla(
            x, kv, thresholds=(jnp.int32(MN), jnp.int32(MX)))
        e = hysteresis_packed_pallas_masks(w_p, s_p, H, W)
        return jnp.where(unpack_mask(e, W), jnp.int16(255), jnp.int16(0))

    def fe_only(x):
        w_p, s_p = win.frontend_nm_xla(
            x, kv, thresholds=(jnp.int32(MN), jnp.int32(MX)))
        return w_p + s_p

    results = {}
    for mech in ("slice", "roll_x", "roll_xy"):
        win._TAP_MECHANISM = mech
        try:
            out = np.asarray(jax.jit(full)(img_dev))
            ok = bool((out == ref).all())
            if not ok:
                print(f"  !! {mech}: NOT bit-exact — skipped", flush=True)
                continue
            ms_fe, _ = slope_ms(fe_only, img_dev)
            ms_full, _ = slope_ms(full, img_dev)
            results[mech] = {"frontend_ms": round(ms_fe, 4),
                             "full_ms": round(ms_full, 4)}
            print(f"  {mech:>8}: frontend {ms_fe:.4f} ms   "
                  f"full {ms_full:.4f} ms", flush=True)
        finally:
            win._TAP_MECHANISM = "slice"
    report["mechanisms"] = results

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "exp_taps_results.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
