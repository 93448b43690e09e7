"""Round-5 experiment: settle the frontend roofline (VERDICT r4 next #1).

Round 4 replaced the refuted HBM-bytes attribution with an asserted
"per-op issue overhead" hypothesis (commit 49dbc0f).  This script tests it
directly and builds a two-bucket floor model whose denominator includes the
93.7 audited movement ops/px the old ALU-only floor ignored:

A. **Pixels at fixed structure** — the fused frontend at W=1920 and
   H in {270..1350} (all whole-image programs, identical per-px form).
   If per-op *launch/issue* overhead dominated, ms-vs-MP would show a
   large intercept; a near-zero intercept means per-element cost.

B. **Ops at fixed pixels** — 1080p with sigma in {0.6..3.0} (window 5..13
   taps): the HLO-audited op mix varies while pixels stay fixed.
   Regressing ms against audited ops/px gives the achieved
   per-element-op cost (and its r^2 vs the ALU-only regressor).

C. **Empirical rate probes** — same-shape synthetic kernels:
     * madd chain: pure dependent f32 multiply-adds (2 ALU ops per step,
       zero movement) -> sustained ALU element rate the machine actually
       delivers under jit (includes XLA tiling/loop overhead).
     * tap chain: the blur's own idiom — slice-shift + multiply-add —
       -> mixed rate from which the movement-op element rate is solved.

D. **Two-bucket floor** — frontend floor =
      alu_ops/alu_rate + (movement+convert+reduce)_ops/movement_rate
   evaluated from C's measured rates and the audited mix.  This replaces
   the 3.85e12-ops/s paper constant whose floor nobody could defend.

Usage: run on the TPU env from /root/repo:  python - < benchmarks/exp_opcost.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

from profile_components import make_image, slope_ms as _slope_ms  # noqa: E402

# CANNY_EXP_SMOKE=1: tiny chains + fewer points, for validating the script
# end-to-end on CPU before spending a TPU session on it.
SMOKE = os.environ.get("CANNY_EXP_SMOKE") == "1"


def slope_ms(fn, img):
    if SMOKE:
        return _slope_ms(fn, img, k1=2, k2=5)
    return _slope_ms(fn, img)


def lstsq_line(xs, ys):
    """y = a + b x least squares; returns (a, b, r2)."""
    xs, ys = np.asarray(xs, float), np.asarray(ys, float)
    A = np.stack([np.ones_like(xs), xs], axis=1)
    (a, b), res, *_ = np.linalg.lstsq(A, ys, rcond=None)
    ss_tot = ((ys - ys.mean()) ** 2).sum()
    r2 = 1.0 - (res[0] / ss_tot if res.size and ss_tot else 0.0)
    return float(a), float(b), float(r2)


def main():
    import jax
    import jax.numpy as jnp

    from canny_edge_tpu.golden.reference import gaussian_kernel
    from canny_edge_tpu.ops.window import frontend_nm_xla
    from canny_edge_tpu.utils.opcount import audit_hlo_text

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    t0 = time.time()
    np.asarray(jax.jit(lambda v: v * 2 + 1)(np.ones((8, 128), np.float32)))
    print(f"env compile init: {time.time() - t0:.0f}s", flush=True)
    report = {"device": dev.device_kind}

    def kv(s):
        return tuple(float(v) for v in gaussian_kernel(s))

    def fe(sigma):
        k = kv(sigma)

        def f(x):
            w, s = frontend_nm_xla(x, k,
                                   thresholds=(jnp.int32(50), jnp.int32(150)))
            return w + s
        return f

    # ---- A: pixels at fixed structure (sigma=1.4, W=1920) ----
    print("\n[A] runtime vs pixels at fixed per-px structure", flush=True)
    rows_a = []
    f14 = fe(1.4)
    for H in ((270, 540) if SMOKE else (270, 540, 810, 1080, 1350)):
        img = make_image(H, 1920)
        ms, wall = slope_ms(f14, jax.device_put(img))
        mp = H * 1920 / 1e6
        rows_a.append({"H": H, "mp": round(mp, 3), "ms": round(ms, 4),
                       "ms_per_mp": round(ms / mp, 4)})
        print(f"  H={H:5d}  {mp:6.3f} MP  {ms:7.4f} ms  "
              f"{ms / mp:7.4f} ms/MP   wall {wall:.0f}s", flush=True)
    a0, b0, r2 = lstsq_line([r["mp"] for r in rows_a],
                            [r["ms"] for r in rows_a])
    print(f"  fit: ms = {a0:+.4f} + {b0:.4f} * MP   r2={r2:.5f}")
    print(f"  -> fixed per-program cost {a0 * 1e3:+.1f} us vs "
          f"{b0 * 2.0736:.3f} ms of per-element work at 1080p", flush=True)
    report["A_pixel_scaling"] = {"rows": rows_a, "intercept_ms": round(a0, 4),
                                 "slope_ms_per_mp": round(b0, 4),
                                 "r2": round(r2, 5)}

    # ---- B: ops at fixed pixels (1080p, sigma sweep) ----
    print("\n[B] runtime vs audited op mix at fixed pixels (1080p)",
          flush=True)
    img1080 = jax.device_put(make_image(1080, 1920))
    PX = 1080 * 1920
    rows_b = []
    for sigma in ((1.0, 1.4) if SMOKE else (0.6, 1.0, 1.4, 2.0, 2.5, 3.0)):
        f = fe(sigma)
        txt = jax.jit(f).lower(img1080).compile().as_text()
        buckets = audit_hlo_text(txt, PX)["buckets"]
        ms, wall = slope_ms(f, img1080)
        rows_b.append({"sigma": sigma, "window": len(kv(sigma)),
                       "ms": round(ms, 4), **buckets})
        print(f"  sigma={sigma:3.1f} w={len(kv(sigma)):2d}  {ms:7.4f} ms  "
              f"alu {buckets.get('alu', 0):6.1f}  mov "
              f"{buckets.get('movement', 0):6.1f}  conv "
              f"{buckets.get('convert', 0):5.1f}/px   wall {wall:.0f}s",
              flush=True)
    alu = [r["alu"] for r in rows_b]
    tot = [r["alu"] + r.get("movement", 0) + r.get("convert", 0)
           + r.get("reduce", 0) for r in rows_b]
    ms_b = [r["ms"] for r in rows_b]
    a_alu, b_alu, r2_alu = lstsq_line(alu, ms_b)
    a_tot, b_tot, r2_tot = lstsq_line(tot, ms_b)
    print(f"  ms vs ALU ops/px:   intercept {a_alu:+.4f}  "
          f"slope {b_alu * 1e3:.4f} us/(op/px)  r2={r2_alu:.4f}")
    print(f"  ms vs TOTAL ops/px: intercept {a_tot:+.4f}  "
          f"slope {b_tot * 1e3:.4f} us/(op/px)  r2={r2_tot:.4f}", flush=True)
    report["B_op_scaling"] = {
        "rows": rows_b,
        "vs_alu": {"intercept_ms": round(a_alu, 4),
                   "ms_per_oppx": round(b_alu, 6), "r2": round(r2_alu, 4)},
        "vs_total": {"intercept_ms": round(a_tot, 4),
                     "ms_per_oppx": round(b_tot, 6), "r2": round(r2_tot, 4)}}

    # ---- C: empirical element-rate probes (1080p f32 arrays) ----
    print("\n[C] empirical rate probes", flush=True)
    STEPS = 8 if SMOKE else 64

    def madd_chain(x):
        y = x.astype(jnp.float32) * np.float32(1.000001)
        for i in range(STEPS):
            y = y * np.float32(0.999999) + np.float32(1.0)
        return y.astype(jnp.int32)

    def tap_chain(x):
        # the blur idiom: shifted-slice multiply-add (1 slice + 1 mul +
        # 1 add per step on ~full-size arrays)
        y = x.astype(jnp.float32)
        y = jnp.pad(y, ((0, 0), (1, STEPS + 1)))
        for i in range(STEPS):
            y = y[:, :-1] * np.float32(0.999999) + y[:, 1:]
        return y.astype(jnp.int32)

    def probe_buckets(f):
        txt = jax.jit(f).lower(img1080).compile().as_text()
        b = audit_hlo_text(txt, PX)["buckets"]
        return (b.get("alu", 0.0),
                b.get("movement", 0.0) + b.get("convert", 0.0)
                + b.get("reduce", 0.0))

    ms_madd, _ = slope_ms(madd_chain, img1080)
    ms_tap, _ = slope_ms(tap_chain, img1080)
    madd_alu, madd_other = probe_buckets(madd_chain)
    tap_alu, tap_other = probe_buckets(tap_chain)
    alu_rate = ((madd_alu + madd_other) * PX) / (ms_madd * 1e-3)
    print(f"  madd chain: {ms_madd:7.4f} ms, audited "
          f"{madd_alu:.1f} alu + {madd_other:.1f} other op/px "
          f"-> {alu_rate / 1e12:.3f} T elem-ops/s", flush=True)
    # tap chain: solve the movement rate from the audited mix, charging
    # its ALU ops at the madd-chain rate
    t_mov = ms_tap * 1e-3 - (tap_alu * PX) / alu_rate
    mov_rate = tap_other * PX / t_mov if t_mov > 0 else float("inf")
    print(f"  tap chain:  {ms_tap:7.4f} ms, audited {tap_alu:.1f} alu + "
          f"{tap_other:.1f} other op/px -> movement residual "
          f"{t_mov * 1e3:+.4f} ms -> {mov_rate / 1e12:.3f} T elem-ops/s",
          flush=True)
    report["C_rates"] = {"ms_madd": round(ms_madd, 4),
                         "ms_tap": round(ms_tap, 4),
                         "alu_rate_TopsS": round(alu_rate / 1e12, 3),
                         "movement_rate_TopsS": round(mov_rate / 1e12, 3)}

    # ---- D: two-bucket floor for the production 1080p frontend ----
    print("\n[D] two-bucket floor (1080p, sigma=1.4)", flush=True)
    r14 = [r for r in rows_b if r["sigma"] == 1.4][0]
    other = (r14.get("movement", 0) + r14.get("convert", 0)
             + r14.get("reduce", 0))
    floor_s = (r14["alu"] * PX / alu_rate + other * PX / mov_rate)
    actual = max(r14["ms"] * 1e-3, 1e-9)
    print(f"  audited mix: alu {r14['alu']:.1f} + other {other:.1f} op/px")
    print(f"  floor {floor_s * 1e3:.4f} ms  actual {actual * 1e3:.4f} ms  "
          f"-> {100 * floor_s / actual:.1f}% of two-bucket floor",
          flush=True)
    report["D_floor"] = {"alu_ops_px": r14["alu"],
                         "other_ops_px": round(other, 2),
                         "floor_ms": round(floor_s * 1e3, 4),
                         "actual_ms": round(r14["ms"], 4),
                         "pct_of_floor": round(100 * floor_s / actual, 1)}

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "exp_opcost_results.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"\nwrote {out}", flush=True)


if __name__ == "__main__":
    main()
