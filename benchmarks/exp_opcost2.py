"""Round-5 follow-up: robustness of the measured movement element rate.

exp_opcost.py derived the two-bucket floor's movement rate (1.78 T
elem-ops/s on v5e) from ONE idiom — the blur's lane-axis slice-shift
multiply-add.  This script measures the solved movement rate for three
structurally different movement idioms at the same shape (1080p f32),
each audited from its own compiled HLO and charged for its ALU ops at
the madd-chain rate:

  * tap-lane   — lane-axis slice shifts (the blur idiom; exp_opcost's)
  * tap-sublane — sublane(row)-axis slice shifts (the y-pass/sobel idiom)
  * roll       — jnp.roll (concatenate-of-slices, the NMS-neighbour idiom)

If the solved rates cluster, the floor's denominator is robust; if they
spread, the committed floor quotes the idiom that matches the frontend's
actual op mix (lane+sublane slices) and this artifact records the range.

Usage (TPU env): python benchmarks/exp_opcost2.py
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

STEPS = 64


def main():
    import jax
    import jax.numpy as jnp

    from canny_edge_tpu.utils.opcount import audit_hlo_text

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    t0 = time.time()
    np.asarray(jax.jit(lambda v: v * 2 + 1)(np.ones((8, 128), np.float32)))
    print(f"env compile init: {time.time() - t0:.0f}s", flush=True)

    img = jax.device_put(make_image(1080, 1920))
    PX = 1080 * 1920
    report = {"device": dev.device_kind, "steps": STEPS}

    def madd_chain(x):
        y = x.astype(jnp.float32) * np.float32(1.000001)
        for _ in range(STEPS):
            y = y * np.float32(0.999999) + np.float32(1.0)
        return y.astype(jnp.int32)

    def tap_lane(x):
        y = x.astype(jnp.float32)
        y = jnp.pad(y, ((0, 0), (1, STEPS + 1)))
        for _ in range(STEPS):
            y = y[:, :-1] * np.float32(0.999999) + y[:, 1:]
        return y.astype(jnp.int32)

    def tap_sublane(x):
        y = x.astype(jnp.float32)
        y = jnp.pad(y, ((1, STEPS + 1), (0, 0)))
        for _ in range(STEPS):
            y = y[:-1, :] * np.float32(0.999999) + y[1:, :]
        return y.astype(jnp.int32)

    def roll_chain(x):
        y = x.astype(jnp.float32)
        for i in range(STEPS):
            y = jnp.roll(y, 1 + (i % 3), axis=1) * np.float32(0.999999) + y
        return y.astype(jnp.int32)

    def buckets(f):
        txt = jax.jit(f).lower(img).compile().as_text()
        b = audit_hlo_text(txt, PX)["buckets"]
        return (b.get("alu", 0.0),
                b.get("movement", 0.0) + b.get("convert", 0.0)
                + b.get("reduce", 0.0) + b.get("other", 0.0))

    ms_madd, _ = slope_ms(madd_chain, img)
    madd_alu, madd_other = buckets(madd_chain)
    alu_rate = (madd_alu + madd_other) * PX / (ms_madd * 1e-3)
    print(f"madd: {ms_madd:.4f} ms ({madd_alu:.0f}+{madd_other:.0f} op/px) "
          f"-> alu rate {alu_rate / 1e12:.3f} T/s", flush=True)
    report["alu_rate_TopsS"] = round(alu_rate / 1e12, 3)

    rates = {}
    for name, f in (("tap_lane", tap_lane), ("tap_sublane", tap_sublane),
                    ("roll", roll_chain)):
        ms, _ = slope_ms(f, img)
        alu, other = buckets(f)
        t_mov = ms * 1e-3 - alu * PX / alu_rate
        rate = other * PX / t_mov if t_mov > 0 else float("inf")
        rates[name] = round(rate / 1e12, 3)
        print(f"{name:>11}: {ms:.4f} ms ({alu:.0f} alu + {other:.0f} "
              f"mov op/px) -> movement rate {rate / 1e12:.3f} T/s",
              flush=True)
    report["movement_rates_TopsS"] = rates
    vals = list(rates.values())
    report["movement_rate_spread"] = {
        "min": min(vals), "max": max(vals),
        "committed_floor_rate": 1.776}
    print(f"\nspread: {min(vals):.2f}-{max(vals):.2f} T/s "
          f"(committed floor uses 1.776)", flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "exp_opcost2_results.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
