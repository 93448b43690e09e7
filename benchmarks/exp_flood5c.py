"""Round-5 attribution of the VMEM flood's residual vs its audited floor.

After the inner=19 retune the hysteresis marginal sits at ~76% of the
two-bucket floor (BENCH: 0.030 ms vs 0.023 at 1080p).  This script
decomposes the marginal into measured pieces, all on the production
shapes (1080p, transposed (Wd, H) = (60, 1080) uint32 masks):

  a. **fixed overhead** — a copy-only Pallas kernel inside the identical
     XLA wrapper (transposes in/out + unpack + int16 select): what a
     zero-work flood would cost (launch + relayouts + output write);
  b. **one-shot round work** — a non-looping kernel running exactly
     dilate+test, then round body, then dilate+test (the trips=2
     work content, no while_loop) inside the same wrapper: isolates the
     while_loop/cond control overhead as (production - one_shot);
  c. the production kernel for reference.

Every variant is checked bit-exact against the golden oracle where it
computes the real fixed point (a/b are structural probes: a is checked
to return the strong mask, b is checked against golden — on the bench
image 2 trips reach the fixed point, which the trip counter confirms).

Usage (TPU env): python benchmarks/exp_flood5c.py
"""

from __future__ import annotations

import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from canny_edge_tpu import golden
    from canny_edge_tpu.golden.reference import gaussian_kernel
    from canny_edge_tpu.kernels import hysteresis_packed as hp
    from canny_edge_tpu.ops.packed import unpack_mask
    from canny_edge_tpu.ops.window import frontend_nm_xla
    from canny_edge_tpu.utils.constants import (INNER_DILATE_VMEM,
                                                kernel_vmem_limit)

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    t0 = time.time()
    np.asarray(jax.jit(lambda v: v * 2 + 1)(np.ones((8, 128), np.float32)))
    print(f"env compile init: {time.time() - t0:.0f}s", flush=True)

    kv = tuple(float(v) for v in gaussian_kernel(SIGMA))
    img = make_image(H, W)
    ref = golden.canny(img, SIGMA, MN, MX)
    img_dev = jax.device_put(img)
    report = {"device": dev.device_kind, "H": H, "W": W,
              "inner_dilate": INNER_DILATE_VMEM}

    def fe_masks(x):
        return frontend_nm_xla(x, kv, thresholds=(jnp.int32(MN),
                                                  jnp.int32(MX)))

    ms_fe, _ = slope_ms(lambda x: fe_masks(x)[0] + fe_masks(x)[1], img_dev)
    print(f"frontend-only: {ms_fe:.4f} ms", flush=True)
    report["frontend_ms"] = round(ms_fe, 4)

    def wrapped(kern_body):
        """Identical XLA wrapper around an arbitrary kernel body."""
        def f(x):
            w_p, s_p = fe_masks(x)
            wt = jnp.swapaxes(w_p, -2, -1)
            st = jnp.swapaxes(s_p, -2, -1)
            out_t = pl.pallas_call(
                kern_body,
                out_shape=jax.ShapeDtypeStruct(wt.shape, jnp.uint32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=False,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=kernel_vmem_limit()),
            )(wt, st)
            e = jnp.swapaxes(out_t, -2, -1)
            return jnp.where(unpack_mask(e, W), jnp.int16(255),
                             jnp.int16(0))
        return f

    # ---- a: copy-only kernel (zero flood work) ----
    def kern_copy(weak_ref, strong_ref, out_ref):
        out_ref[:] = strong_ref[:]

    f_copy = wrapped(kern_copy)
    # sanity: output == unpacked strong mask
    w_p, s_p = jax.jit(fe_masks)(img_dev)
    strong_px = np.asarray(jnp.where(unpack_mask(s_p, W), jnp.int16(255),
                                     jnp.int16(0)))
    assert (np.asarray(jax.jit(f_copy)(img_dev)) == strong_px).all()
    ms_copy, _ = slope_ms(f_copy, img_dev)
    print(f"[a] copy-only wrapper: {ms_copy:.4f} ms "
          f"(fixed overhead {ms_copy - ms_fe:+.4f})", flush=True)
    report["copy_ms"] = round(ms_copy, 4)

    # ---- b: one-shot trips=2 work content, no while_loop ----
    def kern_oneshot(weak_ref, strong_ref, out_ref):
        w = weak_ref[:]
        e = strong_ref[:] & w

        def dil_test(e):
            d = hp._dilate_t(e, w)
            return d, hp._any_nonzero(d ^ e)

        e, c1 = dil_test(e)
        e = jax.lax.fori_loop(0, INNER_DILATE_VMEM - 1,
                              lambda i, x: hp._dilate_t(x, w), e)
        e = hp._hflood_t(e, w, W)
        e = hp._vflood_t(e, w, H)
        e, c2 = dil_test(e)
        # fold the convergence flags in so nothing is dead code (bit 0 of
        # an all-zero dummy word merge keeps the compare chains live)
        flag = (c1 | c2).astype(jnp.uint32)
        out_ref[:] = e | (jnp.zeros_like(e) & flag)

    f_one = wrapped(kern_oneshot)
    out_one = np.asarray(jax.jit(f_one)(img_dev))
    ok = bool((out_one == ref).all())
    print(f"[b] one-shot bit-exact vs golden: {ok}", flush=True)
    report["oneshot_bitexact"] = ok
    ms_one, _ = slope_ms(f_one, img_dev)
    print(f"[b] one-shot trips=2 content: {ms_one:.4f} ms", flush=True)
    report["oneshot_ms"] = round(ms_one, 4)

    # ---- c: production ----
    def f_prod(x):
        w_p, s_p = fe_masks(x)
        e = hp.hysteresis_packed_pallas_masks(w_p, s_p, H, W)
        return jnp.where(unpack_mask(e, W), jnp.int16(255), jnp.int16(0))

    assert (np.asarray(jax.jit(f_prod)(img_dev)) == ref).all()
    ms_prod, _ = slope_ms(f_prod, img_dev)
    print(f"[c] production while-loop kernel: {ms_prod:.4f} ms", flush=True)
    report["production_ms"] = round(ms_prod, 4)

    fixed = ms_copy - ms_fe
    work = ms_one - ms_copy
    ctrl = ms_prod - ms_one
    marg = ms_prod - ms_fe
    print(f"\nattribution of the {marg * 1e3:.1f} us hysteresis marginal:",
          flush=True)
    print(f"  fixed (launch+transposes+unpack+out): {fixed * 1e3:6.1f} us",
          flush=True)
    print(f"  flood round work (trips=2 content):   {work * 1e3:6.1f} us",
          flush=True)
    print(f"  while/cond control overhead:          {ctrl * 1e3:6.1f} us",
          flush=True)
    report["attribution_us"] = {
        "fixed_wrapper": round(fixed * 1e3, 1),
        "round_work": round(work * 1e3, 1),
        "while_control": round(ctrl * 1e3, 1),
        "total_marginal": round(marg * 1e3, 1)}

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "exp_flood5c_results.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"\nwrote {out}", flush=True)


if __name__ == "__main__":
    main()
