"""NMS-tail variants A/B (checksum-slope, 1080p sigma=1.4, same process).

The round-2 stage matrix (exp_fe.py) localized the entire Mosaic-vs-XLA
front-end deficit to the NMS/angle-bin block (+0.098 ms Mosaic vs +0.038
XLA at 1080p) — boolean-vector codegen, not algorithm.  This experiment
measures three algebraic reformulations of that block, in both an XLA and
a whole-image Pallas wrapper, holding blur+sobel identical:

  * cmpall   — compare-all-8-neighbours, AND/OR combine (round-2 Mosaic
               production form, window_nm_interior).
  * selfirst — select the direction's two neighbours via a 3-deep where
               cascade, then one compare pair (round-2 XLA production
               form, frontend_nm_static).
  * maxc     — NEW: keep = m0 > max(n1, n2); precompute the 4 directional
               pair-maxes and pick one with a 3-select cascade ordered
               high/low/sign.  Uses two exact simplifications:
                 - b90 == high:  under high (ay > ax >= 0) gy != 0 always
                   holds, so ((gx==0)&(gy!=0)) | ((same|opp)&high)
                   collapses to high (verified exhaustively over all
                   |gx|,|gy| <= 2040 pairs);
                 - low | (mid & sp==0) bins fall through to the
                   horizontal default, so neither mid nor b45/b135 ANDs
                   are materialized.
               ~27 VPU ops vs ~37 (selfirst) / ~45 (cmpall), and only 2
               i1-vector ANDs, which is what Mosaic chokes on.
  * minmask  — round 3: maxc's two remaining i1 ANDs replaced by
               min-arithmetic (zero i1 logical ops anywhere).
  * bitsel   — round 3: NO compares/selects/i1 at all — conditions as
               all-ones i32 masks (asr of a sign bit), selections as
               and/or bit blends.
  * sum8     — round-3 diagnostic (not output-equivalent): same 8 shifted
               mag operands, pure adds, zero predicates.

ROUND-3 CONCLUSIONS (v5e, 544x1920 so every variant fits whole-image VMEM;
measured 2026-08-19):

    xla_maxc  0.062 ms   xla_sum8    0.065 ms   xla_minmask ~= xla_maxc
    pal_maxc  0.109 ms   pal_minmask 0.107 ms   pal_bitsel  0.118 ms
    pal_sum8  0.090 ms

1. The i1-AND hypothesis is REFUTED: removing the last i1 logical ops
   (minmask) recovers 2%, not the 43% gap.
2. The compare/select-legalization hypothesis is REFUTED: eliminating
   every compare and select (bitsel) is *slower* (more raw ops win over
   any mask-lowering savings).
3. sum8 shows ~55% of the Mosaic-vs-XLA gap (+0.025 of +0.047 ms) with
   ZERO predicates: it is the cost of materializing 8 shifted full-array
   operands as explicit lane/sublane rotates in Mosaic, where XLA's
   fusion emits offset addressing inside one loop nest.  The remaining
   ~45% is the predicate block, where three algebraically distinct
   formulations land within 10% of each other — a codegen floor, not a
   source-level pattern.
=> The deficit is structural at the Mosaic source level today: the
   production kernels keep the maxc tail, and the pallas backend remains
   the measured reference point rather than the production path
   (models/canny.py backend="fused" uses the XLA frontend).

Usage: python benchmarks/exp_nms.py [name ...]   (EXPNMS_H/W override size)
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

from profile_components import (enable_compile_cache, make_image,  # noqa: E402
                                slope_ms)


def log(*a):
    print(*a, flush=True)


def main():
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from canny_edge_tpu.golden.reference import gaussian_kernel
    from canny_edge_tpu.ops.numerics import (div_by_near_one, isqrt_f32,
                                             mul_const_f32,
                                             nms_bin_masks_f32)
    from canny_edge_tpu.ops.window import _kernel_sum

    # geometry overridable for variants whose whole-image VMEM footprint
    # differs (EXPNMS_H=544 fits every variant on v5e)
    H = int(os.environ.get("EXPNMS_H", "1080"))
    W = int(os.environ.get("EXPNMS_W", "1920"))
    sigma = 1.4
    kernel = np.asarray(gaussian_kernel(sigma), np.float32)
    window = kernel.shape[0]
    c = window // 2
    r = c + 2
    s = _kernel_sum(kernel)
    mp = H * W / 1e6
    sel = sys.argv[1:]

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})  {H}x{W} sigma={sigma}")
    t0 = time.time()
    np.asarray(jax.jit(lambda v: v * 2 + 1)(np.ones((8, 128), np.float32)))
    log(f"env compile init: {time.time() - t0:.0f}s")

    img_dev = jax.device_put(make_image(H, W))

    def blur_body(x):
        hp, wp = x.shape
        wo = wp - 2 * c
        acc = jnp.zeros((hp, wo), jnp.float32)
        for t in range(window):
            acc = acc + mul_const_f32(x[:, t:t + wo], kernel[t])
        temp = div_by_near_one(acc, s)
        ho = hp - 2 * c
        acc = jnp.zeros((ho, wo), jnp.float32)
        for t in range(window):
            acc = acc + mul_const_f32(temp[t:t + ho, :], kernel[t])
        return jnp.floor(div_by_near_one(acc, s))

    def sobel_body(sm):
        two = np.float32(2)
        d = sm[:, 2:] - sm[:, :-2]
        gx = two * d[1:-1, :] + d[2:, :] + d[:-2, :]
        e = sm[2:, :] - sm[:-2, :]
        gy = two * e[:, 1:-1] + e[:, 2:] + e[:, :-2]
        mag = isqrt_f32(gx * gx + gy * gy)
        return gx, gy, mag

    def nb_fn(mag):
        def nb(dr, dc):
            return mag[1 + dr:1 + dr + H, 1 + dc:1 + dc + W]
        return nb

    # ---- NMS tail variants (identical outputs; proven in tests) ----
    def tail_cmpall(gx, gy, mag):
        b0a, b45a, b90a, b135a = nms_bin_masks_f32(gx, gy)
        nb = nb_fn(mag)
        m0 = nb(0, 0)
        keep0 = (m0 > nb(0, -1)) & (m0 > nb(0, 1))
        keep45 = (m0 > nb(-1, 1)) & (m0 > nb(1, -1))
        keep90 = (m0 > nb(-1, 0)) & (m0 > nb(1, 0))
        keep135 = (m0 > nb(-1, -1)) & (m0 > nb(1, 1))

        def core(b):
            return b[1:1 + H, 1:1 + W]

        keep = ((core(b0a) & keep0) | (core(b45a) & keep45)
                | (core(b90a) & keep90) | (core(b135a) & keep135))
        return jnp.where(keep, m0, np.float32(0))

    def tail_selfirst(gx, gy, mag):
        _, b45a, b90a, b135a = nms_bin_masks_f32(gx, gy)
        nb = nb_fn(mag)

        def core(b):
            return b[1:1 + H, 1:1 + W]

        b45c, b90c, b135c = core(b45a), core(b90a), core(b135a)
        m0 = nb(0, 0)
        n1 = jnp.where(b45c, nb(-1, 1), jnp.where(b90c, nb(-1, 0),
                       jnp.where(b135c, nb(-1, -1), nb(0, -1))))
        n2 = jnp.where(b45c, nb(1, -1), jnp.where(b90c, nb(1, 0),
                       jnp.where(b135c, nb(1, 1), nb(0, 1))))
        keep = (m0 > n1) & (m0 > n2)
        return jnp.where(keep, m0, np.float32(0))

    def tail_maxc(gx, gy, mag):
        gxc, gyc = gx[1:1 + H, 1:1 + W], gy[1:1 + H, 1:1 + W]
        ax, ay = jnp.abs(gxc), jnp.abs(gyc)
        diff2 = (ax - ay) * (ax - ay)
        two = np.float32(2)
        low = (ax > ay) & (two * ay * ay < diff2)
        high = (ay > ax) & (diff2 > two * ax * ax)   # == b90 exactly
        sp = gxc * gyc
        nb = nb_fn(mag)
        m0 = nb(0, 0)
        maxh = jnp.maximum(nb(0, -1), nb(0, 1))
        max45 = jnp.maximum(nb(-1, 1), nb(1, -1))
        maxv = jnp.maximum(nb(-1, 0), nb(1, 0))
        max135 = jnp.maximum(nb(-1, -1), nb(1, 1))
        t = jnp.where(high, maxv,
                      jnp.where(low, maxh,
                                jnp.where(sp > 0, max45,
                                          jnp.where(sp < 0, max135, maxh))))
        return jnp.where(m0 > t, m0, np.float32(0))

    def tail_minmask(gx, gy, mag):
        """maxc with the two remaining i1-vector ANDs replaced by
        min-arithmetic: a & b (both 'x > 0'-shaped) == min(xa, xb) > 0.

        Exactness: ax-ay, diff2-2ay^2, diff2-2ax^2 are differences of
        integer-valued f32 < 2^24 with |result| < 2^24, hence exact; the
        min preserves sign iff both operands positive.  Leaves ZERO i1
        logical ops in the NMS tail — every predicate feeds a select
        directly (round-3 hypothesis: Mosaic's deficit is i1 AND/OR mask
        legalization, not compares/selects)."""
        gxc, gyc = gx[1:1 + H, 1:1 + W], gy[1:1 + H, 1:1 + W]
        ax, ay = jnp.abs(gxc), jnp.abs(gyc)
        diff2 = (ax - ay) * (ax - ay)
        two = np.float32(2)
        zero = np.float32(0)
        low = jnp.minimum(ax - ay, diff2 - two * ay * ay) > zero
        high = jnp.minimum(ay - ax, diff2 - two * ax * ax) > zero
        sp = gxc * gyc
        nb = nb_fn(mag)
        m0 = nb(0, 0)
        maxh = jnp.maximum(nb(0, -1), nb(0, 1))
        max45 = jnp.maximum(nb(-1, 1), nb(1, -1))
        maxv = jnp.maximum(nb(-1, 0), nb(1, 0))
        max135 = jnp.maximum(nb(-1, -1), nb(1, 1))
        t = jnp.where(high, maxv,
                      jnp.where(low, maxh,
                                jnp.where(sp > zero, max45,
                                          jnp.where(sp < zero, max135,
                                                    maxh))))
        return jnp.where(m0 > t, m0, zero)

    def tail_bitsel(gx, gy, mag):
        """maxc with NO compares, NO selects, NO i1 anywhere: conditions
        become all-ones/zero int32 masks via arithmetic-shift-right of a
        sign bit, selections become and/or bit blends.

        Sign trick: for integer-valued f32 u, ``u > 0  <=>  0.5 - u < 0``
        (|true difference| >= 0.5, so f32 rounding cannot flip the sign),
        and ``asr(bitcast(0.5 - u), 31)`` is all-ones exactly then.
        Round-3 hypothesis: the Mosaic deficit is compare/select mask
        legalization itself, not just i1 AND/OR (refuted by minmask)."""
        import jax as _jax

        def m_pos(u):  # all-ones i32 where u > 0 (u integer-valued f32)
            return _jax.lax.shift_right_arithmetic(
                _jax.lax.bitcast_convert_type(np.float32(0.5) - u,
                                              jnp.int32), 31)

        def bsel(m, a, b):  # m ? a : b, all int32 bit ops
            ai = _jax.lax.bitcast_convert_type(a, jnp.int32)
            bi = _jax.lax.bitcast_convert_type(b, jnp.int32)
            return _jax.lax.bitcast_convert_type((ai & m) | (bi & ~m),
                                                 jnp.float32)

        gxc, gyc = gx[1:1 + H, 1:1 + W], gy[1:1 + H, 1:1 + W]
        ax, ay = jnp.abs(gxc), jnp.abs(gyc)
        diff2 = (ax - ay) * (ax - ay)
        two = np.float32(2)
        low_m = m_pos(jnp.minimum(ax - ay, diff2 - two * ay * ay))
        high_m = m_pos(jnp.minimum(ay - ax, diff2 - two * ax * ax))
        sp = gxc * gyc
        spp_m = m_pos(sp)
        spn_m = m_pos(-sp)
        nb = nb_fn(mag)
        m0 = nb(0, 0)
        maxh = jnp.maximum(nb(0, -1), nb(0, 1))
        max45 = jnp.maximum(nb(-1, 1), nb(1, -1))
        maxv = jnp.maximum(nb(-1, 0), nb(1, 0))
        max135 = jnp.maximum(nb(-1, -1), nb(1, 1))
        diag = bsel(spp_m, max45, bsel(spn_m, max135, maxh))
        t = bsel(high_m, maxv, bsel(low_m, maxh, diag))
        keep_m = m_pos(m0 - t)
        return _jax.lax.bitcast_convert_type(
            _jax.lax.bitcast_convert_type(m0, jnp.int32) & keep_m,
            jnp.float32)

    def tail_sum8(gx, gy, mag):
        """DIAGNOSTIC (not output-equivalent): reads the same 8 shifted
        mag operands + gx/gy products as the real tails but combines them
        with pure adds — isolates shifted-operand cost from predicate
        cost.  If pal_sum8 shows the same Mosaic-vs-XLA delta as the real
        tails, the deficit is multi-offset operand materialization, not
        compare/select codegen."""
        gxc, gyc = gx[1:1 + H, 1:1 + W], gy[1:1 + H, 1:1 + W]
        nb = nb_fn(mag)
        acc = gxc * gyc
        for dr, dc in ((0, 0), (0, -1), (0, 1), (-1, 0), (1, 0),
                       (-1, 1), (1, -1), (-1, -1), (1, 1)):
            acc = acc + nb(dr, dc)
        return acc

    tails = {"cmpall": tail_cmpall, "selfirst": tail_selfirst,
             "maxc": tail_maxc, "minmask": tail_minmask,
             "bitsel": tail_bitsel, "sum8": tail_sum8}
    DIAG = {"sum8"}

    def pad_f32(x):
        return jnp.pad(x, r).astype(jnp.float32)

    vmem = pltpu.CompilerParams(vmem_limit_bytes=127 * 1024 * 1024)
    i32hw = jax.ShapeDtypeStruct((H, W), jnp.int32)

    def pallas_call_u8(body):
        def kern(x_ref, o_ref):
            xf = x_ref[...].astype(jnp.int32).astype(jnp.float32)
            o_ref[...] = body(xf)
        H8 = -(-(H + 2 * r) // 8) * 8
        W128 = -(-(W + 2 * r) // 128) * 128

        def run(x):
            xp = jnp.pad(x, ((r, H8 - H - r), (r, W128 - W - r)))
            return pl.pallas_call(
                kern,
                out_shape=i32hw,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=jax.default_backend() == "cpu",
                compiler_params=vmem,
            )(xp)
        return run

    comps = {}
    for name, tail in tails.items():
        def xla_fn(x, tail=tail):
            gx, gy, mag = sobel_body(blur_body(pad_f32(x)))
            return tail(gx, gy, mag).astype(jnp.int32)

        def pal_body(xf, tail=tail):
            gx, gy, mag = sobel_body(blur_body(xf))
            return tail(gx, gy, mag).astype(jnp.int32)

        comps[f"xla_{name}"] = xla_fn
        comps[f"pal_{name}"] = pallas_call_u8(pal_body)

    # equivalence gate before timing: all variants agree on this image
    ref = None
    for name, fn in comps.items():
        if sel and name not in sel:
            continue
        if any(name.endswith(d) for d in DIAG):
            continue  # diagnostic variants are not output-equivalent
        out = np.asarray(jax.jit(fn)(img_dev))
        if ref is None:
            ref = out
        else:
            assert (out == ref).all(), f"{name} diverges from first variant"
    log("equivalence gate: all selected variants bit-identical")

    for name, fn in comps.items():
        if sel and name not in sel:
            continue
        try:
            ms, cs = slope_ms(fn, img_dev)
            log(f"{name:<14} {ms:8.3f} ms  {mp / ms * 1e3:8.0f} MP/s   "
                f"wall {cs:5.1f}s")
        except Exception as e:
            log(f"{name:<14} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
