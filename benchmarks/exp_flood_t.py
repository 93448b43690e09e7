"""Transposed packed-flood layout experiment (checksum-slope).

At 1080p the packed hysteresis masks are (1080, 60) uint32 — only 60 of
each (8, 128) VPU tile's lanes carry data, so every bit op in the VMEM
flood kernel wastes ~53% of the machine.  Transposing the layout to
(Wd, H) = (60, 1080) fills the tiles (~88% utilization: 60->64 sublanes,
1080->1152 lanes) at the cost of moving the word-carry shifts to the
sublane axis and the row shifts to the lane axis.

Measures, on realistic NMS-derived masks at 1080p and 4K:
  flood_cur    current (H, Wd) VMEM kernel (inner_dilate=6)
  flood_t      transposed (Wd, H) VMEM kernel (inner_dilate=6)
and verifies both produce identical edge sets.

Usage: python benchmarks/exp_flood_t.py   (from benchmarks/)
"""

from __future__ import annotations

import functools
import os
import sys
import time

# run from anywhere: make both benchmarks/ and the repo root importable
# (do NOT touch PYTHONPATH here — the axon TPU plugin lives on it)
_here = os.path.dirname(os.path.abspath(__file__))
for p in (_here, os.path.dirname(_here)):
    if p not in sys.path:
        sys.path.insert(0, p)

import numpy as np

from profile_components import make_image, slope_ms  # noqa: E402


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from canny_edge_tpu.golden.reference import gaussian_kernel
    from canny_edge_tpu.kernels.hysteresis_packed import (
        _any_nonzero, hysteresis_packed_pallas_masks)
    from canny_edge_tpu.ops.packed import pack_mask

    U1, U31 = np.uint32(1), np.uint32(31)

    # ---- transposed-layout shift helpers: array is (Wd, H), bit=column ----
    def wl(e):   # word from next-lower column block: sublane shift
        return jnp.concatenate([jnp.zeros_like(e[:1, :]), e[:-1, :]], axis=0)

    def wr(e):
        return jnp.concatenate([e[1:, :], jnp.zeros_like(e[:1, :])], axis=0)

    def shl1(e):
        return (e << U1) | (wl(e) >> U31)

    def shr1(e):
        return (e >> U1) | (wr(e) << U31)

    def row_up(e):  # image row+1 -> lane shift
        return jnp.concatenate([e[:, 1:], jnp.zeros_like(e[:, :1])], axis=1)

    def row_dn(e):
        return jnp.concatenate([jnp.zeros_like(e[:, :1]), e[:, :-1]], axis=1)

    def dilate_t(e, weak):
        h = e | shl1(e) | shr1(e)
        return weak & (h | row_up(h) | row_dn(h))

    def hflood_t(e, weak, width):
        al, bl = e, weak
        ar, br = e, weak
        s = 1
        while s < min(32, width):
            ss, cs = np.uint32(s), np.uint32(32 - s)
            al = al | (bl & ((al << ss) | (wl(al) >> cs)))
            bl = bl & ((bl << ss) | (wl(bl) >> cs))
            ar = ar | (br & ((ar >> ss) | (wr(ar) << cs)))
            br = br & ((br >> ss) | (wr(br) << cs))
            s *= 2
        wd = e.shape[0]
        k = 1
        while k < wd:
            zl = jnp.zeros_like(al[:k, :])

            def wlk(v):
                return jnp.concatenate([zl, v[:-k, :]], axis=0)

            def wrk(v):
                return jnp.concatenate([v[k:, :], zl], axis=0)
            al = al | (bl & wlk(al))
            bl = bl & wlk(bl)
            ar = ar | (br & wrk(ar))
            br = br & wrk(br)
            k *= 2
        return e | (weak & (al | ar))

    def vflood_t(e, weak, height):
        au, bu = e, weak
        ad, bd = e, weak
        k = 1
        while k < height:
            zk = jnp.zeros_like(au[:, :k])

            def su(v):
                return jnp.concatenate([v[:, k:], zk], axis=1)

            def sd(v):
                return jnp.concatenate([zk, v[:, :-k]], axis=1)
            au = au | (bu & su(au))
            bu = bu & su(bu)
            ad = ad | (bd & sd(ad))
            bd = bd & sd(bd)
            k *= 2
        return e | (weak & (au | ad))

    def kern_t(weak_ref, strong_ref, out_ref, *, height, width, inner):
        w = weak_ref[:]

        def rest(e):
            e = jax.lax.fori_loop(0, inner - 1,
                                  lambda i, x: dilate_t(x, w), e)
            e = hflood_t(e, w, width)
            e = vflood_t(e, w, height)
            return e

        def body(state):
            e, _ = state
            d1 = dilate_t(e, w)
            changed = _any_nonzero(d1 ^ e)
            new = jax.lax.cond(changed, rest, lambda x: x, d1)
            return new, changed

        edges, _ = jax.lax.while_loop(lambda s: s[1], body,
                                      (strong_ref[:], jnp.asarray(True)))
        out_ref[:] = edges

    def flood_t_masks(weak_t, strong_t, height, width, inner=6):
        kern = functools.partial(kern_t, height=height, width=width,
                                 inner=inner)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(weak_t.shape, jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=jax.default_backend() == "cpu",
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(weak_t, strong_t)

    sigma = 1.4
    kernel_vals = tuple(float(v) for v in gaussian_kernel(sigma))
    del kernel_vals
    sel = sys.argv[1:]

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")
    t0 = time.time()
    np.asarray(jax.jit(lambda v: v * 2 + 1)(np.ones((8, 128), np.float32)))
    log(f"env compile init: {time.time() - t0:.0f}s")

    for H, W in ((1080, 1920), (2160, 3840)):
        img = make_image(H, W)
        img_dev = jax.device_put(img)
        mp = H * W / 1e6

        def masks_from(x):
            nm = x.astype(jnp.int32) * 2
            return pack_mask(nm >= 160), pack_mask(nm >= 400)

        def flood_cur(x):
            w, s = masks_from(x)
            return hysteresis_packed_pallas_masks(w, s, H, W, inner_dilate=6)

        def flood_t(x):
            w, s = masks_from(x)
            wt, st = jnp.swapaxes(w, 0, 1), jnp.swapaxes(s, 0, 1)
            e = flood_t_masks(wt, st, H, W)
            return jnp.swapaxes(e, 0, 1)

        # correctness first
        a = np.asarray(jax.jit(flood_cur)(img_dev))
        b = np.asarray(jax.jit(flood_t)(img_dev))
        eq = "OK" if (a == b).all() else "MISMATCH!"
        log(f"[{H}x{W}] equality: {eq}")

        for name, fn in (("flood_cur", flood_cur), ("flood_t", flood_t)):
            if sel and name not in sel:
                continue
            ms, cs = slope_ms(fn, img_dev)
            log(f"[{H}x{W}] {name:<12} {ms:8.3f} ms  "
                f"{mp / ms * 1e3:8.0f} MP/s   wall {cs:5.1f}s")


if __name__ == "__main__":
    main()
