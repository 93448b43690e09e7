"""Component-level TPU profiling with the checksum-slope protocol.

Measures each pipeline component in isolation (and some counterfactual
variants) so optimization effort goes where the time actually is.  Prints
one line per component: name, per-call ms, effective GP/s, compile seconds.

Usage: python benchmarks/profile_components.py [component ...]
"""

from __future__ import annotations

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


def enable_compile_cache():
    """Persistent compilation cache (shared with bench.py): Mosaic
    whole-image kernels take minutes to compile on this target; the cache
    makes re-runs and cross-experiment A/Bs tractable."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(_here), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def log(*a):
    print(*a, flush=True)


def make_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = 96 + 64 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
    img += 80 * (((xx - w / 2) ** 2 + (yy - h / 2) ** 2) < (min(h, w) / 3) ** 2)
    img += rng.normal(0, 6, size=(h, w))
    return np.clip(img, 0, 255).astype(np.uint8)


def slope_ms(fn, img_dev, k1=None, k2=None):
    """Per-call (ms, wall_s incl. compile) of fn(uint8 image) -> int array.

    Thin wrapper over the canonical protocol implementation
    (canny_edge_tpu.utils.timing.checksum_slope_seconds) so protocol fixes
    propagate; chain lengths auto-size to ~1.5 s device programs unless
    given.
    """
    from canny_edge_tpu.utils.timing import checksum_slope_seconds

    t0 = time.perf_counter()
    sec = checksum_slope_seconds(lambda x, mn, mx: fn(x), img_dev,
                                 k1=k1, k2=k2, samples=3)
    return sec * 1e3, time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp

    from canny_edge_tpu.golden.reference import gaussian_kernel
    from canny_edge_tpu.kernels.frontend import frontend_nm, make_halo_tiles
    from canny_edge_tpu.kernels.hysteresis_v2 import hysteresis_banded
    from canny_edge_tpu.ops import stages
    from canny_edge_tpu.ops.window import frontend_nm_banded, window_nm

    H, W = 1080, 1920
    sigma = 1.4
    kernel_vals = tuple(float(v) for v in gaussian_kernel(sigma))
    mp = H * W / 1e6
    sel = sys.argv[1:]

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})  image {H}x{W} "
        f"sigma={sigma} window={len(kernel_vals)}")

    img = make_image(H, W)
    img_dev = jax.device_put(img)

    # -- component definitions (each: uint8 (H, W) -> int array) --
    def fe_xla(x):
        return frontend_nm_banded(x, kernel_vals)

    def fe_pallas(x):
        return frontend_nm(x, kernel_vals, interpret=False)

    def restack_only(x):
        t = make_halo_tiles(x, 128, 512, 7)
        return t[:, :, 0, :].astype(jnp.int32).sum(axis=0)

    def hyst_xla(x):
        nm = x.astype(jnp.int32) * 2  # fake nm from uint8
        return stages.hysteresis(nm, jnp.int32(60), jnp.int32(180), 8)

    def hyst_banded(x):
        nm = x.astype(jnp.int32) * 2
        return hysteresis_banded(nm, jnp.int32(60), jnp.int32(180),
                                 interpret=False)

    def full_xla(x):
        nm = frontend_nm_banded(x, kernel_vals)
        return stages.hysteresis(nm, jnp.int32(30), jnp.int32(90), 8)

    def full_pallas(x):
        nm = frontend_nm(x, kernel_vals, interpret=False)
        return hysteresis_banded(nm, jnp.int32(30), jnp.int32(90),
                                 interpret=False)

    from canny_edge_tpu.ops.packed import hysteresis_packed

    def hyst_packed(x):
        nm = x.astype(jnp.int32) * 2
        return hysteresis_packed(nm, jnp.int32(60), jnp.int32(180))

    def full_xla_packed(x):
        nm = frontend_nm_banded(x, kernel_vals)
        return hysteresis_packed(nm, jnp.int32(30), jnp.int32(90))

    # counterfactual: taps only, plain div (NOT bit-exact; perf model only)
    def fe_xla_plaindiv(x):
        kernel = np.asarray(kernel_vals, np.float32)
        window = kernel.shape[0]
        c = window // 2
        xf = x.astype(jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        acc = jnp.zeros_like(xf)
        cnt = jnp.zeros((1, W), jnp.float32)
        from canny_edge_tpu.ops.shifts import shift_cols, shift_rows
        for t in range(window):
            off = t - c
            acc = acc + shift_cols(xf, off) * kernel[t]
            m = ((col + off) >= 0) & ((col + off) < W)
            cnt = cnt + jnp.where(m, kernel[t], np.float32(0))
        temp = acc * (1.0 / cnt)
        row = jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0)
        acc = jnp.zeros_like(temp)
        cnt = jnp.zeros((H, 1), jnp.float32)
        for t in range(window):
            off = t - c
            acc = acc + shift_rows(temp, off) * kernel[t]
            m = ((row + off) >= 0) & ((row + off) < H)
            cnt = cnt + jnp.where(m, kernel[t], np.float32(0))
        sm = (acc * (1.0 / cnt)).astype(jnp.int32)
        mag, ang = stages.sobel(sm.astype(jnp.int16))
        return stages.nonmax_suppression(mag, ang)

    comps = {
        "fe_xla": fe_xla,
        "fe_pallas": fe_pallas,
        "restack_only": restack_only,
        "hyst_xla": hyst_xla,
        "hyst_banded": hyst_banded,
        "full_xla": full_xla,
        "full_pallas": full_pallas,
        "fe_xla_plaindiv": fe_xla_plaindiv,
        "hyst_packed": hyst_packed,
        "full_xla_packed": full_xla_packed,
    }
    for name, fn in comps.items():
        if sel and name not in sel:
            continue
        try:
            ms, cs = slope_ms(fn, img_dev)
            log(f"{name:<18} {ms:8.3f} ms  {mp / ms * 1e3:8.0f} MP/s   "
                f"wall {cs:5.1f}s")
        except Exception as e:
            log(f"{name:<18} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
