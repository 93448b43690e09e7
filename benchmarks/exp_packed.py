"""TPU experiments: (a) bit-packed hysteresis op costs vs unpacked,
(b) Pallas frontend tile-size sweep, (c) persistent compilation cache probe.

Throwaway perf exploration — correctness is NOT checked here.
Run: python benchmarks/exp_packed.py [packed|tiles|cache]
"""

import functools
import sys
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def slope_ms(fn, x, k1=4, k2=16):
    import jax
    import jax.numpy as jnp

    def chain(k):
        @jax.jit
        def run(x0, seed):
            def body(i, carry):
                chk, v = carry
                v2 = jnp.roll(v, chk % 13 + i, axis=0) ^ (chk + i).astype(v.dtype)
                out = fn(v2)
                chk2 = (chk * jnp.int32(16777619)
                        + jnp.sum(out[::31, ::17].astype(jnp.int32))
                        ) & jnp.int32(0x7FFFFFFF)
                return chk2, v
            chk, _ = jax.lax.fori_loop(0, k, body, (seed, x0))
            return chk
        return run

    r1, r2 = chain(k1), chain(k2)
    t0 = time.perf_counter()
    int(np.asarray(r1(x, np.int32(1))))
    int(np.asarray(r2(x, np.int32(1))))
    cs = time.perf_counter() - t0
    slopes = []
    for s in range(2, 5):
        t0 = time.perf_counter()
        c1 = int(np.asarray(r1(x, np.int32(s))))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        c2 = int(np.asarray(r2(x, np.int32(s))))
        t2 = time.perf_counter() - t0
        assert c1 != c2
        slopes.append((t2 - t1) / (k2 - k1))
    return float(np.median(slopes)) * 1e3, cs


def run_packed():
    import jax
    import jax.numpy as jnp

    H, W = 1080, 1920
    Wd = W // 32
    u1 = jnp.uint32(1)

    def word_left(e):  # word j-1 (lower columns) into j
        return jnp.concatenate([jnp.zeros_like(e[:, :1]), e[:, :-1]], axis=1)

    def word_right(e):
        return jnp.concatenate([e[:, 1:], jnp.zeros_like(e[:, :1])], axis=1)

    def shl1(e):  # toward higher columns
        return (e << u1) | (word_left(e) >> jnp.uint32(31))

    def shr1(e):
        return (e >> u1) | (word_right(e) << jnp.uint32(31))

    def up(e):
        return jnp.concatenate([e[1:], jnp.zeros_like(e[:1])], axis=0)

    def dn(e):
        return jnp.concatenate([jnp.zeros_like(e[:1]), e[:-1]], axis=0)

    def dilate_packed(e, w):
        h = e | shl1(e) | shr1(e)
        return w & (h | up(h) | dn(h))

    def steps_packed(n):
        def fn(x):
            w = x | jnp.uint32(0x55555555)
            e = x & (x >> jnp.uint32(3))
            for _ in range(n):
                e = dilate_packed(e, w)
            return e
        return fn

    def dilate_unpacked(e, w):
        f = jnp.zeros_like(e[:, :1])
        h = e | jnp.concatenate([e[:, 1:], f], 1) | jnp.concatenate([f, e[:, :-1]], 1)
        g = jnp.zeros_like(h[:1])
        return w & (h | jnp.concatenate([h[1:], g], 0) | jnp.concatenate([g, h[:-1]], 0))

    def steps_unpacked(n):
        def fn(x):
            w = (x & jnp.int32(1)) > 0
            e = (x & jnp.int32(8)) > 0
            w = w | (x > 0)
            for _ in range(n):
                e = dilate_unpacked(e, w)
            return e
        return fn

    def hflood(e, w):
        """Segmented or-scan along rows, both directions, doubling."""
        al, bl = e, w
        ar, br = e, w
        s = 1
        while s < 32:
            ss = jnp.uint32(s)
            cs = jnp.uint32(32 - s)
            al = al | (bl & ((al << ss) | (word_left(al) >> cs)))
            bl = bl & ((bl << ss) | (word_left(bl) >> cs))
            ar = ar | (br & ((ar >> ss) | (word_right(ar) << cs)))
            br = br & ((br >> ss) | (word_right(br) << cs))
            s *= 2
        # word-granularity doubling
        k = 1
        while k < Wd:
            def wl(v):
                return jnp.concatenate([jnp.zeros_like(v[:, :k]), v[:, :-k]], 1)

            def wr(v):
                return jnp.concatenate([v[:, k:], jnp.zeros_like(v[:, :k])], 1)
            al = al | (bl & wl(al))
            bl = bl & wl(bl)
            ar = ar | (br & wr(ar))
            br = br & wr(br)
            k *= 2
        return e | (w & (al | ar))

    def vflood(e, w):
        au, bu = e, w
        ad, bd = e, w
        k = 1
        while k < H:
            def su(v):
                return jnp.concatenate([v[k:], jnp.zeros_like(v[:k])], 0)

            def sd(v):
                return jnp.concatenate([jnp.zeros_like(v[:k]), v[:-k]], 0)
            au = au | (bu & su(au))
            bu = bu & su(bu)
            ad = ad | (bd & sd(ad))
            bd = bd & sd(bd)
            k *= 2
        return e | (w & (au | ad))

    def flood_round(n):
        def fn(x):
            w = x | jnp.uint32(0x55555555)
            e = x & (x >> jnp.uint32(3))
            for _ in range(n):
                e = hflood(e, w)
                e = vflood(e, w)
                e = dilate_packed(e, w)
            return e
        return fn

    xp = jax.device_put(np.random.randint(0, 2**31, (H, Wd), np.int64).astype(np.uint32))
    xu = jax.device_put(np.random.randint(0, 16, (H, W)).astype(np.int32))

    for name, fn, x, per in [
        ("packed_dilate_x64", steps_packed(64), xp, 64),
        ("unpacked_dilate_x64", steps_unpacked(64), xu, 64),
        ("packed_floodround_x8", flood_round(8), xp, 8),
    ]:
        ms, cs = slope_ms(fn, x)
        log(f"{name:<22} {ms:8.3f} ms total  {ms / per * 1e3:8.2f} us/step  "
            f"compile {cs:5.1f}s")


def run_tiles():
    import jax

    from canny_edge_tpu.golden.reference import gaussian_kernel
    from canny_edge_tpu.kernels.frontend import frontend_nm

    H, W = 1080, 1920
    kernel_vals = tuple(float(v) for v in gaussian_kernel(1.4))
    img = jax.device_put((np.random.default_rng(0).integers(
        0, 256, (H, W))).astype(np.uint8))
    for tile in [(128, 512), (128, 1024), (256, 512), (256, 1024),
                 (256, 1920), (512, 1920), (1080, 1920)]:
        fn = functools.partial(frontend_nm, kernel_vals=kernel_vals,
                               tile=tile, interpret=False)
        try:
            ms, cs = slope_ms(fn, img)
            log(f"tile {tile}: {ms:7.3f} ms  {H * W / ms / 1e3:7.0f} MP/s  "
                f"compile {cs:5.1f}s")
        except Exception as e:
            log(f"tile {tile}: FAILED {type(e).__name__}: {str(e)[:200]}")


def run_cache():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp

    from canny_edge_tpu.golden.reference import gaussian_kernel
    from canny_edge_tpu.ops.window import frontend_nm_banded

    kernel_vals = tuple(float(v) for v in gaussian_kernel(1.4))
    img = jax.device_put((np.random.default_rng(0).integers(
        0, 256, (1080, 1920))).astype(np.uint8))
    t0 = time.perf_counter()
    f = jax.jit(lambda x: frontend_nm_banded(x, kernel_vals))
    np.asarray(f(img))
    log(f"fe_xla compile+run: {time.perf_counter() - t0:.1f}s "
        f"(run again in a fresh process to test cache hits)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "packed"
    dict(packed=run_packed, tiles=run_tiles, cache=run_cache)[which]()
