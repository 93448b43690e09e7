import time, functools, numpy as np, jax, jax.numpy as jnp
from canny_edge_tpu.golden.reference import gaussian_kernel
from canny_edge_tpu.models.canny import canny_fn
from canny_edge_tpu.io import synthetic_image

kv14 = tuple(float(v) for v in gaussian_kernel(1.4))
im = synthetic_image(1080, 1920, seed=3)
MP = im.size/1e6

def kbench(name, pipe):
    def make(k):
        @jax.jit
        def run_k(x, acc):
            def body(i, carry):
                out = pipe(x, jnp.int32(30)+(i%2), jnp.int32(90))
                return carry + out[0,0].astype(jnp.int32) + out[540, 960].astype(jnp.int32)
            return jax.lax.fori_loop(0, k, body, acc)
        return run_k
    dev = jax.device_put(im)
    times = {}
    for k in (5, 20, 80):
        f = make(k)
        f(dev, jnp.int32(0)).block_until_ready()
        best = 1e9
        for r in range(3):
            t0=time.perf_counter(); f(dev, jnp.int32(r+1)).block_until_ready(); best=min(best, time.perf_counter()-t0)
        times[k] = best
    slope = (times[80]-times[20])/60
    print(f"{name}: totals {{5:{times[5]:.3f}s, 20:{times[20]:.3f}s, 80:{times[80]:.3f}s}} "
          f"slope {slope*1e3:.3f} ms/frame = {MP/slope:.0f} MP/s")

kbench("xla full", functools.partial(canny_fn, kernel_vals=kv14, backend="xla", hysteresis_steps=8))
kbench("pallas full", functools.partial(canny_fn, kernel_vals=kv14, backend="pallas"))
