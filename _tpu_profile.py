import time, functools, numpy as np, jax, jax.numpy as jnp
from canny_edge_tpu.golden.reference import gaussian_kernel
from canny_edge_tpu.kernels.frontend import frontend_nm
from canny_edge_tpu.kernels.hysteresis import hysteresis_pallas, _sweep, make_halo_tiles, _cdiv
from canny_edge_tpu.ops import stages
from canny_edge_tpu.io import synthetic_image
from canny_edge_tpu import golden

im = synthetic_image(1080, 1920, seed=3)
kv14 = tuple(float(v) for v in gaussian_kernel(1.4))
H, W = im.shape

def chain(fn, x, k=20):
    @jax.jit
    def run_k(x, acc):
        def body(i, carry):
            out = fn(x + (i % 2).astype(jnp.uint8) if x.dtype==jnp.uint8 else x, i)
            return carry + out.reshape(-1)[0].astype(jnp.int32)
        return jax.lax.fori_loop(0, k, body, acc)
    dev = jax.device_put(x)
    run_k(dev, jnp.int32(0)).block_until_ready()
    best=1e9
    for _ in range(3):
        t0=time.perf_counter(); run_k(dev, jnp.int32(1)).block_until_ready(); best=min(best,(time.perf_counter()-t0)/k)
    return best

# frontend only
fe = lambda x, i: frontend_nm(x, kv14)
t_fe = chain(fe, im)
print(f"frontend only: {t_fe*1e3:.3f} ms  ({H*W/t_fe/1e6:.0f} MP/s)")

# hysteresis only on precomputed nm
sm = golden.gaussian_blur(im, 1.4)
nm = golden.nonmax_suppression(*golden.sobel(sm)).astype(np.int32)
hy = lambda x, i: hysteresis_pallas(x, jnp.int32(30)+(i%2), jnp.int32(90))
t_hy = chain(hy, nm)
print(f"hysteresis only: {t_hy*1e3:.3f} ms")

# how many sweeps does this image need?
th, tw = 128, 512
nty, ntx = _cdiv(H,th), _cdiv(W,tw)
weak = (nm >= 30).astype(np.int8); strong = (nm >= 90).astype(np.int8)
wt = make_halo_tiles(jnp.asarray(weak), th, tw, 1)
e = jnp.asarray(strong); total=0; sweeps=0
while True:
    e, ch = _sweep(wt, e, th, tw, nty, ntx, sweeps%2==1, False)
    ch = int(ch); sweeps+=1; total+=ch
    if ch==0 or sweeps>20: break
print(f"sweeps to converge: {sweeps} (changed {total})")

# XLA stage timings for comparison
from canny_edge_tpu.ops.stages import _gaussian_blur_with_kernel
bl = lambda x, i: _gaussian_blur_with_kernel(x, kv14)
t_bl = chain(bl, im)
print(f"xla blur only: {t_bl*1e3:.3f} ms")
sm_j = jax.device_put(sm)
sb = lambda x, i: stages.sobel(x)[0]
t_sb = chain(sb, sm)
print(f"xla sobel only: {t_sb*1e3:.3f} ms")
