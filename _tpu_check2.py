import time, numpy as np, jax, cv2
from canny_edge_tpu import golden
from canny_edge_tpu.ops import numerics, stages
from canny_edge_tpu.models import CannyTPU
from tests.conftest import synthetic_image

rng = np.random.default_rng(3)
xs = np.concatenate([rng.uniform(1e-4, 256, 200000), [0.0]]).astype(np.float32)
for w in golden.gaussian_kernel(1.0):
    p = np.asarray(jax.jit(lambda x, w=float(w): numerics.exact_mul_const_f32(x, w))(xs))
    exp = xs*np.float32(w)
    print(f"exact_mul w={w:.6f}: mismatches {(p!=exp).sum()}")

img = cv2.imread("/root/reference/tests/test.jpg", cv2.IMREAD_GRAYSCALE).astype(np.uint8)
for sigma in (0.5, 1.0, 2.0):
    t0=time.time()
    ours = np.asarray(stages.gaussian_blur(img, sigma))
    ref = golden.gaussian_blur(img, sigma)
    print(f"blur sigma={sigma}: bit-exact={bool((ours==ref).all())} ({time.time()-t0:.0f}s)")

model = CannyTPU(sigma=1.0)
out = np.asarray(model(img, 50, 150))
ref = golden.canny(img, 1.0, 50, 150)
print("pipeline baseline bit-exact:", bool((out==ref).all()))
im2 = synthetic_image(1080, 1920, seed=3)
m2 = CannyTPU(sigma=1.4)
o2 = np.asarray(m2(im2, 30, 90)); r2 = golden.canny(im2, 1.4, 30, 90)
print("pipeline 1080p bit-exact:", bool((o2==r2).all()))
