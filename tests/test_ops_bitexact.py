"""Bit-exactness of the JAX ops vs the golden NumPy oracle.

Every stage and the full pipeline must match golden bit for bit, on the real
reference test image and on synthetic images with awkward (non-tile-aligned)
shapes.  These tests run identically on the CPU backend (default) and on TPU
(CANNY_TPU_TEST_PLATFORM=tpu).
"""

import numpy as np
import pytest

from canny_edge_tpu import golden
from canny_edge_tpu.models import CannyTPU
from canny_edge_tpu.ops import numerics, stages
from tests.conftest import synthetic_image

SIGMAS = [0.5, 1.0, 2.0]
SHAPES = [(256, 256), (64, 100), (37, 53), (480, 640)]


# --- exact numerics primitives --------------------------------------------

def test_exact_div_random():
    import jax

    rng = np.random.default_rng(0)
    a = rng.uniform(0, 400, size=200000).astype(np.float32)
    a[rng.random(a.shape) < 0.01] = 0.0
    b = rng.uniform(0.3, 1.7, size=200000).astype(np.float32)
    q = np.asarray(jax.jit(numerics.exact_div_f32)(a, b))
    np.testing.assert_array_equal(q, a / b)


def test_exact_div_adversarial():
    """Quotients constructed to land on/near ties and binade boundaries."""
    import jax

    rng = np.random.default_rng(1)
    # exact ties: a = q_mid * b where q_mid is representable-plus-half-ulp
    qs = rng.uniform(0.5, 255, 50000).astype(np.float32)
    bs = rng.uniform(0.3, 1.7, 50000).astype(np.float32)
    # products near representable quotients
    a = (qs.astype(np.float64) * bs.astype(np.float64)).astype(np.float32)
    q = np.asarray(jax.jit(numerics.exact_div_f32)(a, bs))
    np.testing.assert_array_equal(q, a / bs)
    # powers of two and neighbors
    base = np.float32(2.0) ** rng.integers(-3, 9, 20000).astype(np.int32)
    eps = np.float32(1) + np.float32(2 ** -23) * rng.integers(-4, 5, 20000)
    a2 = (base * eps).astype(np.float32)
    b2 = rng.uniform(0.5, 2.0, 20000).astype(np.float32)
    q2 = np.asarray(jax.jit(numerics.exact_div_f32)(a2, b2))
    np.testing.assert_array_equal(q2, a2 / b2)


def test_exact_mul_const():
    """round_f32(x*w) via integer mantissa path == numpy product, for the
    actual Gaussian weights and the blur's value domain."""
    import jax

    rng = np.random.default_rng(3)
    xs = np.concatenate([
        rng.uniform(1e-4, 256, 100000),
        rng.integers(0, 256, 10000).astype(np.float64),
        [0.0, 1e-4, 255.0, 256.0 - 2 ** -16],
    ]).astype(np.float32)
    for sigma in (0.5, 1.0, 2.0):
        for w in golden.gaussian_kernel(sigma):
            p = np.asarray(jax.jit(
                lambda x, w=float(w): numerics.exact_mul_const_f32(x, w))(xs))
            np.testing.assert_array_equal(p, xs * np.float32(w))


def test_isqrt_exhaustive_small_plus_random():
    import math

    import jax

    n = np.arange(0, 70000, dtype=np.int32)
    k = np.asarray(jax.jit(numerics.isqrt_int32)(n))
    expected = np.array([math.isqrt(int(v)) for v in n])
    np.testing.assert_array_equal(k, expected)

    rng = np.random.default_rng(2)
    n2 = rng.integers(0, 2_100_000, 100000).astype(np.int32)
    # include perfect squares and off-by-one values
    sq = rng.integers(0, 1443, 30000).astype(np.int64) ** 2
    n2 = np.concatenate([n2, sq.astype(np.int32), (sq + 1).astype(np.int32),
                         np.maximum(sq - 1, 0).astype(np.int32)])
    k2 = np.asarray(jax.jit(numerics.isqrt_int32)(n2))
    expected2 = np.array([math.isqrt(int(v)) for v in n2])
    np.testing.assert_array_equal(k2, expected2)


def test_quantize_angle_matches_golden():
    import jax

    r = np.arange(-130, 131)
    gx, gy = np.meshgrid(r, r)
    gx = gx.astype(np.int32)
    gy = gy.astype(np.int32)
    a = np.asarray(jax.jit(numerics.quantize_angle_int)(gx, gy))
    b = golden.quantize_angle(gx, gy)
    np.testing.assert_array_equal(a, b)


def test_nms_bin_masks_f32_match_quantize_angle():
    """The f32 bin masks must agree with the integer angle quantization
    over the full reachable gradient range (|g| <= 2040 for uint8 inputs):
    dense small grid + random extremes + axis/diagonal boundary lines.

    Guards the b90 == high simplification: under high (ay > ax >= 0),
    gy != 0 always holds, so the reference's explicit vertical clause
    ((gx==0)&(gy!=0)) is subsumed (verified exhaustively offline over all
    4081^2 pairs; this test pins a dense + adversarial sample).
    """
    import jax

    r = np.arange(-130, 131)
    gx, gy = [a.ravel() for a in np.meshgrid(r, r)]
    rng = np.random.default_rng(7)
    big = rng.integers(-2040, 2041, size=(2, 20000))
    lines = np.arange(-2040, 2041, 7)
    zeros = np.zeros_like(lines)
    gx = np.concatenate([gx, big[0], lines, zeros, lines, lines, -lines])
    gy = np.concatenate([gy, big[1], zeros, lines, lines, -lines, lines])
    gxf = gx.astype(np.float32)
    gyf = gy.astype(np.float32)
    b0, b45, b90, b135 = [np.asarray(m) for m in jax.jit(
        numerics.nms_bin_masks_f32)(gxf, gyf)]
    ang = golden.quantize_angle(gx.astype(np.int32), gy.astype(np.int32))
    # masks must be exhaustive and mutually exclusive
    total = (b0.astype(int) + b45.astype(int) + b90.astype(int)
             + b135.astype(int))
    np.testing.assert_array_equal(total, 1)
    np.testing.assert_array_equal(b0, ang == 0)
    np.testing.assert_array_equal(b45, ang == 45)
    np.testing.assert_array_equal(b90, ang == 90)
    np.testing.assert_array_equal(b135, ang == 135)


# --- per-stage bit-exactness ----------------------------------------------

@pytest.mark.parametrize("sigma", SIGMAS)
@pytest.mark.parametrize("shape", [(256, 256), (37, 53)])
def test_blur_bitexact(sigma, shape, test_image):
    img = test_image if shape == (256, 256) else synthetic_image(*shape)
    ours = np.asarray(stages.gaussian_blur(img, sigma))
    ref = golden.gaussian_blur(img, sigma)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("shape", SHAPES[:3])
def test_gradient_bitexact(shape):
    img = synthetic_image(*shape).astype(np.int16)
    gx, gy = stages.xy_gradient(img)
    rgx, rgy = golden.xy_gradient(img)
    np.testing.assert_array_equal(np.asarray(gx, np.int16), rgx)
    np.testing.assert_array_equal(np.asarray(gy, np.int16), rgy)


def test_sobel_bitexact(test_image):
    sm = golden.gaussian_blur(test_image, 1.0)
    mag, ang = stages.sobel(sm)
    rmag, rang = golden.sobel(sm)
    np.testing.assert_array_equal(np.asarray(mag, np.int16), rmag)
    np.testing.assert_array_equal(np.asarray(ang), rang)


def test_nms_bitexact(test_image):
    sm = golden.gaussian_blur(test_image, 1.0)
    mag, ang = golden.sobel(sm)
    ours = np.asarray(stages.nonmax_suppression(mag, ang), np.int16)
    ref = golden.nonmax_suppression(mag, ang)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("thresholds", [(50, 150), (2, 10), (0, 255)])
def test_hysteresis_bitexact(thresholds, test_image):
    mn, mx = thresholds
    sm = golden.gaussian_blur(test_image, 1.0)
    nm = golden.nonmax_suppression(*golden.sobel(sm))
    ours = np.asarray(stages.hysteresis(nm, mn, mx))
    ref = golden.hysteresis(nm, mn, mx)
    np.testing.assert_array_equal(ours, ref)


# --- full pipeline ---------------------------------------------------------

def test_pipeline_baseline_config(test_image):
    """BASELINE.json config 1: test.jpg, sigma=1.0, 50/150 — bit-exact."""
    model = CannyTPU(sigma=1.0)
    ours = np.asarray(model(test_image, 50, 150))
    ref = golden.canny(test_image, 1.0, 50, 150)
    np.testing.assert_array_equal(ours, ref)
    assert set(np.unique(ours)) <= {0, 255}


@pytest.mark.parametrize("backend", ["fused", "xla"])
@pytest.mark.parametrize("sigma", SIGMAS)
@pytest.mark.parametrize("shape", SHAPES)
def test_pipeline_bitexact_sweep(sigma, shape, backend):
    img = synthetic_image(*shape, seed=int(sigma * 10) + shape[0])
    model = CannyTPU(sigma=sigma, backend=backend)
    ours = np.asarray(model(img, 30, 90))
    ref = golden.canny(img, sigma, 30, 90)
    np.testing.assert_array_equal(ours, ref)


def test_pipeline_batched(test_image):
    imgs = np.stack([test_image,
                     synthetic_image(256, 256, seed=7),
                     np.zeros((256, 256), np.uint8),
                     np.full((256, 256), 255, np.uint8)])
    model = CannyTPU(sigma=1.0)
    outs = np.asarray(model.batch(imgs, 50, 150))
    for i in range(imgs.shape[0]):
        np.testing.assert_array_equal(outs[i], golden.canny(imgs[i], 1.0, 50, 150))


def test_validation_mirrors_reference_cli():
    model = CannyTPU(sigma=1.0)
    img = np.zeros((8, 8), np.uint8)
    with pytest.raises(ValueError):
        model(img, 100, 50)   # maxVal <= minVal
    with pytest.raises(ValueError):
        model(img, -1, 50)
    with pytest.raises(ValueError):
        model(img, 0, 256)
    with pytest.raises(TypeError):
        model(img.astype(np.float32), 0, 255)


def test_sobel_model_matches_golden(test_image):
    from canny_edge_tpu.models import SobelTPU

    model = SobelTPU(sigma=1.0)
    mag = np.asarray(model.magnitude(test_image), np.int16)
    sm = golden.gaussian_blur(test_image, 1.0)
    rmag, _ = golden.sobel(sm)
    np.testing.assert_array_equal(mag, rmag)
    edges = np.asarray(model(test_image, 80))
    np.testing.assert_array_equal(edges != 0, rmag >= 80)
    with pytest.raises(ValueError):
        model(test_image, -1)


def test_exact_div_by_vector_adversarial():
    """Vector-reciprocal-seeded divide (2 fixer iterations) must still be
    correctly rounded on near-tie quotients."""
    import jax

    rng = np.random.default_rng(9)
    h, w = 64, 512
    b = rng.uniform(0.3, 1.7, (1, w)).astype(np.float32)
    qs = rng.uniform(0.5, 255, (h, w)).astype(np.float32)
    a = (qs.astype(np.float64) * b.astype(np.float64)).astype(np.float32)
    a[0, :7] = 0.0
    q = np.asarray(jax.jit(numerics.exact_div_by_vector)(a, b))
    np.testing.assert_array_equal(q, a / b)
    # column-vector divisor (the blur y-pass shape)
    bc = rng.uniform(0.3, 1.7, (h, 1)).astype(np.float32)
    ac = (qs.astype(np.float64) * bc.astype(np.float64)).astype(np.float32)
    qc = np.asarray(jax.jit(numerics.exact_div_by_vector)(ac, bc))
    np.testing.assert_array_equal(qc, ac / bc)


def test_hysteresis_frontier_iterations_stat(test_image):
    model = CannyTPU(sigma=1.0)
    out, inter = model.with_intermediates(test_image, 50, 150)
    ref = golden.canny(test_image, 1.0, 50, 150)
    np.testing.assert_array_equal(np.asarray(out), ref)
    iters = int(inter["frontier_iterations"])
    assert iters > 0  # something propagated on a real image


@pytest.mark.parametrize("shape", [(64, 128), (37, 53)])
@pytest.mark.parametrize("thresholds", [(30, 90), (0, 255)])
def test_tall_batched_bitexact(shape, thresholds):
    """Tall-stack batched execution == golden per frame, including the
    min_val=0 flood case (gap rows must never bridge frames)."""
    mn, mx = thresholds
    imgs = np.stack([synthetic_image(*shape, seed=i) for i in range(5)])
    model = CannyTPU(sigma=1.4)
    out = np.asarray(model.batch(imgs, mn, mx))
    for i in range(5):
        np.testing.assert_array_equal(out[i], golden.canny(imgs[i], 1.4, mn, mx))


def test_div_by_near_one_exhaustive():
    """Every mantissa in two binades, for all three near-one divisors that
    the gaussian kernel sums produce (1.0, 1+1ulp, 1-1ulp), vs NumPy's
    correctly rounded division.  This is the proof-by-exhaustion backing
    ops.numerics.div_by_near_one (exponent invariance makes one binade
    sufficient; a second is belt and braces)."""
    import jax

    from canny_edge_tpu.ops.numerics import div_by_near_one, near_one_ulp_offset

    one = np.float32(1.0)
    s_plus = np.int32(one.view(np.int32) + 1).view(np.float32)
    s_minus = np.int32(one.view(np.int32) - 1).view(np.float32)
    for ebase in (127, 104):
        mant = np.arange(1 << 23, dtype=np.int32)
        a = ((np.int32(ebase) << 23) | mant).view(np.float32)
        for s in (s_plus, s_minus, one):
            want = (a / s).astype(np.float32)
            got = np.asarray(jax.jit(lambda x, s=s: div_by_near_one(x, s))(a))
            np.testing.assert_array_equal(got, want)
    for s in (s_plus, s_minus, one):
        assert np.asarray(div_by_near_one(np.float32(0), s)) == 0
    assert near_one_ulp_offset(np.float32(1.5)) is None
    # every supported sigma's kernel sum must be within 1 ulp of 1.0
    for sig in (0.5, 0.75, 1.0, 1.4, 2.0, 2.5, 3.0):
        k = golden.gaussian_kernel(sig)
        s = np.float32(0)
        for t in k:
            s = np.float32(s + t)
        assert near_one_ulp_offset(s) is not None, sig


@pytest.mark.parametrize("shape", [(256, 256), (251, 397), (1530, 260)])
def test_frontend_packed_thresholds_match_nm(shape):
    """frontend_nm_xla(thresholds=...) must equal pack_mask of the nm-path
    threshold masks — covering both the whole-image (H<=1440) and the
    banded (H>1440, interior+special band split) formulations."""
    import jax

    from canny_edge_tpu.golden.reference import gaussian_kernel
    from canny_edge_tpu.ops.packed import pack_mask
    from canny_edge_tpu.ops.window import frontend_nm_xla

    img = synthetic_image(*shape, seed=11)
    kv = tuple(float(v) for v in gaussian_kernel(1.4))
    nm = jax.jit(lambda x: frontend_nm_xla(x, kv))(img)
    weak_ref = np.asarray(pack_mask(nm >= 30))
    strong_ref = np.asarray(pack_mask(nm >= 90))
    weak, strong = jax.jit(lambda x: frontend_nm_xla(
        x, kv, thresholds=(jax.numpy.int32(30), jax.numpy.int32(90))))(img)
    np.testing.assert_array_equal(np.asarray(weak), weak_ref)
    np.testing.assert_array_equal(np.asarray(strong), strong_ref)


def test_auto_chain_lengths_bounded_device_time():
    """Chain planning must keep the long chain under a few seconds of
    estimated device time for every input size (the round-1 constant bug
    produced ~90 s single programs for 64x1080p, which the TPU worker
    watchdog kills)."""
    from canny_edge_tpu.utils.timing import auto_chain_lengths

    for pixels in (256 * 256, 2_073_600, 8_294_400, 64 * 2_073_600,
                   64 * 8_294_400):
        k1, k2 = auto_chain_lengths(pixels)
        assert 4 <= k1 < k2 <= 4000
        est = k2 * pixels * 1.7e-10
        assert est < 5.0, (pixels, k2, est)
