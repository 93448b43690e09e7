"""Pallas kernel bit-exactness vs golden (interpret mode on CPU; the same
tests run compiled on TPU with CANNY_TPU_TEST_PLATFORM=tpu)."""

import numpy as np
import pytest

from canny_edge_tpu import golden
from canny_edge_tpu.golden.reference import gaussian_kernel
from tests.conftest import synthetic_image


def kv(sigma):
    return tuple(float(v) for v in gaussian_kernel(sigma))


@pytest.mark.parametrize("sigma", [0.5, 1.0, 2.0])
@pytest.mark.parametrize("shape", [(256, 256), (100, 200)])
def test_frontend_bitexact(sigma, shape, test_image):
    import jax

    from canny_edge_tpu.kernels import frontend_nm

    img = test_image if shape == (256, 256) else synthetic_image(*shape)
    nm = np.asarray(jax.jit(
        lambda x: frontend_nm(x, kv(sigma), tile=(64, 128)))(img))
    sm = golden.gaussian_blur(img, sigma)
    ref = golden.nonmax_suppression(*golden.sobel(sm))
    np.testing.assert_array_equal(nm.astype(np.int16), ref)


def test_frontend_small_tiles_cross_halo(test_image):
    """Tiny tiles force every stencil to cross tile boundaries."""
    import jax

    from canny_edge_tpu.kernels import frontend_nm

    nm = np.asarray(jax.jit(
        lambda x: frontend_nm(x, kv(1.0), tile=(32, 128)))(test_image))
    sm = golden.gaussian_blur(test_image, 1.0)
    ref = golden.nonmax_suppression(*golden.sobel(sm))
    np.testing.assert_array_equal(nm.astype(np.int16), ref)


@pytest.mark.parametrize("thresholds", [(50, 150), (2, 10)])
def test_hysteresis_pallas_bitexact(thresholds, test_image):
    import jax
    import jax.numpy as jnp

    from canny_edge_tpu.kernels import hysteresis_pallas

    mn, mx = thresholds
    sm = golden.gaussian_blur(test_image, 1.0)
    nm = golden.nonmax_suppression(*golden.sobel(sm))
    out = np.asarray(jax.jit(
        lambda x: hysteresis_pallas(x.astype(jnp.int32), mn, mx,
                                    tile=(64, 128)))(nm))
    ref = golden.hysteresis(nm, mn, mx)
    np.testing.assert_array_equal(out, ref)


def test_hysteresis_pallas_snake():
    """Serpentine chain crossing many tiles needs multiple sweeps."""
    import jax
    import jax.numpy as jnp

    from canny_edge_tpu.kernels import hysteresis_pallas

    H, W = 128, 256
    nm = np.zeros((H, W), np.int16)
    for i, r in enumerate(range(4, H - 4, 8)):
        nm[r, 4:W - 4] = 30
    for i, r in enumerate(range(4, H - 12, 8)):
        c = W - 5 if i % 2 == 0 else 4
        nm[r:r + 9, c] = 30
    nm[4, 4] = 200  # single strong seed at the start of the snake
    out = np.asarray(jax.jit(
        lambda x: hysteresis_pallas(x.astype(jnp.int32), 10, 100,
                                    tile=(32, 128)))(nm))
    ref = golden.hysteresis(nm, 10, 100)
    np.testing.assert_array_equal(out, ref)
    assert (out == 255).sum() > 1000  # the whole snake lit up


@pytest.mark.parametrize("thresholds", [(50, 150), (2, 10)])
@pytest.mark.parametrize("band_h", [16, 64])
def test_hysteresis_banded_bitexact(thresholds, band_h, test_image):
    import jax
    import jax.numpy as jnp

    from canny_edge_tpu.kernels.hysteresis_v2 import hysteresis_banded

    mn, mx = thresholds
    sm = golden.gaussian_blur(test_image, 1.0)
    nm = golden.nonmax_suppression(*golden.sobel(sm))
    out = np.asarray(jax.jit(
        lambda x: hysteresis_banded(x.astype(jnp.int32), mn, mx,
                                    band_h=band_h))(nm))
    ref = golden.hysteresis(nm, mn, mx)
    np.testing.assert_array_equal(out, ref)


def test_hysteresis_banded_spiral():
    """Adversarial inward spiral: many bends, single strong seed at center."""
    import jax
    import jax.numpy as jnp

    from canny_edge_tpu.kernels.hysteresis_v2 import hysteresis_banded

    nm = np.zeros((40, 40), np.int16)
    r0, c0, r1, c1 = 0, 0, 39, 39
    pts = []
    while r0 <= r1 and c0 <= c1:
        for c in range(c0, c1 + 1):
            pts.append((r0, c))
        for r in range(r0 + 1, r1 + 1):
            pts.append((r, c1))
        if r0 < r1:
            for c in range(c1 - 1, c0 - 1, -1):
                pts.append((r1, c))
        if c0 < c1:
            for r in range(r1 - 1, r0 + 1, -1):
                pts.append((r, c0))
        r0 += 2; c0 += 2; r1 -= 2; c1 -= 2
    for (r, c) in pts:
        nm[r, c] = 30
    nm[pts[-1]] = 200
    out = np.asarray(jax.jit(
        lambda x: hysteresis_banded(x.astype(jnp.int32), 10, 100,
                                    band_h=16))(nm))
    np.testing.assert_array_equal(out, golden.hysteresis(nm, 10, 100))


def test_full_pallas_pipeline(test_image):
    from canny_edge_tpu.models import CannyTPU

    model = CannyTPU(sigma=1.0, backend="pallas")
    out = np.asarray(model(test_image, 50, 150))
    ref = golden.canny(test_image, 1.0, 50, 150)
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("impl", ["packed", "packed-xla", "banded", "dilate"])
def test_canny_fused_every_hysteresis_impl(impl, test_image):
    """Every documented hysteresis_impl runs with default (auto) tile.

    Regression: 'dilate' crashed when the tile default became None
    (hysteresis_pallas subscripted tile[0])."""
    import jax

    from canny_edge_tpu.kernels.fused import canny_fused

    out = np.asarray(jax.jit(
        lambda x: canny_fused(x, 50, 150, kernel_vals=kv(1.0),
                              hysteresis_impl=impl))(test_image))
    ref = golden.canny(test_image, 1.0, 50, 150)
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("shape,sigma", [((10, 64), 1.4), ((8, 9), 2.0),
                                         ((5, 300), 1.4), ((300, 6), 1.0)])
def test_frontend_degenerate_shapes(shape, sigma):
    """Images smaller than the dependency-cone diameter (H or W < 2r).

    Regression: the strip windows overhang both image edges; the local
    per-strip padding must supply zeros on both sides."""
    import jax

    from canny_edge_tpu.kernels import frontend_nm

    img = synthetic_image(*shape, seed=11)
    nm = np.asarray(jax.jit(lambda x: frontend_nm(x, kv(sigma)))(img))
    sm = golden.gaussian_blur(img, sigma)
    ref = golden.nonmax_suppression(*golden.sobel(sm))
    np.testing.assert_array_equal(nm.astype(np.int16), ref)
