"""Seeded fuzz sweep: random shapes/sigmas/thresholds vs the golden oracle.

The fixed-parameter suites pin known corner cases; this sweep guards the
combinatorial space between them (odd dims near band boundaries, sigmas
with different window sizes, degenerate thresholds).  Deterministic seeds
keep failures reproducible.
"""

import numpy as np
import pytest

from canny_edge_tpu import golden
from canny_edge_tpu.golden.reference import gaussian_kernel


def _configs():
    rng = np.random.default_rng(20260817)
    cfgs = []
    for i in range(8):
        h = int(rng.integers(16, 700))
        w = int(rng.integers(16, 700))
        sigma = float(rng.choice([0.5, 0.75, 1.0, 1.4, 2.0, 2.5, 3.0]))
        mn = int(rng.integers(0, 80))
        mx = mn + int(rng.integers(1, 120))
        cfgs.append((i, h, w, sigma, mn, mx))
    # band-boundary shapes for the tall (banded) front end
    cfgs.append((8, 1441, 123, 1.0, 30, 90))
    cfgs.append((9, 1447, 257, 2.0, 0, 40))
    return cfgs


@pytest.mark.parametrize("i,h,w,sigma,mn,mx", _configs())
@pytest.mark.parametrize("backend", ["fused", "xla"])
def test_fuzz_bitexact(i, h, w, sigma, mn, mx, backend):
    import jax

    from canny_edge_tpu.models.canny import canny_fn

    rng = np.random.default_rng(1000 + i)
    img = rng.integers(0, 256, (h, w), np.uint8)
    ref = golden.canny(img, sigma, mn, mx)
    kv = tuple(float(v) for v in gaussian_kernel(sigma))
    out = np.asarray(jax.jit(
        lambda x: canny_fn(x, mn, mx, kernel_vals=kv, backend=backend))(img))
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("shape", [(1, 50), (50, 1), (1, 1), (2, 2),
                                   (3, 200), (200, 3)])
@pytest.mark.parametrize("backend", ["fused", "xla", "pallas"])
def test_degenerate_shapes_bitexact(shape, backend):
    """1-pixel-thin and 1x1 images: every border rule degenerates at once
    (blur renormalization over a single tap span, Sobel with all row terms
    dropped, NMS where every neighbour is out of bounds)."""
    import jax

    from canny_edge_tpu.models.canny import canny_fn

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, shape, np.uint8)
    ref = golden.canny(img, 1.0, 50, 150)
    kv = tuple(float(v) for v in gaussian_kernel(1.0))
    out = np.asarray(jax.jit(
        lambda x: canny_fn(x, 50, 150, kernel_vals=kv, backend=backend))(img))
    np.testing.assert_array_equal(out, ref)
