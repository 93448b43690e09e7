"""Bit-packed hysteresis (ops.packed): equivalence vs the golden BFS.

The packed fixed point must land on exactly the BFS result set
(src/utils.cpp:322-427) for every topology: generic images, serpentine
chains, inward spirals, widths not divisible by 32, and min_val=0.
"""

import numpy as np
import pytest

from canny_edge_tpu import golden
from tests.conftest import synthetic_image


def _nm(img, sigma=1.0):
    sm = golden.gaussian_blur(img, sigma)
    return golden.nonmax_suppression(*golden.sobel(sm))


def test_pack_unpack_roundtrip():
    import jax

    from canny_edge_tpu.ops.packed import pack_mask, unpack_mask

    rng = np.random.default_rng(0)
    for w in (32, 64, 61, 250, 129):
        mask = rng.integers(0, 2, (17, w)).astype(bool)
        packed = jax.jit(pack_mask)(mask)
        assert packed.dtype == np.uint32
        assert packed.shape == (17, -(-w // 32))
        back = np.asarray(unpack_mask(packed, w))
        np.testing.assert_array_equal(back, mask)


@pytest.mark.parametrize("thresholds", [(50, 150), (2, 10), (0, 1)])
def test_hysteresis_packed_bitexact(thresholds, test_image):
    import jax
    import jax.numpy as jnp

    from canny_edge_tpu.ops.packed import hysteresis_packed

    mn, mx = thresholds
    nm = _nm(test_image)
    out = np.asarray(jax.jit(
        lambda x: hysteresis_packed(x.astype(jnp.int32), mn, mx))(nm))
    np.testing.assert_array_equal(out, golden.hysteresis(nm, mn, mx))


@pytest.mark.parametrize("shape", [(64, 250), (33, 33), (8, 96)])
def test_hysteresis_packed_odd_widths(shape):
    import jax
    import jax.numpy as jnp

    from canny_edge_tpu.ops.packed import hysteresis_packed

    nm = _nm(synthetic_image(*shape, seed=9))
    out = np.asarray(jax.jit(
        lambda x: hysteresis_packed(x.astype(jnp.int32), 20, 60))(nm))
    np.testing.assert_array_equal(out, golden.hysteresis(nm, 20, 60))


def test_hysteresis_packed_snake():
    """Serpentine chain: propagation must cross word and flood boundaries."""
    import jax
    import jax.numpy as jnp

    from canny_edge_tpu.ops.packed import hysteresis_packed

    H, W = 128, 256
    nm = np.zeros((H, W), np.int16)
    for r in range(4, H - 4, 8):
        nm[r, 4:W - 4] = 30
    for i, r in enumerate(range(4, H - 12, 8)):
        c = W - 5 if i % 2 == 0 else 4
        nm[r:r + 9, c] = 30
    nm[4, 4] = 200
    out = np.asarray(jax.jit(
        lambda x: hysteresis_packed(x.astype(jnp.int32), 10, 100))(nm))
    ref = golden.hysteresis(nm, 10, 100)
    np.testing.assert_array_equal(out, ref)
    assert (out == 255).sum() > 1000


def test_hysteresis_packed_spiral():
    """Inward spiral: many direction changes stress the round structure."""
    import jax
    import jax.numpy as jnp

    from canny_edge_tpu.ops.packed import hysteresis_packed

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
        lambda x: hysteresis_packed(x.astype(jnp.int32), 10, 100))(nm))
    np.testing.assert_array_equal(out, golden.hysteresis(nm, 10, 100))


def test_hysteresis_packed_diagonal_line():
    """Pure 45-degree chain: only the dilation steps advance it."""
    import jax
    import jax.numpy as jnp

    from canny_edge_tpu.ops.packed import hysteresis_packed

    n = 96
    nm = np.zeros((n, n), np.int16)
    for i in range(2, n - 2):
        nm[i, i] = 30
    nm[2, 2] = 200
    out = np.asarray(jax.jit(
        lambda x: hysteresis_packed(x.astype(jnp.int32), 10, 100))(nm))
    np.testing.assert_array_equal(out, golden.hysteresis(nm, 10, 100))
    assert (out == 255).sum() == n - 4


def test_hysteresis_packed_batched(test_image):
    import jax
    import jax.numpy as jnp

    from canny_edge_tpu.ops.packed import hysteresis_packed

    nms = np.stack([_nm(test_image), _nm(synthetic_image(256, 256, seed=4))])
    out = np.asarray(jax.jit(
        lambda x: hysteresis_packed(x.astype(jnp.int32), 30, 90))(nms))
    for i in range(2):
        np.testing.assert_array_equal(out[i],
                                      golden.hysteresis(nms[i], 30, 90))


def test_hysteresis_packed_stats(test_image):
    import jax
    import jax.numpy as jnp

    from canny_edge_tpu.ops.packed import hysteresis_packed_with_stats

    nm = _nm(test_image)
    out, rounds = jax.jit(lambda x: hysteresis_packed_with_stats(
        x.astype(jnp.int32), 30, 90))(nm)
    assert int(rounds) >= 1
    np.testing.assert_array_equal(np.asarray(out),
                                  golden.hysteresis(nm, 30, 90))


@pytest.mark.parametrize("shape", [(64, 250), (17, 40), (1, 40), (40, 1),
                                   (1, 1), (2, 2), (8, 96)])
def test_flood_kernel_layouts_agree(shape):
    """The transposed-layout VMEM flood (production default) and the
    natural-layout kernel produce identical packed edges, both equal to
    the golden BFS (kernels/hysteresis_packed.py layout= param)."""
    import jax
    import jax.numpy as jnp

    from canny_edge_tpu.kernels.hysteresis_packed import (
        hysteresis_packed_pallas_masks)
    from canny_edge_tpu.ops.packed import pack_mask, unpack_mask

    H, W = shape
    rng = np.random.default_rng(hash(shape) % 2**31)
    nm = rng.integers(0, 200, size=(H, W)).astype(np.int16)
    nm[rng.random((H, W)) < 0.05] = 190
    mn, mx = 40, 160

    def run(layout):
        def f(x):
            w = pack_mask(x >= mn)
            s = pack_mask(x >= mx)
            e = hysteresis_packed_pallas_masks(w, s, H, W, layout=layout)
            return jnp.where(unpack_mask(e, W), jnp.int16(255), jnp.int16(0))
        return np.asarray(jax.jit(f)(jnp.asarray(nm, jnp.int32)))

    ref = golden.hysteresis(nm, mn, mx)
    np.testing.assert_array_equal(run("transposed"), ref)
    np.testing.assert_array_equal(run("rows"), ref)


@pytest.mark.parametrize("inner", [1, 2, 5, 19, 33])
def test_flood_inner_dilate_invariance(inner):
    """The flood's fixed point is independent of ``inner_dilate`` — the
    knob trades dilations-per-round against while-loop rounds, never the
    result (guards retunes like the round-5 10->19 change; the production
    value is picked by benchmarks/exp_flood5b.py, not by semantics)."""
    import jax
    import jax.numpy as jnp

    from canny_edge_tpu.kernels.hysteresis_packed import (
        hysteresis_packed_pallas_masks)
    from canny_edge_tpu.ops.packed import pack_mask, unpack_mask

    H, W = 48, 170
    rng = np.random.default_rng(7)
    nm = rng.integers(0, 200, size=(H, W)).astype(np.int16)
    nm[rng.random((H, W)) < 0.05] = 190
    mn, mx = 40, 160
    ref = golden.hysteresis(nm, mn, mx)

    def f(x):
        w = pack_mask(x >= mn)
        s = pack_mask(x >= mx)
        e = hysteresis_packed_pallas_masks(w, s, H, W, inner_dilate=inner)
        return jnp.where(unpack_mask(e, W), jnp.int16(255), jnp.int16(0))

    np.testing.assert_array_equal(
        np.asarray(jax.jit(f)(jnp.asarray(nm, jnp.int32))), ref)


def test_flood_vmem_capacity_guard():
    """Over-VMEM shapes dispatch to the XLA packed flood automatically.

    Calibration (utils/constants.py): 8K fits the VMEM kernel (measured
    compiling + running on v5e), 16K must fall back instead of hitting the
    Mosaic compile cliff.  A tiny explicit budget forces the fallback on a
    small image and the result must stay bit-exact vs the golden BFS.
    """
    import jax
    import jax.numpy as jnp

    from canny_edge_tpu.kernels.hysteresis_packed import (
        flood_fits_vmem, hysteresis_packed_pallas_masks)
    from canny_edge_tpu.ops.packed import pack_mask, unpack_mask

    assert flood_fits_vmem(2160, 3840)          # 4K: VMEM-resident
    assert flood_fits_vmem(4320, 7680)          # 8K: measured working
    assert not flood_fits_vmem(8640, 15360)     # 16K: falls back

    H, W = 64, 250
    rng = np.random.default_rng(7)
    nm = rng.integers(0, 200, size=(H, W)).astype(np.int32)
    nm[rng.random((H, W)) < 0.05] = 190

    def f(x):
        w = pack_mask(x >= 40)
        s = pack_mask(x >= 160)
        e = hysteresis_packed_pallas_masks(w, s, H, W, vmem_budget=1024)
        return jnp.where(unpack_mask(e, W), jnp.int16(255), jnp.int16(0))

    out = np.asarray(jax.jit(f)(jnp.asarray(nm)))
    np.testing.assert_array_equal(out, golden.hysteresis(nm, 40, 160))


def test_fused_backend_over_vmem_dispatch(test_image, monkeypatch):
    """backend="fused" on a frame whose flood exceeds VMEM still produces
    bit-exact output via the automatic XLA-flood dispatch (the production
    path an 8K frame takes; forced here by shrinking the guard)."""
    import jax.numpy as jnp

    from canny_edge_tpu.golden.reference import gaussian_kernel
    from canny_edge_tpu.kernels import hysteresis_packed as hp
    from canny_edge_tpu.models.canny import canny_fn

    monkeypatch.setattr(hp, "flood_fits_vmem", lambda *a, **k: False)
    kernel_vals = tuple(float(v) for v in gaussian_kernel(1.0))
    import jax

    out = jax.jit(lambda x: canny_fn(
        x, jnp.int32(50), jnp.int32(150), kernel_vals=kernel_vals,
        backend="fused"))(test_image)
    sm = golden.gaussian_blur(test_image, 1.0)
    nm = golden.nonmax_suppression(*golden.sobel(sm))
    np.testing.assert_array_equal(np.asarray(out),
                                  golden.hysteresis(nm, 50, 150))


def test_packed_output_api_matches_unpacked(test_image):
    """CannyTPU.packed / batch_packed return the same edge set as the
    int16 pipeline, bit-packed (the 64x1080p batch-output fix —
    benchmarks/exp_batch.py: 265 MB stacked int16 -> 8.3 MB packed)."""
    import jax.numpy as jnp

    from canny_edge_tpu.models import CannyTPU
    from canny_edge_tpu.ops.packed import unpack_edges_np

    model = CannyTPU(sigma=1.0, backend="fused")
    w = test_image.shape[-1]
    full = np.asarray(model(test_image, 50, 150))
    packed = np.asarray(model.packed(test_image, 50, 150))
    assert packed.dtype == np.uint32
    assert packed.shape == (test_image.shape[0], -(-w // 32))
    np.testing.assert_array_equal(unpack_edges_np(packed, w), full)

    batch = np.stack([test_image, test_image[::-1].copy(),
                      np.ascontiguousarray(test_image[:, ::-1])])
    fullb = np.asarray(model.batch(batch, 50, 150))
    packedb = np.asarray(model.batch_packed(batch, 50, 150))
    assert packedb.shape == (3, test_image.shape[0], -(-w // 32))
    np.testing.assert_array_equal(unpack_edges_np(packedb, w), fullb)


def test_packed_output_odd_width():
    """Packed output with W not divisible by 32 (pad bits must stay 0)."""
    from canny_edge_tpu.models import CannyTPU
    from canny_edge_tpu.ops.packed import unpack_edges_np

    img = synthetic_image(40, 61)
    model = CannyTPU(sigma=0.5, backend="fused")
    full = np.asarray(model(img, 30, 90))
    packed = np.asarray(model.packed(img, 30, 90))
    np.testing.assert_array_equal(unpack_edges_np(packed, 61), full)
    # pad bits beyond the image width are zero
    tail_bits = np.asarray(packed)[:, -1] >> np.uint32(61 % 32)
    assert (tail_bits == 0).all()
