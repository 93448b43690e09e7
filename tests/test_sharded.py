"""Sharded pipeline tests on the virtual 8-device CPU mesh.

Bit-exactness of the spatially partitioned pipeline (halo exchange +
global-coordinate border masks + distributed hysteresis fixed point) against
the golden oracle, across mesh factorizations.
"""

import jax
import numpy as np
import pytest

from canny_edge_tpu import golden
from canny_edge_tpu.parallel import ShardedCanny, make_mesh
from tests.conftest import synthetic_image

NDEV = len(jax.devices())

pytestmark = pytest.mark.skipif(NDEV < 8, reason="needs 8 devices")


@pytest.mark.parametrize("mesh_shape", [(1, 2, 4), (1, 4, 2), (2, 2, 2),
                                        (8, 1, 1), (1, 1, 8)])
def test_sharded_bitexact(mesh_shape):
    d, y, x = mesh_shape
    mesh = make_mesh(data=d, y=y, x=x)
    H, W = 128, 256
    model = ShardedCanny(mesh, sigma=1.0, image_shape=(H, W))
    rng = np.random.default_rng(0)
    B = 2 * d
    imgs = np.stack([synthetic_image(H, W, seed=i) for i in range(B)])
    out = np.asarray(model(model.shard_batch(imgs), 30, 90))
    for i in range(B):
        ref = golden.canny(imgs[i], 1.0, 30, 90)
        np.testing.assert_array_equal(out[i], ref)


def test_sharded_bitexact_test_image(test_image):
    mesh = make_mesh(data=1, y=2, x=4)
    model = ShardedCanny(mesh, sigma=1.0, image_shape=(256, 256))
    imgs = test_image[None]
    out = np.asarray(model(model.shard_batch(imgs), 50, 150))
    ref = golden.canny(test_image, 1.0, 50, 150)
    np.testing.assert_array_equal(out[0], ref)


def test_sharded_large_sigma_halo():
    """sigma=2 -> window 13 -> halo 6: wide halos cross shard boundaries."""
    mesh = make_mesh(data=1, y=2, x=4)
    H, W = 64, 128
    model = ShardedCanny(mesh, sigma=2.0, image_shape=(H, W))
    img = synthetic_image(H, W, seed=5)
    out = np.asarray(model(model.shard_batch(img[None]), 20, 60))
    ref = golden.canny(img, 2.0, 20, 60)
    np.testing.assert_array_equal(out[0], ref)


def test_sharded_snaking_edge_crosses_shards():
    """A long snaking weak path seeded from one strong pixel must propagate
    across every shard boundary (stresses the multi-round fixed point)."""
    mesh = make_mesh(data=1, y=2, x=4)
    H, W = 64, 128
    img = np.zeros((H, W), np.uint8)
    # serpentine bright path through the image
    for r in range(4, H - 4, 8):
        img[r, 4:W - 4] = 200
    for i, r in enumerate(range(4, H - 12, 8)):
        c = W - 5 if i % 2 == 0 else 4
        img[r:r + 9, c] = 200
    model = ShardedCanny(mesh, sigma=0.5, image_shape=(H, W),
                         hysteresis_steps=4)
    out = np.asarray(model(model.shard_batch(img[None]), 10, 60))
    ref = golden.canny(img, 0.5, 10, 60)
    np.testing.assert_array_equal(out[0], ref)


@pytest.mark.parametrize("shape,min_val", [
    ((129, 250), 30),    # neither dim divides the 2x4 spatial mesh
    ((127, 253), 0),     # min_val=0: every pixel weak; padding must not
                         # bridge components or join the weak set
])
def test_sharded_nondivisible_pad_mask(shape, min_val):
    """SURVEY §7 hard part 5: arbitrary dims shard via internal pad+mask
    (the reference GPU path silently drops remainders, src/cuda.cu:121-122)."""
    mesh = make_mesh(data=1, y=2, x=4)
    H, W = shape
    model = ShardedCanny(mesh, sigma=1.0, image_shape=(H, W))
    assert model.Hp % 2 == 0 and model.Wp % 4 == 0
    img = synthetic_image(H, W, seed=11)
    out = np.asarray(model(model.shard_batch(img[None]), min_val, 90))
    assert out.shape == (1, H, W)
    ref = golden.canny(img, 1.0, min_val, 90)
    np.testing.assert_array_equal(out[0], ref)


def test_sharded_tiny_image_pads_to_halo():
    """Shards smaller than the widest halo are grown by padding instead of
    rejected (the round-1 ValueError)."""
    mesh = make_mesh(data=1, y=2, x=4)
    H, W = 16, 32   # raw shard (8, 8) < 16-wide hysteresis halo
    model = ShardedCanny(mesh, sigma=2.0, image_shape=(H, W),
                         hysteresis_steps=16)
    img = synthetic_image(H, W, seed=3)
    out = np.asarray(model(model.shard_batch(img[None]), 20, 60))
    ref = golden.canny(img, 2.0, 20, 60)
    np.testing.assert_array_equal(out[0], ref)


def test_sharded_call_pads_unpadded_input():
    """__call__ accepts an unpadded (B, H, W) batch directly."""
    mesh = make_mesh(data=1, y=2, x=4)
    H, W = 66, 130
    model = ShardedCanny(mesh, sigma=1.0, image_shape=(H, W))
    img = synthetic_image(H, W, seed=7)
    out = np.asarray(model(img[None], 30, 90))
    ref = golden.canny(img, 1.0, 30, 90)
    np.testing.assert_array_equal(out[0], ref)


def test_sharded_engine_selection():
    """Normal geometry selects the static border-class engine; degenerate
    block geometry (interior blocks whose dependency cone leaves the
    image) falls back to the generic traced-offset engine."""
    mesh = make_mesh(data=1, y=2, x=4)
    assert ShardedCanny(mesh, 1.0, (128, 256)).engine == "static"
    assert ShardedCanny(mesh, 2.0, (10, 12)).engine == "generic"
    with pytest.raises(ValueError):
        ShardedCanny(mesh, 2.0, (10, 12), frontend="static")


@pytest.mark.parametrize("flood", ["xla", "vmem"])
def test_sharded_static_floods_bitexact(flood):
    """Both distributed flood engines (XLA packed / VMEM Pallas kernel in
    interpret mode) are bit-exact vs golden on a spatial mesh."""
    mesh = make_mesh(data=1, y=2, x=4)
    H, W = 96, 200
    model = ShardedCanny(mesh, sigma=1.4, image_shape=(H, W), flood=flood)
    assert model.engine == "static" and model.flood == flood
    img = synthetic_image(H, W, seed=3)
    out = np.asarray(model(model.shard_batch(img[None]), 30, 90))[0]
    sm = golden.gaussian_blur(img, 1.4)
    nm = golden.nonmax_suppression(*golden.sobel(sm))
    np.testing.assert_array_equal(out, golden.hysteresis(nm, 30, 90))


def test_sharded_static_matches_generic():
    """The static border-class engine and the generic traced-offset engine
    produce identical output (both bit-exact chains, same fixed point)."""
    mesh = make_mesh(data=1, y=2, x=4)
    H, W = 66, 120   # odd shape, still statically partitionable at x=4
    img = synthetic_image(H, W, seed=11)
    st = ShardedCanny(mesh, 1.0, (H, W), frontend="static")
    ge = ShardedCanny(mesh, 1.0, (H, W), frontend="generic")
    assert st.engine == "static" and ge.engine == "generic"
    a = np.asarray(st(st.shard_batch(img[None]), 0, 90))
    b = np.asarray(ge(ge.shard_batch(img[None]), 0, 90))
    np.testing.assert_array_equal(a, b)


def test_sharded_tall_block_banded_frontend():
    """Blocks taller than 1440 rows split into statically-offset row bands
    inside the border-class branch (the 4K-over-ICI configuration);
    bit-exact vs golden."""
    mesh = make_mesh(jax.devices()[:1], data=1, y=1, x=1)
    H, W = 1600, 96
    model = ShardedCanny(mesh, sigma=1.4, image_shape=(H, W))
    assert model.engine == "static"
    img = synthetic_image(H, W, seed=5)
    out = np.asarray(model(model.shard_batch(img[None]), 30, 90))[0]
    sm = golden.gaussian_blur(img, 1.4)
    nm = golden.nonmax_suppression(*golden.sobel(sm))
    np.testing.assert_array_equal(out, golden.hysteresis(nm, 30, 90))
