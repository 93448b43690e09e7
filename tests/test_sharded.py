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


def test_mesh_validation():
    mesh = make_mesh(data=1, y=2, x=4)
    with pytest.raises(ValueError):
        ShardedCanny(mesh, sigma=1.0, image_shape=(128, 250))  # 250 % 4 != 0
    with pytest.raises(ValueError):
        # shard (8, 8) smaller than the 16-wide hysteresis halo
        ShardedCanny(make_mesh(data=1, y=2, x=4), sigma=2.0,
                     image_shape=(16, 32), hysteresis_steps=16)
