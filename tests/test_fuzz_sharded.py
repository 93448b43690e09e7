"""Seeded fuzz sweep for the sharded backend: random shapes x random mesh
factorizations vs the golden oracle on the virtual 8-device CPU mesh.

tests/test_fuzz_bitexact.py guards the single-chip engines; this sibling
covers the spatially partitioned pipeline, where the bug class lives in
geometry: non-divisible dims must route through the internal pad+mask path
(the reference GPU path silently drops non-multiple-of-32 remainders,
src/cuda.cu:121-122), and degenerate block geometries must fall back to the
generic traced-offset engine instead of miscompiling the static
border-class one.  Deterministic seeds keep failures reproducible.
"""

import jax
import numpy as np
import pytest

from canny_edge_tpu import golden
from canny_edge_tpu.parallel import ShardedCanny, make_mesh

NDEV = len(jax.devices())

pytestmark = pytest.mark.skipif(NDEV < 8, reason="needs 8 devices")

# every factorization of 8 devices into (data, y, x)
MESHES = [(1, 1, 8), (1, 8, 1), (1, 2, 4), (1, 4, 2), (2, 2, 2),
          (2, 1, 4), (2, 4, 1), (4, 2, 1), (4, 1, 2), (8, 1, 1)]


def _configs():
    rng = np.random.default_rng(20260820)
    cfgs = []
    for i in range(10):
        h = int(rng.integers(16, 400))
        w = int(rng.integers(16, 400))
        sigma = float(rng.choice([0.5, 1.0, 1.4, 2.0, 2.5]))
        mn = int(rng.integers(0, 80))
        mx = mn + int(rng.integers(1, 120))
        mesh = MESHES[i % len(MESHES)]
        cfgs.append((i, h, w, sigma, mn, mx, *mesh))
    # pinned geometries the random draw may miss:
    #  - prime dims on the widest spatial mesh (pad+mask on both axes)
    cfgs.append((10, 131, 251, 1.0, 30, 90, 1, 2, 4))
    #  - blocks whose dependency cone leaves the image -> generic engine
    cfgs.append((11, 10, 12, 2.0, 20, 60, 1, 2, 4))
    #  - min_val=0 flood-everything on a data+spatial mesh
    cfgs.append((12, 97, 203, 1.0, 0, 40, 2, 2, 2))
    return cfgs


@pytest.mark.parametrize("i,h,w,sigma,mn,mx,d,my,mx_", _configs())
def test_fuzz_sharded_bitexact(i, h, w, sigma, mn, mx, d, my, mx_):
    mesh = make_mesh(data=d, y=my, x=mx_)
    model = ShardedCanny(mesh, sigma=sigma, image_shape=(h, w))
    rng = np.random.default_rng(2000 + i)
    B = d  # one frame per data-shard row keeps the sweep cheap
    imgs = rng.integers(0, 256, (B, h, w), np.uint8)
    out = np.asarray(model(model.shard_batch(imgs), mn, mx))
    assert out.shape == (B, h, w)
    for b in range(B):
        np.testing.assert_array_equal(
            out[b], golden.canny(imgs[b], sigma, mn, mx),
            err_msg=f"config {i}: {h}x{w} sigma={sigma} "
                    f"thr=({mn},{mx}) mesh=({d},{my},{mx_}) "
                    f"engine={model.engine}")


def test_fuzz_covers_both_engines():
    """The sweep must exercise the pad+mask path and the generic fallback,
    not just happy static geometries."""
    engines = set()
    padded = 0
    for (i, h, w, sigma, mn, mx, d, my, mx_) in _configs():
        mesh = make_mesh(data=d, y=my, x=mx_)
        model = ShardedCanny(mesh, sigma=sigma, image_shape=(h, w))
        engines.add(model.engine)
        if (model.Hp, model.Wp) != (h, w):
            padded += 1
    assert engines == {"static", "generic"}
    assert padded >= 5
