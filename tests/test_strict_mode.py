"""strict-reference hysteresis mode: bit-equality with the reference BFS.

VERDICT round-1 item 7: the framework's default ("component") rule fixes
the reference BFS's ``current - width > 0`` bounds quirk
(src/utils.cpp:378,399).  The strict-reference mode must instead reproduce
the quirk exactly — oracle: golden.hysteresis_bfs (the literal BFS port).
"""

import numpy as np
import pytest

from canny_edge_tpu import golden
from tests.conftest import synthetic_image

E = 255


def _run_strict(nm, mn, mx):
    import jax
    import jax.numpy as jnp

    from canny_edge_tpu.ops import stages

    return np.asarray(jax.jit(lambda x: stages.hysteresis(
        x.astype(jnp.int32), mn, mx, mode="strict-reference"))(nm))


def test_strict_mode_reproduces_quirk():
    """The counterexample image where component and BFS rules diverge."""
    nm = np.array([[0, 3, 0],
                   [10, 0, 0],
                   [0, 0, 0]], np.int16)
    out = _run_strict(nm, 2, 10)
    np.testing.assert_array_equal(out, golden.hysteresis_bfs(nm, 2, 10))
    # and it really is the quirked result, not the component result
    assert out[0, 1] == 0
    assert golden.hysteresis(nm, 2, 10)[0, 1] == E


def test_strict_mode_quirk_pixel_reachable_other_ways():
    """(0,1) still promotes via (0,0), (1,1), (0,2) or (1,2)."""
    for src in [(0, 0), (1, 1), (0, 2), (1, 2)]:
        nm = np.zeros((4, 4), np.int16)
        nm[0, 1] = 3
        nm[src] = 10
        out = _run_strict(nm, 2, 10)
        np.testing.assert_array_equal(out, golden.hysteresis_bfs(nm, 2, 10))
        assert out[0, 1] == E, src


def test_strict_mode_quirk_pixel_strong_seed():
    """A strong (0,1) seeds itself regardless of the missing edge."""
    nm = np.zeros((3, 3), np.int16)
    nm[1, 0] = 10
    nm[0, 1] = 10
    out = _run_strict(nm, 2, 10)
    np.testing.assert_array_equal(out, golden.hysteresis_bfs(nm, 2, 10))
    assert out[0, 1] == E


@pytest.mark.parametrize("thresholds", [(50, 150), (2, 10), (30, 90)])
def test_strict_mode_generic_images(thresholds, test_image):
    sm = golden.gaussian_blur(test_image, 1.0)
    nm = golden.nonmax_suppression(*golden.sobel(sm))
    out = _run_strict(nm, *thresholds)
    np.testing.assert_array_equal(out,
                                  golden.hysteresis_bfs(nm, *thresholds))


def test_strict_mode_random_sparse_fields():
    """Randomized sparse magnitudes hammer the corner case statistically."""
    rng = np.random.default_rng(7)
    for trial in range(20):
        nm = (rng.random((8, 8)) < 0.4).astype(np.int16) * 5
        nm[rng.integers(0, 8), rng.integers(0, 8)] = 20
        out = _run_strict(nm, 2, 10)
        np.testing.assert_array_equal(
            out, golden.hysteresis_bfs(nm, 2, 10), err_msg=f"trial {trial}")


def _strict_oracle(img, sigma, mn, mx):
    sm = golden.gaussian_blur(img, sigma)
    nm = golden.nonmax_suppression(*golden.sobel(sm))
    return golden.hysteresis_bfs(nm, mn, mx)


@pytest.mark.parametrize("backend", ["fused", "xla", "pallas"])
def test_strict_mode_full_pipeline_model(backend, test_image):
    """End to end through CannyTPU on every production engine.

    Round 4 (VERDICT r3 missing #1): strict mode runs through the SAME
    packed flood engines as component mode — the quirk is one masked bit
    in word 0 of rows 0/1 (ops.packed.strict_fix_packed and the VMEM
    kernel's _strict_fix_t) — so every backend must match the BFS oracle.
    """
    from canny_edge_tpu.models import CannyTPU

    model = CannyTPU(sigma=1.0, backend=backend,
                     hysteresis_mode="strict-reference")
    out = np.asarray(model(test_image, 50, 150))
    np.testing.assert_array_equal(out, _strict_oracle(test_image, 1.0,
                                                      50, 150))


@pytest.mark.parametrize("engine", ["vmem", "xla"])
def test_strict_mode_quirk_image_packed_engines(engine):
    """The divergence counterexample through the packed production floods.

    A weak run along row 0 plus the quirk geometry exercises both the
    or-scan flood entry paths and the dilation fix; the result must equal
    the BFS and differ from the component rule at (0, 1)."""
    import jax

    from canny_edge_tpu.kernels.hysteresis_packed import (
        hysteresis_packed_pallas)
    from canny_edge_tpu.ops.packed import hysteresis_packed

    # 16x64 so the vmem engine really takes the Pallas kernel (its
    # capacity guard reroutes images narrower than 2 packed words)
    nm = np.zeros((16, 64), np.int16)
    nm[1, 0] = 10          # strong; its only 8-neighbor path to the run
    nm[0, 1:10] = 3        # weak run reachable ONLY through (1,0)->(0,1)
    nm[8, 40] = 10         # unrelated strong seed elsewhere
    nm[8, 30:60] = 5       # ... with a weak run the flood must fill
    fn = hysteresis_packed_pallas if engine == "vmem" else hysteresis_packed
    out = np.asarray(jax.jit(
        lambda x: fn(x.astype(np.int32), 2, 10, strict=True))(nm))
    np.testing.assert_array_equal(out, golden.hysteresis_bfs(nm, 2, 10))
    assert out[0, 1] == 0
    assert golden.hysteresis(nm, 2, 10)[0, 1] == E


def test_strict_mode_random_sparse_fields_packed_engines():
    """Randomized small fields through both packed floods vs the BFS."""
    import jax

    from canny_edge_tpu.kernels.hysteresis_packed import (
        hysteresis_packed_pallas)
    from canny_edge_tpu.ops.packed import hysteresis_packed

    rng = np.random.default_rng(11)
    for trial in range(15):
        h = int(rng.integers(2, 12))
        w = int(rng.integers(2, 70))
        nm = (rng.random((h, w)) < 0.45).astype(np.int16) * 5
        nm[rng.integers(0, h), rng.integers(0, w)] = 20
        ref = golden.hysteresis_bfs(nm, 2, 10)
        for fn in (hysteresis_packed, hysteresis_packed_pallas):
            out = np.asarray(jax.jit(
                lambda x, f=fn: f(x.astype(np.int32), 2, 10,
                                  strict=True))(nm))
            np.testing.assert_array_equal(
                out, ref, err_msg=f"trial {trial} {fn.__name__} {h}x{w}")


def test_strict_mode_packed_output(test_image):
    """CannyTPU.packed / batch_packed honor strict mode."""
    from canny_edge_tpu.models import CannyTPU
    from canny_edge_tpu.ops.packed import unpack_edges_np

    model = CannyTPU(sigma=1.0, hysteresis_mode="strict-reference")
    ref = _strict_oracle(test_image, 1.0, 50, 150)
    w = test_image.shape[-1]
    out = unpack_edges_np(np.asarray(model.packed(test_image, 50, 150)), w)
    np.testing.assert_array_equal(out, ref)
    outb = unpack_edges_np(np.asarray(model.batch_packed(
        np.stack([test_image, test_image]), 50, 150)), w)
    np.testing.assert_array_equal(outb[0], ref)
    np.testing.assert_array_equal(outb[1], ref)


NDEV = None


def _ndev():
    import jax

    global NDEV
    if NDEV is None:
        NDEV = len(jax.devices())
    return NDEV


@pytest.mark.parametrize("engine", ["xla", "vmem"])
def test_strict_mode_distributed_flood(engine):
    """The distributed flood's quirk-shard cond: the fix must fire on the
    top-left spatial shard only, at halo-extended coords (row 1, word 1),
    while a second component floods across shard boundaries."""
    import jax
    from jax.sharding import PartitionSpec as P

    if _ndev() < 8:
        pytest.skip("needs 8 devices")
    from canny_edge_tpu.parallel import make_mesh
    from canny_edge_tpu.parallel.sharded import (X_AXIS, Y_AXIS,
                                                 _flood_distributed)
    from canny_edge_tpu.ops.packed import pack_mask, unpack_mask

    nm = np.zeros((16, 128), np.int16)
    nm[1, 0] = 10          # quirk geometry at the global corner
    nm[0, 1:6] = 3
    nm[7, 10:120] = 5      # component crossing 3 shard boundaries...
    nm[7, 100] = 10        # ...seeded from one strong pixel
    mesh = make_mesh(data=1, y=2, x=4)
    hl, wl = 8, 32

    def run(w, s):
        return _flood_distributed(w, s, hl, wl, engine, ny=2, nx=4,
                                  strict=True)

    weak_p = np.asarray(pack_mask(jax.numpy.asarray(nm >= 2)))
    strong_p = np.asarray(pack_mask(jax.numpy.asarray(nm >= 10)))
    fn = jax.jit(jax.shard_map(
        run, mesh=mesh, in_specs=(P(Y_AXIS, X_AXIS), P(Y_AXIS, X_AXIS)),
        out_specs=P(Y_AXIS, X_AXIS), check_vma=False))
    edges_p = fn(weak_p, strong_p)
    out = np.where(np.asarray(unpack_mask(edges_p, 128)), E, 0)
    ref = golden.hysteresis_bfs(nm, 2, 10)
    np.testing.assert_array_equal(out, ref)
    assert out[0, 1] == 0                       # quirk respected
    assert golden.hysteresis(nm, 2, 10)[0, 1] == E
    assert out[7, 10:120].min() == E            # cross-shard flood intact


@pytest.mark.parametrize("mesh_shape,frontend", [
    ((1, 2, 4), "static"),
    ((1, 1, 8), "static"),
    ((1, 2, 4), "generic"),
])
def test_strict_mode_sharded_end_to_end(mesh_shape, frontend, test_image):
    """ShardedCanny(hysteresis_mode='strict-reference') matches the BFS
    oracle on both engines (VERDICT r3 next-step 4: lift the sharded ban)."""
    if _ndev() < 8:
        pytest.skip("needs 8 devices")
    from canny_edge_tpu.parallel import ShardedCanny, make_mesh

    d, y, x = mesh_shape
    mesh = make_mesh(data=d, y=y, x=x)
    model = ShardedCanny(mesh, sigma=1.0, image_shape=test_image.shape,
                         frontend=frontend,
                         hysteresis_mode="strict-reference")
    assert model.engine == frontend
    out = np.asarray(model(model.shard_batch(test_image[None]), 50, 150))[0]
    np.testing.assert_array_equal(out, _strict_oracle(test_image, 1.0,
                                                      50, 150))


def _quirk_image(shape=(128, 256)):
    """Deterministic uint8 input whose full-pipeline strict/component
    outputs DIVERGE at pixel (0, 1) with thresholds (144, 145).

    Found by search over corner patches: after blur(sigma=0.5)+sobel+NMS,
    nm[1,0] is strong, nm[0,1] is weak, and the only promotion path into
    (0,1) is the forbidden directed edge (1,0)->(0,1)."""
    corner = np.array([[122, 140, 225, 71, 74],
                       [230, 67, 252, 59, 57],
                       [136, 47, 164, 232, 168],
                       [128, 9, 222, 235, 150]], np.uint8)
    img = np.zeros(shape, np.uint8)
    img[0:4, 0:5] = corner
    img[shape[0] // 2, shape[1] // 2] = 200
    return img


QUIRK_THRESHOLDS = (144, 145)


@pytest.mark.parametrize("backend", ["fused", "xla", "pallas"])
def test_strict_mode_divergence_single_chip(backend):
    """Every production backend really applies the quirk end to end: on the
    divergence input, strict != component and each matches its oracle."""
    from canny_edge_tpu.models import CannyTPU

    img = _quirk_image()
    mn, mx = QUIRK_THRESHOLDS
    s_out = np.asarray(CannyTPU(
        sigma=0.5, backend=backend,
        hysteresis_mode="strict-reference")(img, mn, mx))
    c_out = np.asarray(CannyTPU(sigma=0.5, backend=backend)(img, mn, mx))
    sm = golden.gaussian_blur(img, 0.5)
    nm = golden.nonmax_suppression(*golden.sobel(sm))
    np.testing.assert_array_equal(s_out, golden.hysteresis_bfs(nm, mn, mx))
    np.testing.assert_array_equal(c_out, golden.hysteresis(nm, mn, mx))
    assert s_out[0, 1] == 0 and c_out[0, 1] == E


@pytest.mark.parametrize("frontend", ["static", "generic"])
def test_strict_mode_sharded_quirk_divergence(frontend):
    """A full sharded strict run must actually exercise the quirk: on the
    divergence input, strict != component through both mesh engines."""
    if _ndev() < 8:
        pytest.skip("needs 8 devices")
    from canny_edge_tpu.parallel import ShardedCanny, make_mesh

    img = _quirk_image()
    mn, mx = QUIRK_THRESHOLDS
    sm = golden.gaussian_blur(img, 0.5)
    nm = golden.nonmax_suppression(*golden.sobel(sm))
    mesh = make_mesh(data=1, y=2, x=4)
    strict_model = ShardedCanny(mesh, sigma=0.5, image_shape=img.shape,
                                frontend=frontend,
                                hysteresis_mode="strict-reference")
    comp_model = ShardedCanny(mesh, sigma=0.5, image_shape=img.shape,
                              frontend=frontend)
    s_out = np.asarray(strict_model(strict_model.shard_batch(img[None]),
                                    mn, mx))[0]
    c_out = np.asarray(comp_model(comp_model.shard_batch(img[None]),
                                  mn, mx))[0]
    np.testing.assert_array_equal(s_out, golden.hysteresis_bfs(nm, mn, mx))
    np.testing.assert_array_equal(c_out, golden.hysteresis(nm, mn, mx))
    assert s_out[0, 1] == 0 and c_out[0, 1] == E


def test_strict_mode_cli_sharded(tmp_path, test_image):
    """--backend sharded --hysteresis strict-reference is now accepted."""
    import cv2

    from canny_edge_tpu.cli import main as cli_main

    src = str(tmp_path / "in.png")
    cv2.imwrite(src, test_image)
    out_path = str(tmp_path / "out.png")
    rc = cli_main([src, "1.0", "50", "150", "-o", out_path,
                   "--hysteresis", "strict-reference",
                   "--backend", "sharded"])
    assert rc == 0
    got = cv2.imread(out_path, cv2.IMREAD_GRAYSCALE)
    np.testing.assert_array_equal(
        got, _strict_oracle(test_image, 1.0, 50, 150).astype(np.uint8))


def test_strict_mode_cli_packed_transfer(tmp_path, test_image):
    """--packed-transfer now supports strict-reference hysteresis."""
    import cv2

    from canny_edge_tpu.cli import main as cli_main

    src = str(tmp_path / "in.png")
    cv2.imwrite(src, test_image)
    out_path = str(tmp_path / "out.png")
    rc = cli_main([src, "1.0", "50", "150", "-o", out_path,
                   "--hysteresis", "strict-reference", "--packed-transfer"])
    assert rc == 0
    got = cv2.imread(out_path, cv2.IMREAD_GRAYSCALE)
    np.testing.assert_array_equal(
        got, _strict_oracle(test_image, 1.0, 50, 150).astype(np.uint8))


def test_strict_mode_cli_flag(tmp_path, test_image):
    import cv2

    from canny_edge_tpu.cli import main as cli_main

    src = str(tmp_path / "in.png")
    cv2.imwrite(src, test_image)
    out_path = str(tmp_path / "out.png")
    rc = cli_main([src, "1.0", "50", "150", "-o", out_path,
                   "--hysteresis", "strict-reference", "--backend", "golden"])
    assert rc == 0
    got = cv2.imread(out_path, cv2.IMREAD_GRAYSCALE)
    sm = golden.gaussian_blur(test_image, 1.0)
    nm = golden.nonmax_suppression(*golden.sobel(sm))
    np.testing.assert_array_equal(
        got, golden.hysteresis_bfs(nm, 50, 150).astype(np.uint8))
