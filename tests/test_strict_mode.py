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


def test_strict_mode_full_pipeline_model(test_image):
    """End to end through CannyTPU(hysteresis_mode=...)."""
    from canny_edge_tpu.models import CannyTPU

    model = CannyTPU(sigma=1.0, hysteresis_mode="strict-reference")
    out = np.asarray(model(test_image, 50, 150))
    sm = golden.gaussian_blur(test_image, 1.0)
    nm = golden.nonmax_suppression(*golden.sobel(sm))
    np.testing.assert_array_equal(out, golden.hysteresis_bfs(nm, 50, 150))


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
