"""Golden-model tests: ports of the 16 active gtest cases of the reference
(tests/utils/test_utils.cpp) plus internal consistency properties.

Each test cites the gtest it ports.  These pin the golden model to the
reference's exact numeric semantics; all JAX/Pallas implementations are then
tested against the golden model.
"""

import numpy as np
import pytest

from canny_edge_tpu import golden

FLT_EPSILON = np.finfo(np.float32).eps


# --- Gaussian kernel (tests/utils/test_utils.cpp:7-45) ---------------------

def test_kernel_sum_one():
    k = golden.gaussian_kernel(0.5)
    s = np.float32(0)
    for v in k:
        s = np.float32(s + v)
    assert abs(float(s) - 1.0) < FLT_EPSILON


def test_kernel_values_sigma_half():
    expected = np.array(
        [0.0002638651, 0.1064507720, 0.7865707259, 0.1064507720, 0.0002638651],
        np.float32,
    )
    k = golden.gaussian_kernel(0.5)
    assert k.shape == (5,)
    assert np.all(np.abs(k - expected) < FLT_EPSILON)


def test_kernel_symmetry_window13():
    k = golden.gaussian_kernel(2.0)
    assert k.shape[0] == 13
    for i in range(7):
        assert k[i] == k[12 - i]


# --- Gaussian blur on image (tests/utils/test_utils.cpp:47-104) ------------

def test_gaussian_nonzero_and_range(test_image):
    sm = golden.gaussian_blur(test_image, 0.5)
    assert sm.dtype == np.int16
    assert sm.shape == test_image.shape
    assert int(sm.astype(np.int64).sum()) != 0
    assert sm.min() >= 0 and sm.max() <= 255


# --- Gradient (tests/utils/test_utils.cpp:106-208) -------------------------

RAMP3 = np.array([[1, 2, 1], [2, 3, 2], [3, 4, 3]], np.int16)


def test_gradient_dimensions():
    gx, gy = golden.xy_gradient(RAMP3)
    assert gx.shape == (3, 3) and gy.shape == (3, 3)
    assert gx.dtype == np.int16 and gy.dtype == np.int16


def test_gradient_zero_on_constant():
    ones = np.ones((3, 3), np.int16)
    gx, gy = golden.xy_gradient(ones)
    assert np.all(gx == 0)
    assert np.all(gy == 0)


def test_gradient_x_exact():
    gx, _ = golden.xy_gradient(RAMP3)
    expected = np.array([[3, 0, -3], [4, 0, -4], [3, 0, -3]], np.int16)
    np.testing.assert_array_equal(gx, expected)


def test_gradient_y_exact():
    _, gy = golden.xy_gradient(RAMP3)
    expected = np.array([[3, 4, 3], [6, 8, 6], [3, 4, 3]], np.int16)
    np.testing.assert_array_equal(gy, expected)


# --- Sobel (tests/utils/test_utils.cpp:210-230) ----------------------------

def test_sobel_dimensions():
    mag, ang = golden.sobel(np.ones((3, 3), np.int16))
    assert mag.shape == (3, 3) and ang.shape == (3, 3)
    assert set(np.unique(ang)) <= {0, 45, 90, 135}


def test_angle_cases_from_disabled_gtest():
    # tests/utils/test_utils.cpp:253-271 (commented out but encodes intent):
    # gx=1 with gy in {0,-1,1,3,-3} -> bins {0,135,45,90,90}
    gx = np.array([[1, 1, 1, 1, 1]], np.int16)
    gy = np.array([[0, -1, 1, 3, -3]], np.int16)
    expected = np.array([[0, 135, 45, 90, 90]], np.int16)
    np.testing.assert_array_equal(golden.quantize_angle(gx, gy), expected)


def test_angle_integer_predicates_match_cpp_float_path():
    """Exact integer binning == simulated C++ float binning, exhaustively
    over a dense grid plus the adversarial continued-fraction convergents of
    tan(22.5 deg) (closest rational approaches to the bin edges)."""
    r = np.arange(-160, 161)
    gx, gy = np.meshgrid(r, r)
    a = golden.quantize_angle(gx.astype(np.int16), gy.astype(np.int16))
    b = golden.quantize_angle_cpp_float(gx.astype(np.int16), gy.astype(np.int16))
    np.testing.assert_array_equal(a, b)

    # convergents p/q of sqrt(2)-1: the hardest integer pairs
    conv = [(1, 2), (2, 5), (5, 12), (12, 29), (29, 70), (70, 169),
            (169, 408), (408, 985)]
    pts = []
    for p, q in conv:
        for sx in (1, -1):
            for sy in (1, -1):
                pts.append((sx * q, sy * p))
                pts.append((sx * p, sy * q))
                pts.append((sx * (q + p), sy * q))  # near tan(67.5) = q/(q-p)-ish
    gx = np.array([p[0] for p in pts], np.int16)
    gy = np.array([p[1] for p in pts], np.int16)
    np.testing.assert_array_equal(
        golden.quantize_angle(gx, gy), golden.quantize_angle_cpp_float(gx, gy)
    )


def test_magnitude_exact_isqrt():
    rng = np.random.default_rng(0)
    gx = rng.integers(-1020, 1021, size=10000).astype(np.int16)
    gy = rng.integers(-1020, 1021, size=10000).astype(np.int16)
    mag = golden.magnitude_int(gx, gy)
    n = gx.astype(np.int64) ** 2 + gy.astype(np.int64) ** 2
    expected = np.array([int(np.sqrt(float(v))) for v in n])
    # cross-check with math.isqrt
    import math

    expected2 = np.array([math.isqrt(int(v)) for v in n])
    np.testing.assert_array_equal(expected2, mag.astype(np.int64))


# --- NMS (tests/utils/test_utils.cpp:273-347) ------------------------------

def _nms_case(grad, angle, expected):
    g = np.array(grad, np.int16).reshape(3, 3)
    a = np.array(angle, np.int16).reshape(3, 3)
    e = np.array(expected, np.int16).reshape(3, 3)
    np.testing.assert_array_equal(golden.nonmax_suppression(g, a), e)


def test_nms_angle0():
    _nms_case([0, 0, 0, 0, 10, 0, 50, 20, 50],
              [0] * 9,
              [0, 0, 0, 0, 10, 0, 50, 0, 50])


def test_nms_angle45():
    _nms_case([0, 1, 1, 0, 2, 0, 1, 1, 0],
              [0, 45, 45, 45, 45, 45, 45, 45, 0],
              [0, 1, 0, 0, 2, 0, 0, 1, 0])


def test_nms_angle90():
    _nms_case([1, 0, 0, 0, 1, 0, 0, 0, 1],
              [90] * 9,
              [1, 0, 0, 0, 1, 0, 0, 0, 1])


def test_nms_angle135():
    _nms_case([0, 1, 1, 0, 2, 0, 1, 1, 0],
              [135, 135, 0, 135, 135, 135, 0, 135, 135],
              [0, 1, 0, 0, 2, 0, 0, 1, 0])


# --- Hysteresis (tests/utils/test_utils.cpp:349-397) -----------------------

E = golden.EDGE


def test_find_edge_pixels_bfs():
    arr = np.array([5, 6, 0, 5, 5,
                    4, 1, 0, 1, 4,
                    1, 3, 7, 0, 0,
                    10, 9, 8, 0, 0,
                    0, 0, 0, 0, 0], np.int16).reshape(5, 5)
    expected = np.array([E, E, 0, 5, 5,
                         E, 1, 0, 1, 4,
                         1, E, E, 0, 0,
                         E, E, E, 0, 0,
                         0, 0, 0, 0, 0], np.int16).reshape(5, 5)
    visited = np.zeros((5, 5), bool)
    golden.find_edge_pixels(arr, visited, 1, 2, 10, 5, 5)
    np.testing.assert_array_equal(arr, expected)


HYST_IN = np.array([5, 6, 0, 5, 10,
                    4, 1, 0, 1, 4,
                    1, 3, 7, 0, 0,
                    10, 9, 8, 0, 0,
                    0, 0, 0, 0, 0], np.int16).reshape(5, 5)
HYST_OUT = np.array([E, E, 0, E, E,
                     E, 0, 0, 0, E,
                     0, E, E, 0, 0,
                     E, E, E, 0, 0,
                     0, 0, 0, 0, 0], np.int16).reshape(5, 5)


def test_hysteresis_exact():
    np.testing.assert_array_equal(golden.hysteresis_bfs(HYST_IN, 2, 10), HYST_OUT)


def test_hysteresis_component_rule_equals_bfs_on_generic_fields():
    np.testing.assert_array_equal(golden.hysteresis(HYST_IN, 2, 10), HYST_OUT)
    rng = np.random.default_rng(42)
    for _ in range(20):
        nm = rng.integers(0, 40, size=(37, 53)).astype(np.int16)
        nm[rng.random((37, 53)) < 0.6] = 0
        a = golden.hysteresis_bfs(nm, 5, 25)
        b = golden.hysteresis(nm, 5, 25)
        np.testing.assert_array_equal(a, b)


# --- Pipeline-level properties (gap closed vs reference, SURVEY.md §4) -----

def test_pipeline_output_binary(test_image):
    out = golden.canny(test_image, 1.0, 50, 150)
    assert out.dtype == np.int16
    assert set(np.unique(out)) <= {0, 255}


def test_pipeline_threshold_monotonicity(test_image):
    """Raising minVal can only remove edge pixels."""
    lo = golden.canny(test_image, 1.0, 30, 150)
    hi = golden.canny(test_image, 1.0, 80, 150)
    assert np.all((hi == 255) <= (lo == 255))


def test_reference_bfs_row1_col0_quirk():
    """Documents the one deliberate divergence from the reference BFS: its
    upper-diagonal bounds check uses ``current - width > 0`` (not >= 0,
    src/utils.cpp:378,399), so the pixel at (1, 0) never enqueues its
    top-right neighbor.  hysteresis_bfs mirrors the quirk faithfully;
    golden.hysteresis (and every TPU backend) uses the clean 8-connected
    component rule.  See docs/DESIGN.md §5."""
    nm = np.array([[0, 3, 0],
                   [10, 0, 0],
                   [0, 0, 0]], np.int16)
    bfs = golden.hysteresis_bfs(nm, 2, 10)
    comp = golden.hysteresis(nm, 2, 10)
    # reference BFS: only the strong seed survives
    np.testing.assert_array_equal(
        bfs, np.array([[0, 0, 0], [E, 0, 0], [0, 0, 0]], np.int16))
    # component rule: the diagonally-connected weak pixel is promoted
    np.testing.assert_array_equal(
        comp, np.array([[0, E, 0], [E, 0, 0], [0, 0, 0]], np.int16))
