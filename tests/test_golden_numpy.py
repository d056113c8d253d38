"""The reference's own 11 golden vectors against our local kernels.

Vectors transcribed from /root/reference/src/lib.rs:806-1076 (see
FIXTURES.md F1/F2). Fill is +inf exactly as the reference recommends
(src/lib.rs:18-20: "NaN doesn't equal itself").
"""

import numpy as np
import pytest

from time_sift_spark.interop import lag_matrix_2d_np, lag_matrix_np

INF = np.inf
DATA_1D = [42.0, 40.0, 38.0, 36.0]
# series 0 = 1..4, series 1 = -1..-4 (src/lib.rs:925-1075)
ROWS_2D = np.array([[1.0, 2.0, 3.0, 4.0], [-1.0, -2.0, -3.0, -4.0]])
COLS_2D = ROWS_2D.T


def test_lag_full_set():  # src/lib.rs:810-838
    out = lag_matrix_np(DATA_1D, range(0, 4), INF, 0)
    expected = np.array(
        [
            [42.0, 40.0, 38.0, 36.0],
            [INF, 42.0, 40.0, 38.0],
            [INF, INF, 42.0, 40.0],
            [INF, INF, INF, 42.0],
        ]
    )
    assert out.shape == (4, 4)
    np.testing.assert_array_equal(out, expected)


def test_lag_unordered_subset():  # src/lib.rs:840-865, lags [1, 3, 2]
    out = lag_matrix_np(DATA_1D, [1, 3, 2], INF, 0)
    expected = np.array(
        [
            [INF, 42.0, 40.0, 38.0],
            [INF, INF, INF, 42.0],
            [INF, INF, 42.0, 40.0],
        ]
    )
    np.testing.assert_array_equal(out, expected)


def test_lag_duplicates():  # duplicates legal (src/lib.rs:493 Vec::from_iter)
    out = lag_matrix_np(DATA_1D, [1, 1], INF, 0)
    np.testing.assert_array_equal(out[0], out[1])
    assert out.shape == (2, 4)


@pytest.mark.parametrize("stride,pad", [(5, 1), (8, 4)])
def test_strided_lag(stride, pad):  # src/lib.rs:867-894 and :896-923
    out = lag_matrix_np(DATA_1D, range(0, 4), INF, stride)
    assert out.shape == (4, stride)
    np.testing.assert_array_equal(out[:, 4:], np.full((4, pad), INF))
    np.testing.assert_array_equal(out[0, :4], DATA_1D)
    np.testing.assert_array_equal(out[3, :4], [INF, INF, INF, 42.0])


def test_lag_2d_rowwise():  # src/lib.rs:925-961, stride 5
    out = lag_matrix_2d_np(ROWS_2D, "row", range(0, 4), INF, 5)
    expected = np.array(
        [
            [1.0, 2.0, 3.0, 4.0, INF],
            [-1.0, -2.0, -3.0, -4.0, INF],
            [INF, 1.0, 2.0, 3.0, INF],
            [INF, -1.0, -2.0, -3.0, INF],
            [INF, INF, 1.0, 2.0, INF],
            [INF, INF, -1.0, -2.0, INF],
            [INF, INF, INF, 1.0, INF],
            [INF, INF, INF, -1.0, INF],
        ]
    )
    assert out.shape == (8, 5)
    np.testing.assert_array_equal(out, expected)


def test_lag_2d_rowwise_unordered():  # src/lib.rs:963-997, lags [1,3,2], stride 5
    out = lag_matrix_2d_np(ROWS_2D, "row", [1, 3, 2], INF, 5)
    expected = np.array(
        [
            [INF, 1.0, 2.0, 3.0, INF],
            [INF, -1.0, -2.0, -3.0, INF],
            [INF, INF, INF, 1.0, INF],
            [INF, INF, INF, -1.0, INF],
            [INF, INF, 1.0, 2.0, INF],
            [INF, INF, -1.0, -2.0, INF],
        ]
    )
    np.testing.assert_array_equal(out, expected)


def test_lag_2d_columnwise():  # src/lib.rs:999-1039, stride 9
    out = lag_matrix_2d_np(COLS_2D, "col", range(0, 4), INF, 9)
    expected = np.array(
        [
            [1.0, -1.0, INF, INF, INF, INF, INF, INF, INF],
            [2.0, -2.0, 1.0, -1.0, INF, INF, INF, INF, INF],
            [3.0, -3.0, 2.0, -2.0, 1.0, -1.0, INF, INF, INF],
            [4.0, -4.0, 3.0, -3.0, 2.0, -2.0, 1.0, -1.0, INF],
        ]
    )
    assert out.shape == (4, 9)
    np.testing.assert_array_equal(out, expected)


def test_lag_2d_columnwise_unordered():  # src/lib.rs:1041-1075, lags [1,3,2], stride 7
    out = lag_matrix_2d_np(COLS_2D, "col", [1, 3, 2], INF, 7)
    expected = np.array(
        [
            [INF, INF, INF, INF, INF, INF, INF],
            [1.0, -1.0, INF, INF, INF, INF, INF],
            [2.0, -2.0, INF, INF, 1.0, -1.0, INF],
            [3.0, -3.0, 1.0, -1.0, 2.0, -2.0, INF],
        ]
    )
    np.testing.assert_array_equal(out, expected)


def test_non_square_rowwise():
    # Non-square case the reference lacks — guards quirk Q3 (SURVEY §2.1):
    # series of length 5, 2 lags, 1 series.
    data = np.array([[10.0, 20.0, 30.0, 40.0, 50.0]])
    out = lag_matrix_2d_np(data, "row", [0, 2], INF, 0)
    expected = np.array(
        [
            [10.0, 20.0, 30.0, 40.0, 50.0],
            [INF, INF, 10.0, 20.0, 30.0],
        ]
    )
    assert out.shape == (2, 5)
    np.testing.assert_array_equal(out, expected)


def test_non_square_colwise():
    data = np.array([[10.0], [20.0], [30.0], [40.0], [50.0]])  # D=5, S=1
    out = lag_matrix_2d_np(data, "col", [1, 0], INF, 0)
    expected = np.array(
        [
            [INF, 10.0],
            [10.0, 20.0],
            [20.0, 30.0],
            [30.0, 40.0],
            [40.0, 50.0],
        ]
    )
    assert out.shape == (5, 2)
    np.testing.assert_array_equal(out, expected)
