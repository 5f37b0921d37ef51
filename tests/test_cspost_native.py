"""Native post-SW forward-backward (native/cspost.cpp) vs the numpy
formulation.  The native code mirrors the reference's scalar op order
(sw-post.c:271-374) while numpy uses SIMD transcendentals, so agreement
is to ~1 ulp, not bitwise."""
import numpy as np
import pytest

from shrimp_tpu.core.sw_cs_batch import (_post_sw_fb_native,
                                         post_sw_forward_backward_batch)
from shrimp_tpu.native import get_lib


@pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fb_native_matches_numpy(seed):
    rng = np.random.default_rng(seed)
    B, L = 64, 48
    ncols = rng.integers(1, L + 1, B)
    cols_let = rng.integers(-1, 4, (B, L))
    cols_col = rng.integers(0, 4, (B, L))
    cols_err = rng.random((B, L)) * 0.7 + 1e-3
    initbp = rng.integers(0, 4, B)
    tn, pn = _post_sw_fb_native(cols_let, cols_col, cols_err, ncols,
                                initbp, 0.01)
    tp, pp = post_sw_forward_backward_batch(
        cols_let, cols_col, cols_err, ncols, initbp, 0.01,
        allow_native=False)
    np.testing.assert_allclose(tn, tp, rtol=1e-11, atol=1e-11)
    valid = np.arange(L)[None, :] < ncols[:, None]
    np.testing.assert_allclose(pn[valid], pp[valid], rtol=1e-9,
                               atol=1e-11)


@pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")
def test_fb_native_single_column():
    tn, pn = _post_sw_fb_native(
        np.array([[2]]), np.array([[1]]), np.array([[0.05]]),
        np.array([1]), np.array([3]), 0.01)
    tp, pp = post_sw_forward_backward_batch(
        np.array([[2]]), np.array([[1]]), np.array([[0.05]]),
        np.array([1]), np.array([3]), 0.01, allow_native=False)
    np.testing.assert_allclose(tn, tp, rtol=1e-12)
    np.testing.assert_allclose(pn[:, :1], pp[:, :1], rtol=1e-11)
