"""Transform matrices vs spec-known rows; forward/inverse roundtrip; quant."""

import numpy as np

from svt_hevc_tpu.core.transforms import (DCT, DST4, forward_transform,
                                          inverse_transform)
from svt_hevc_tpu.core.quant import dequantize, quantize


def test_dct4_matches_spec():
    expected = np.array([
        [64, 64, 64, 64],
        [83, 36, -36, -83],
        [64, -64, -64, 64],
        [36, -83, 83, -36],
    ])
    assert (DCT[4] == expected).all()


def test_dct8_matches_spec():
    expected = np.array([
        [64, 64, 64, 64, 64, 64, 64, 64],
        [89, 75, 50, 18, -18, -50, -75, -89],
        [83, 36, -36, -83, -83, -36, 36, 83],
        [75, -18, -89, -50, 50, 89, 18, -75],
        [64, -64, -64, 64, 64, -64, -64, 64],
        [50, -89, 18, 75, -75, -18, 89, -50],
        [36, -83, 83, -36, -36, 83, -83, 36],
        [18, -50, 75, -89, 89, -75, 50, -18],
    ])
    assert (DCT[8] == expected).all()


def test_dct_subsample_property():
    """g_aiT{N}[k][n] == g_aiT32[k * 32/N][n] (spec structure)."""
    for n in (4, 8, 16):
        step = 32 // n
        assert (DCT[n] == DCT[32][::step, :n]).all()


def test_dct16_row1_matches_spec():
    assert list(DCT[16][1][:8]) == [90, 87, 80, 70, 57, 43, 25, 9]
    assert list(DCT[32][1][:16]) == [90, 90, 88, 85, 82, 78, 73, 67,
                                     61, 54, 46, 38, 31, 22, 13, 4]


def test_dct_near_orthogonal():
    for n in (4, 8, 16, 32):
        t = DCT[n].astype(np.float64)
        g = t @ t.T
        scale = g[0, 0]
        off = g - np.diag(np.diag(g))
        assert np.abs(off).max() / scale < 0.03


def test_forward_inverse_roundtrip_lossless_without_quant():
    rng = np.random.default_rng(0)
    for n in (4, 8, 16, 32):
        for dst in ([False, True] if n == 4 else [False]):
            res = rng.integers(-255, 256, size=(n, n))
            c = forward_transform(res, dst=dst)
            r2 = inverse_transform(c, dst=dst)
            # forward+inverse without quant loses at most rounding error
            tol = {4: 0, 8: 1, 16: 2, 32: 5}[n] + (1 if dst else 0)
            assert np.abs(r2 - res).max() <= tol, (n, dst, np.abs(r2 - res).max())


def test_quant_roundtrip_error_bounded():
    rng = np.random.default_rng(1)
    for qp in (0, 10, 22, 32, 45, 51):
        for n in (4, 8, 16, 32):
            res = rng.integers(-200, 201, size=(n, n))
            c = forward_transform(res)
            lv = quantize(c, qp)
            cq = dequantize(lv, qp)
            r2 = inverse_transform(cq)
            # quant step grows ~2^(qp/6); allow generous but finite error
            step = 2 ** (qp / 6)
            assert np.abs(r2 - res).max() <= max(4.0, 1.5 * step), (qp, n)


def test_quant_zero_at_high_qp_small_residual():
    res = np.ones((8, 8), dtype=np.int64)
    c = forward_transform(res)
    lv = quantize(c, 51)
    assert np.abs(lv).sum() == 0


def test_dc_coefficient_position():
    """Flat residual -> only coeff[0][0]; vertical-only variation -> only
    column 0 (horizontal frequency 0) nonzero. Pins the array convention."""
    flat = np.full((8, 8), 100)
    c = forward_transform(flat)
    assert c[0, 0] != 0
    assert np.abs(c).sum() == abs(c[0, 0])

    vert = np.tile(np.arange(8)[:, None] * 30, (1, 8))  # varies along y only
    c = forward_transform(vert)
    assert np.abs(c[:, 1:]).sum() == 0
    assert np.abs(c[1:, 0]).sum() > 0


def test_dst4_matrix():
    assert (DST4 == np.array([
        [29, 55, 74, 84],
        [74, 74, 0, -74],
        [84, -29, -74, 55],
        [55, -84, 74, -29],
    ])).all()
