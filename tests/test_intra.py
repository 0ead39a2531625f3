"""Intra prediction unit tests: module output vs independent brute-force
scalar implementations of the H.265 8.4.4.2 equations."""

import numpy as np
import pytest

from svt_hevc_tpu.core import intra


def _mk_refs(n, seed=0):
    rng = np.random.default_rng(seed)
    left = rng.integers(0, 256, size=2 * n).astype(np.int32)
    top = rng.integers(0, 256, size=2 * n).astype(np.int32)
    corner = int(rng.integers(0, 256))
    return left, corner, top


# --------------------------------------------------------- brute-force models

def _planar_scalar(left, corner, top, n):
    out = np.zeros((n, n), dtype=np.int64)
    log2 = n.bit_length() - 1
    for y in range(n):
        for x in range(n):
            out[y, x] = ((n - 1 - x) * left[y] + (x + 1) * top[n]
                         + (n - 1 - y) * top[x] + (y + 1) * left[n]
                         + n) >> (log2 + 1)
    return out


def _angular_scalar(left, corner, top, n, mode):
    """Direct 8.4.4.2.6 implementation, per pixel."""
    angle = intra.INTRA_PRED_ANGLE[mode]
    out = np.zeros((n, n), dtype=np.int64)
    if mode >= 18:
        ref = {2 * n + 1: 0}   # read only with weight 0 (ifact == 0)
        for x in range(0, 2 * n + 1):
            ref[x] = corner if x == 0 else top[x - 1]
        if angle < 0:
            inv = intra.INV_ANGLE[mode]
            for x in range(-1, (n * angle) >> 5, -1):
                ref[x] = left[((x * inv + 128) >> 8) - 1]
        for y in range(n):
            iidx = ((y + 1) * angle) >> 5
            ifact = ((y + 1) * angle) & 31
            for x in range(n):
                out[y, x] = ((32 - ifact) * ref[x + iidx + 1]
                             + ifact * ref[x + iidx + 2] + 16) >> 5
    else:
        ref = {2 * n + 1: 0}   # read only with weight 0 (ifact == 0)
        for x in range(0, 2 * n + 1):
            ref[x] = corner if x == 0 else left[x - 1]
        if angle < 0:
            inv = intra.INV_ANGLE[mode]
            for x in range(-1, (n * angle) >> 5, -1):
                ref[x] = top[((x * inv + 128) >> 8) - 1]
        for x in range(n):
            iidx = ((x + 1) * angle) >> 5
            ifact = ((x + 1) * angle) & 31
            for y in range(n):
                out[y, x] = ((32 - ifact) * ref[y + iidx + 1]
                             + ifact * ref[y + iidx + 2] + 16) >> 5
    return out


# ---------------------------------------------------------------------- tests

@pytest.mark.parametrize("n", [4, 8, 16, 32])
def test_planar_matches_scalar(n):
    left, corner, top = _mk_refs(n, seed=n)
    got = intra.predict_intra(left, corner, top, n, intra.PLANAR)
    want = _planar_scalar(left, corner, top, n)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n", [4, 8, 16, 32])
def test_dc_matches_spec(n):
    left, corner, top = _mk_refs(n, seed=10 + n)
    got = intra.predict_intra(left, corner, top, n, intra.DC, c_idx=0)
    dc = (int(top[:n].sum()) + int(left[:n].sum()) + n) >> (n.bit_length())
    if n < 32:
        assert got[0, 0] == (left[0] + 2 * dc + top[0] + 2) >> 2
        assert got[0, 3] == (top[3] + 3 * dc + 2) >> 2
        assert got[3, 0] == (left[3] + 3 * dc + 2) >> 2
        assert (got[1:, 1:] == dc).all()
    else:
        assert (got == dc).all()
    # chroma: no boundary filtering
    got_c = intra.predict_intra(left, corner, top, n, intra.DC, c_idx=1)
    assert (got_c == dc).all()


@pytest.mark.parametrize("n", [4, 8, 16, 32])
@pytest.mark.parametrize("mode", [2, 5, 9, 10, 11, 17, 18, 19, 25, 26, 27, 33, 34])
def test_angular_matches_scalar(n, mode):
    left, corner, top = _mk_refs(n, seed=100 * n + mode)
    got = intra.predict_intra(left, corner, top, n, mode, c_idx=1)  # no edge filt
    want = _angular_scalar(left, corner, top, n, mode)
    np.testing.assert_array_equal(got, want)


def test_pure_vertical_edge_filter():
    n = 8
    left, corner, top = _mk_refs(n, seed=7)
    got = intra.predict_intra(left, corner, top, n, intra.VERTICAL, c_idx=0)
    for y in range(n):
        want = np.clip(top[0] + ((int(left[y]) - corner) >> 1), 0, 255)
        assert got[y, 0] == want
        assert (got[y, 1:] == top[1:n]).all()


def test_pure_horizontal_edge_filter():
    n = 8
    left, corner, top = _mk_refs(n, seed=8)
    got = intra.predict_intra(left, corner, top, n, intra.HORIZONTAL, c_idx=0)
    for x in range(n):
        want = np.clip(left[0] + ((int(top[x]) - corner) >> 1), 0, 255)
        assert got[0, x] == want
    for y in range(1, n):
        assert (got[y, :] == left[y]).all()


def test_ref_substitution_all_unavailable():
    plane = np.full((32, 32), 77, dtype=np.int32)
    avail = np.zeros((8, 8), dtype=bool)
    left, corner, top = intra.build_ref_samples(plane, avail, 0, 0, 8)
    assert (left == 128).all() and (top == 128).all() and corner == 128


def test_ref_substitution_partial():
    plane = np.arange(64 * 64, dtype=np.int32).reshape(64, 64) % 251
    avail = np.zeros((16, 16), dtype=bool)
    avail[:2, :] = True          # top 8 rows reconstructed
    # block at (8, 8): top row available, left column available only for y<8?
    # left col x=7 rows 8..23 unavailable -> propagate from last avail upward
    left, corner, top = intra.build_ref_samples(plane, avail, 8, 8, 8)
    np.testing.assert_array_equal(top, plane[7, 8:24])
    assert corner == plane[7, 7]
    # left: all rows y>=8 at x=7 unavailable -> copy downward from corner side:
    # spec fills from the bottom-most scan position; the first available value
    # walking the scan is the corner -> whole left column becomes corner value
    assert (left == plane[7, 7]).all()


def test_filter_flag_thresholds():
    assert not intra._filter_flag(intra.DC, 16)
    assert not intra._filter_flag(18, 4)
    assert intra._filter_flag(18, 8)          # dist 8 > 7
    assert not intra._filter_flag(25, 8)      # dist 1 <= 7
    assert not intra._filter_flag(25, 16)     # dist 1 <= thresh(16)=1
    assert intra._filter_flag(24, 16)         # dist 2 > 1
    assert intra._filter_flag(27, 32)         # dist 1 > 0


def test_smoothing_filter_values():
    n = 8
    left = np.arange(16, dtype=np.int32) * 3
    top = np.arange(16, dtype=np.int32) * 5
    corner = 100
    fl, fc, ft = intra.filter_ref_samples(left, corner, top, n, 18, 0)
    assert fl[0] == (corner + 2 * left[0] + left[1] + 2) >> 2
    assert fl[5] == (left[4] + 2 * left[5] + left[6] + 2) >> 2
    assert fl[15] == left[15]
    assert ft[0] == (corner + 2 * top[0] + top[1] + 2) >> 2
    assert fc == (left[0] + 2 * corner + top[0] + 2) >> 2


def test_mpm_list_spec_cases():
    # equal, angular: a, 2+((a+29)%32), 2+((a-1)%32)
    assert intra.candidate_mode_list(20, 20) == [20, 19, 21]
    assert intra.candidate_mode_list(2, 2) == [2, 33, 3]
    assert intra.candidate_mode_list(34, 34) == [34, 33, 3]
    # equal, non-angular -> planar, DC, vertical
    assert intra.candidate_mode_list(0, 0) == [0, 1, 26]
    assert intra.candidate_mode_list(1, 1) == [0, 1, 26]
    # distinct
    assert intra.candidate_mode_list(0, 1) == [0, 1, 26]
    assert intra.candidate_mode_list(10, 26) == [10, 26, 0]
    assert intra.candidate_mode_list(0, 26) == [0, 26, 1]
    # unavailable -> DC
    assert intra.candidate_mode_list(None, None) == [0, 1, 26]
    assert intra.candidate_mode_list(None, 7) == [1, 7, 0]
