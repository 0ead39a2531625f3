"""Residual coding roundtrip: encode->decode must reproduce coefficients
exactly for every size/scan/chroma combination and coefficient pattern.
(Analogue of the reference's bit-exactness asm_test, SURVEY.md §4.)"""

import numpy as np
import pytest

from svt_hevc_tpu.bitstream.cabac import CabacDecoder, CabacEncoder
from svt_hevc_tpu.bitstream.contexts import init_contexts
from svt_hevc_tpu.bitstream.residual import (SCAN_DIAG, SCAN_HOR, SCAN_VER,
                                             _GROUP_IDX, _MIN_IN_GROUP,
                                             decode_residual, encode_residual,
                                             scan_order, select_scan)


def roundtrip(coeffs, c_idx=0, scan_idx=SCAN_DIAG, qp=27):
    n = coeffs.shape[0]
    log2 = n.bit_length() - 1
    enc = CabacEncoder(init_contexts(qp))
    encode_residual(enc, coeffs, c_idx, scan_idx)
    enc.encode_terminate(1)
    enc.finish()
    dec = CabacDecoder(enc.data, init_contexts(qp))
    out = decode_residual(dec, log2, c_idx, scan_idx)
    assert dec.decode_terminate() == 1
    return out


def test_group_idx_table():
    assert list(_GROUP_IDX[:16]) == [0, 1, 2, 3, 4, 4, 5, 5,
                                     6, 6, 6, 6, 7, 7, 7, 7]
    assert _GROUP_IDX[16] == 8 and _GROUP_IDX[23] == 8
    assert _GROUP_IDX[24] == 9 and _GROUP_IDX[31] == 9
    # consistency with min-in-group
    for k in range(32):
        g = _GROUP_IDX[k]
        assert _MIN_IN_GROUP[g] <= k
        if g + 1 < len(_MIN_IN_GROUP):
            assert k < _MIN_IN_GROUP[g + 1]


def test_diag_scan_4x4_spec_order():
    s = scan_order(2, SCAN_DIAG)
    expected = [(0, 0), (0, 1), (1, 0), (0, 2), (1, 1), (2, 0),
                (0, 3), (1, 2), (2, 1), (3, 0), (1, 3), (2, 2),
                (3, 1), (2, 3), (3, 2), (3, 3)]
    assert [tuple(p) for p in s] == expected


def test_scan_covers_all_positions():
    for log2 in (2, 3, 4, 5):
        for sc in (SCAN_DIAG, SCAN_HOR, SCAN_VER):
            s = scan_order(log2, sc)
            n = 1 << log2
            assert len({(x, y) for x, y in s}) == n * n


def test_scan_selection():
    # near-horizontal intra modes -> vertical scan and vice versa
    assert select_scan(2, 0, 10) == SCAN_VER
    assert select_scan(2, 0, 26) == SCAN_HOR
    assert select_scan(2, 0, 0) == SCAN_DIAG
    assert select_scan(3, 0, 10) == SCAN_VER
    assert select_scan(3, 1, 10) == SCAN_DIAG   # chroma 8x8: diag only
    assert select_scan(4, 0, 10) == SCAN_DIAG   # 16x16: diag only
    assert select_scan(2, 1, 26) == SCAN_HOR    # chroma 4x4 mode-dependent
    assert select_scan(3, 0, None) == SCAN_DIAG  # inter


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
def test_single_dc_coeff(log2):
    n = 1 << log2
    c = np.zeros((n, n), dtype=np.int32)
    c[0, 0] = 5
    assert (roundtrip(c) == c).all()


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
def test_single_last_corner(log2):
    n = 1 << log2
    c = np.zeros((n, n), dtype=np.int32)
    c[n - 1, n - 1] = -3
    assert (roundtrip(c) == c).all()


@pytest.mark.parametrize("log2,c_idx", [(2, 0), (3, 0), (4, 0), (5, 0),
                                        (2, 1), (3, 1), (4, 1)])
def test_dense_random(log2, c_idx):
    rng = np.random.default_rng(log2 * 10 + c_idx)
    n = 1 << log2
    for trial in range(8):
        c = rng.integers(-100, 101, size=(n, n)).astype(np.int32)
        assert (roundtrip(c, c_idx=c_idx) == c).all()


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
def test_sparse_random(log2):
    rng = np.random.default_rng(42 + log2)
    n = 1 << log2
    for trial in range(10):
        c = rng.integers(-8, 9, size=(n, n)).astype(np.int32)
        mask = rng.random((n, n)) < 0.1
        c = np.where(mask, c, 0).astype(np.int32)
        if not c.any():
            c[0, 0] = 1
        assert (roundtrip(c) == c).all()


@pytest.mark.parametrize("scan_idx", [SCAN_DIAG, SCAN_HOR, SCAN_VER])
def test_scans_4x4_8x8(scan_idx):
    rng = np.random.default_rng(scan_idx)
    for log2 in (2, 3):
        n = 1 << log2
        for trial in range(6):
            c = rng.integers(-30, 31, size=(n, n)).astype(np.int32)
            if not c.any():
                c[1, 2] = 1
            assert (roundtrip(c, scan_idx=scan_idx) == c).all()


def test_large_levels_rice_escape():
    c = np.zeros((8, 8), dtype=np.int32)
    c[0, 0] = 32767
    c[0, 1] = -32768 + 1
    c[1, 0] = 12345
    c[2, 2] = 3
    assert (roundtrip(c) == c).all()


def test_all_ones_pattern():
    for n in (4, 8, 16, 32):
        c = np.ones((n, n), dtype=np.int32)
        assert (roundtrip(c) == c).all()


def test_inferred_dc_subblock():
    """Nonzero only at a subblock's DC position exercises the
    inferSbDcSigCoeffFlag path."""
    c = np.zeros((16, 16), dtype=np.int32)
    c[15, 15] = 1     # last subblock
    c[4, 4] = 7       # middle subblock, DC-only -> inferred sig
    assert (roundtrip(c) == c).all()


def test_zero_subblock_holes():
    """csbf=0 subblocks between last and DC."""
    c = np.zeros((32, 32), dtype=np.int32)
    c[31, 31] = 2
    c[0, 0] = -9
    assert (roundtrip(c) == c).all()


def test_many_tbs_share_context_state():
    """Multiple TBs through one encoder/decoder pair (context carryover)."""
    rng = np.random.default_rng(3)
    enc = CabacEncoder(init_contexts(32))
    tbs = []
    for log2 in (2, 3, 4, 5, 3, 2, 4):
        n = 1 << log2
        c = rng.integers(-20, 21, size=(n, n)).astype(np.int32)
        if not c.any():
            c[0, 0] = 1
        tbs.append(c)
        encode_residual(enc, c, 0, SCAN_DIAG)
    enc.encode_terminate(1)
    enc.finish()
    dec = CabacDecoder(enc.data, init_contexts(32))
    for c in tbs:
        out = decode_residual(dec, c.shape[0].bit_length() - 1, 0, SCAN_DIAG)
        assert (out == c).all()
    assert dec.decode_terminate() == 1
