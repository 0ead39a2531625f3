"""Native C residual op generation vs the Python reference encoder
(asm_test analogue: bit-level equivalence of backends)."""

import numpy as np
import pytest

from svt_hevc_tpu.bitstream.recorder import CabacRecorder
from svt_hevc_tpu.bitstream.residual import encode_residual
from svt_hevc_tpu.native import native_cabac_lib, residual_ops_native

pytestmark = pytest.mark.skipif(native_cabac_lib() is None,
                                reason="no C compiler")


def _python_ops(coeffs, c_idx, scan_idx):
    rec = CabacRecorder()
    encode_residual(rec, coeffs, c_idx, scan_idx)
    return rec.op_array()


def _cases():
    rng = np.random.default_rng(11)
    for n in (4, 8, 16, 32):
        for c_idx in (0, 1):
            for scan_idx in (0, 1, 2):
                if scan_idx and not (n == 4 or (n == 8 and c_idx == 0)):
                    continue          # mode-dependent scans only there
                for density, mag in ((0.02, 3), (0.2, 8), (0.9, 400),
                                     (1.0, 30000)):
                    c = rng.integers(-mag, mag + 1, (n, n))
                    mask = rng.random((n, n)) < density
                    c = (c * mask).astype(np.int32)
                    if not c.any():
                        c[n - 1, n - 1] = 1
                    yield c, c_idx, scan_idx


def test_residual_ops_equivalence():
    checked = 0
    for coeffs, c_idx, scan_idx in _cases():
        want = _python_ops(coeffs, c_idx, scan_idx)
        got = residual_ops_native(coeffs, c_idx, scan_idx)
        assert got is not None
        assert np.array_equal(got, want), (
            coeffs.shape, c_idx, scan_idx,
            np.nonzero((got[:min(len(got), len(want))] !=
                        want[:min(len(got), len(want))]).any(1))[0][:5])
        checked += 1
    assert checked > 50


def test_residual_ops_single_dc():
    c = np.zeros((16, 16), np.int32)
    c[0, 0] = -1
    want = _python_ops(c, 0, 0)
    got = residual_ops_native(c, 0, 0)
    assert np.array_equal(got, want)


def test_residual_ops_noncontiguous_view():
    rng = np.random.default_rng(4)
    plane = rng.integers(-5, 6, (64, 64)).astype(np.int32)
    view = plane[8:16, 24:32]         # non-contiguous slice
    if not view.any():
        plane[9, 25] = 2
        view = plane[8:16, 24:32]
    want = _python_ops(view, 1, 0)
    got = residual_ops_native(view, 1, 0)
    assert np.array_equal(got, want)
