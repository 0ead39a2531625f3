"""Deblocking filter tests: vectorized core vs an independent scalar
implementation of the H.265 8.7.2.5 equations, plus end-to-end bit-match
with the filter enabled."""

import numpy as np
import pytest

from svt_hevc_tpu.core.ctu import PictureState, chroma_qp
from svt_hevc_tpu.core.deblock import (BETA_TABLE, TC_TABLE,
                                       _filter_chroma_vertical,
                                       _filter_luma_vertical,
                                       deblock_picture)

from test_endtoend import make_frame, roundtrip


def clip3(lo, hi, v):
    return max(lo, min(hi, v))


def scalar_luma_vertical(plane, edge, qp):
    """Line-by-line 8.7.2.5.3/8.7.2.5.7, bS=2, 8-bit."""
    out = plane.copy()
    beta = int(BETA_TABLE[clip3(0, 51, qp)])
    tc = int(TC_TABLE[clip3(0, 53, qp + 2)])
    sh, sw = edge.shape
    for s in range(sh):
        for c in range(1, sw):
            if not edge[s, c]:
                continue
            x, y0 = 8 * c, 4 * s
            P = lambda i, k: int(plane[y0 + k, x - 1 - i])   # noqa: E731
            Q = lambda i, k: int(plane[y0 + k, x + i])       # noqa: E731
            dp0 = abs(P(2, 0) - 2 * P(1, 0) + P(0, 0))
            dp3 = abs(P(2, 3) - 2 * P(1, 3) + P(0, 3))
            dq0 = abs(Q(2, 0) - 2 * Q(1, 0) + Q(0, 0))
            dq3 = abs(Q(2, 3) - 2 * Q(1, 3) + Q(0, 3))
            d = dp0 + dp3 + dq0 + dq3
            if d >= beta:
                continue

            def strong_k(k):
                return (2 * (dp0 + dq0 if k == 0 else dp3 + dq3) < (beta >> 2)
                        and abs(P(3, k) - P(0, k)) + abs(Q(0, k) - Q(3, k)) < (beta >> 3)
                        and abs(P(0, k) - Q(0, k)) < ((5 * tc + 1) >> 1))

            strong = strong_k(0) and strong_k(3)
            dEp1 = (dp0 + dp3) < ((beta + (beta >> 1)) >> 3)
            dEq1 = (dq0 + dq3) < ((beta + (beta >> 1)) >> 3)
            for k in range(4):
                p3, p2, p1, p0 = P(3, k), P(2, k), P(1, k), P(0, k)
                q0, q1, q2, q3 = Q(0, k), Q(1, k), Q(2, k), Q(3, k)
                if strong:
                    out[y0 + k, x - 1] = clip3(p0 - 2 * tc, p0 + 2 * tc,
                                               (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3)
                    out[y0 + k, x - 2] = clip3(p1 - 2 * tc, p1 + 2 * tc,
                                               (p2 + p1 + p0 + q0 + 2) >> 2)
                    out[y0 + k, x - 3] = clip3(p2 - 2 * tc, p2 + 2 * tc,
                                               (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3)
                    out[y0 + k, x] = clip3(q0 - 2 * tc, q0 + 2 * tc,
                                           (p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3)
                    out[y0 + k, x + 1] = clip3(q1 - 2 * tc, q1 + 2 * tc,
                                               (p0 + q0 + q1 + q2 + 2) >> 2)
                    out[y0 + k, x + 2] = clip3(q2 - 2 * tc, q2 + 2 * tc,
                                               (p0 + q0 + q1 + 3 * q2 + 2 * q3 + 4) >> 3)
                else:
                    delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
                    if abs(delta) >= 10 * tc:
                        continue
                    dc = clip3(-tc, tc, delta)
                    out[y0 + k, x - 1] = clip3(0, 255, p0 + dc)
                    out[y0 + k, x] = clip3(0, 255, q0 - dc)
                    if dEp1:
                        dcp = clip3(-(tc >> 1), tc >> 1,
                                    (((p2 + p0 + 1) >> 1) - p1 + dc) >> 1)
                        out[y0 + k, x - 2] = clip3(0, 255, p1 + dcp)
                    if dEq1:
                        dcq = clip3(-(tc >> 1), tc >> 1,
                                    (((q2 + q0 + 1) >> 1) - q1 - dc) >> 1)
                        out[y0 + k, x + 1] = clip3(0, 255, q1 + dcq)
    return out


@pytest.mark.parametrize("qp", [22, 32, 45])
@pytest.mark.parametrize("seed", [0, 1])
def test_luma_vertical_matches_scalar(qp, seed):
    rng = np.random.default_rng(seed)
    # blocky content: piecewise-constant 8x8 tiles + noise, so both strong
    # and weak paths trigger
    base = rng.integers(0, 256, (8, 8)).repeat(8, 0).repeat(8, 1)
    plane = np.clip(base + rng.integers(-6, 7, (64, 64)), 0, 255).astype(np.int32)
    edge = rng.random((16, 8)) < 0.7
    want = scalar_luma_vertical(plane, edge, qp)
    got = plane.copy()
    _filter_luma_vertical(got, edge.astype(np.int8) * 2, qp, 8)
    np.testing.assert_array_equal(got, want)


def test_chroma_vertical_matches_scalar():
    rng = np.random.default_rng(3)
    qp_c = chroma_qp(37)
    tc = int(TC_TABLE[qp_c + 2])
    base = rng.integers(0, 256, (4, 4)).repeat(8, 0).repeat(8, 1)
    plane = np.clip(base + rng.integers(-4, 5, (32, 32)), 0, 255).astype(np.int32)
    edge_luma = rng.random((16, 8)) < 0.8    # luma map for a 64x64 area
    got = plane.copy()
    _filter_chroma_vertical(got, edge_luma.astype(np.int8) * 2, qp_c, 8)
    # scalar check
    want = plane.copy()
    for s in range(16):
        for c in range(1, 4):
            if not edge_luma[s, 2 * c]:
                continue
            x, y0 = 8 * c, 2 * s
            for k in range(2):
                p1, p0 = int(plane[y0 + k, x - 2]), int(plane[y0 + k, x - 1])
                q0, q1 = int(plane[y0 + k, x]), int(plane[y0 + k, x + 1])
                d = clip3(-tc, tc, ((((q0 - p0) << 2) + p1 - q1 + 4) >> 3))
                want[y0 + k, x - 1] = clip3(0, 255, p0 + d)
                want[y0 + k, x] = clip3(0, 255, q0 - d)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("kind", ["gradient", "edges", "noise"])
def test_e2e_bitmatch_with_deblocking(kind):
    frame = make_frame(96, 64, kind, seed=6)
    _, recon, dec = roundtrip(frame, qp=37)        # default: deblocking on
    np.testing.assert_array_equal(recon.y, dec.y)
    np.testing.assert_array_equal(recon.cb, dec.cb)
    np.testing.assert_array_equal(recon.cr, dec.cr)


def test_deblocking_actually_filters():
    frame = make_frame(64, 64, "edges", seed=8)
    _, recon_on, _ = roundtrip(frame, qp=45, enable_deblocking=True)
    _, recon_off, _ = roundtrip(frame, qp=45, enable_deblocking=False)
    assert not np.array_equal(recon_on.y, recon_off.y)


def test_deblock_smooths_block_edges():
    """At high QP on a smooth gradient, DLF must reduce blocking: the
    deblocked recon should be closer to the source at CU boundaries."""
    frame = make_frame(64, 64, "gradient")
    _, r_on, _ = roundtrip(frame, qp=45, enable_deblocking=True)
    _, r_off, _ = roundtrip(frame, qp=45, enable_deblocking=False)
    assert r_on.psnr(frame)[0] >= r_off.psnr(frame)[0] - 0.1
