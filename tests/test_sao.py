"""SAO tests: syntax roundtrip, filter application semantics, end-to-end
bit-match with SAO enabled, and quality gain."""

import numpy as np
import pytest

from svt_hevc_tpu.bitstream.cabac import CabacDecoder, CabacEncoder
from svt_hevc_tpu.bitstream.contexts import init_contexts
from svt_hevc_tpu.core.ctu import PictureState
from svt_hevc_tpu.core.sao import (SAO_BAND, SAO_EDGE, SaoCtbParams,
                                   _eo_category_map, apply_sao,
                                   decode_sao_ctb, encode_sao_ctb)

from test_endtoend import make_frame, roundtrip


def _mk_grid(ny, nx, seed=0):
    rng = np.random.default_rng(seed)
    grid = []
    for cy in range(ny):
        row = []
        for cx in range(nx):
            p = SaoCtbParams()
            t = int(rng.integers(0, 3))
            p.type_idx = [t, int(rng.integers(0, 3))]
            p.eo_class = [int(rng.integers(0, 4)), int(rng.integers(0, 4))]
            for comp in range(3):
                p.band_pos[comp] = int(rng.integers(0, 29))
                t_c = p.type_idx[min(comp, 1)]
                if t_c == SAO_EDGE:
                    m = rng.integers(0, 8, 4)
                    p.offsets[comp] = [int(m[0]), int(m[1]), -int(m[2]), -int(m[3])]
                elif t_c == SAO_BAND:
                    p.offsets[comp] = [int(v) for v in rng.integers(-7, 8, 4)]
            row.append(p)
        grid.append(row)
    return grid


def test_sao_syntax_roundtrip():
    ny, nx = 3, 4
    grid = _mk_grid(ny, nx, seed=2)
    enc = CabacEncoder(init_contexts(30))
    for cy in range(ny):
        for cx in range(nx):
            encode_sao_ctb(enc, grid, cx, cy, True, True)
    enc.encode_terminate(1)
    enc.finish()

    dec = CabacDecoder(enc.data, init_contexts(30))
    got = [[SaoCtbParams() for _ in range(nx)] for _ in range(ny)]
    for cy in range(ny):
        for cx in range(nx):
            decode_sao_ctb(dec, got, cx, cy, True, True)
    for cy in range(ny):
        for cx in range(nx):
            want, have = grid[cy][cx], got[cy][cx]
            # compare only fields that are semantically coded
            for c01 in range(2):
                assert have.type_idx[c01] == want.type_idx[c01]
            for comp in range(3):
                t = want.type_idx[min(comp, 1)]
                if t == 0:
                    continue
                assert have.offsets[comp] == want.offsets[comp], (cy, cx, comp)
                if t == SAO_BAND:
                    assert have.band_pos[comp] == want.band_pos[comp]
                elif comp < 2:
                    assert have.eo_class[min(comp, 1)] == want.eo_class[min(comp, 1)]


def test_eo_category_map():
    y = np.array([
        [5, 5, 5, 5],
        [5, 9, 1, 5],
        [5, 5, 5, 5],
        [5, 5, 5, 5],
    ], np.int32)
    cat = _eo_category_map(y, 0)   # horizontal
    assert cat[1, 1] == 4          # local max (peak)
    assert cat[1, 2] == 1          # local min (valley)
    assert cat[2, 1] == 0          # flat
    # boundary pixels invalid
    assert cat[1, 0] == 0 and cat[1, 3] == 0


def test_apply_sao_edge_offsets():
    st = PictureState(64, 64, 30, 6)
    st.planes[0][:] = 100
    st.planes[0][10, 10] = 120     # horizontal peak
    st.planes[0][20, 20] = 80      # horizontal valley
    grid = [[SaoCtbParams()]]
    grid[0][0].type_idx = [SAO_EDGE, 0]
    grid[0][0].eo_class = [0, 0]
    grid[0][0].offsets[0] = [3, 1, -1, -4]
    apply_sao(st, grid, True, False)
    assert st.planes[0][10, 10] == 120 - 4   # category 4 peak
    assert st.planes[0][20, 20] == 80 + 3    # category 1 valley
    assert st.planes[0][30, 30] == 100       # flat untouched


def test_apply_sao_band_offsets():
    st = PictureState(64, 64, 30, 6)
    st.planes[1][:] = 77           # band 77>>3 = 9
    grid = [[SaoCtbParams()]]
    grid[0][0].type_idx = [0, SAO_BAND]
    grid[0][0].band_pos[1] = 8
    grid[0][0].offsets[1] = [0, 5, 0, 0]     # band 9 gets +5
    apply_sao(st, grid, False, True)
    assert (st.planes[1] == 82).all()
    assert (st.planes[2] == 0).all()         # cr offsets zero


@pytest.mark.parametrize("kind", ["edges", "noise"])
def test_e2e_bitmatch_with_sao(kind):
    frame = make_frame(96, 64, kind, seed=9)
    _, recon, dec = roundtrip(frame, qp=40)   # defaults: DLF + SAO on
    np.testing.assert_array_equal(recon.y, dec.y)
    np.testing.assert_array_equal(recon.cb, dec.cb)
    np.testing.assert_array_equal(recon.cr, dec.cr)


def test_sao_improves_psnr_at_high_qp():
    frame = make_frame(96, 96, "edges", seed=12)
    _, r_on, _ = roundtrip(frame, qp=45, enable_sao=True)
    _, r_off, _ = roundtrip(frame, qp=45, enable_sao=False)
    assert r_on.psnr(frame)[0] >= r_off.psnr(frame)[0]


def test_e2e_sao_with_rd():
    from svt_hevc_tpu.config import EncoderConfig
    from svt_hevc_tpu.decoder.decoder import decode_stream
    from svt_hevc_tpu.pipeline.encoder import Encoder
    frame = make_frame(64, 64, "edges", seed=13)
    enc = Encoder(EncoderConfig(width=64, height=64, qp=38))
    stream, recons = enc.encode([frame], rd=True)
    dec = decode_stream(stream)[0]
    np.testing.assert_array_equal(recons[0].y, dec.y)
    np.testing.assert_array_equal(recons[0].cb, dec.cb)
    np.testing.assert_array_equal(recons[0].cr, dec.cr)
