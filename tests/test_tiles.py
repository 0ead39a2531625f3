"""Tile tests: per-tile CABAC substreams with entry points, prediction
breaks at tile boundaries, bit-exact roundtrip."""

import numpy as np
import pytest

from svt_hevc_tpu.config import EncoderConfig
from svt_hevc_tpu.decoder.decoder import decode_stream
from svt_hevc_tpu.pipeline.encoder import Encoder

from test_endtoend import make_frame
from test_inter import moving_sequence


def _roundtrip_tiles(frame, qp, cols, rows, **kw):
    cfg = EncoderConfig(width=frame.width, height=frame.height, qp=qp,
                        tile_columns=cols, tile_rows=rows, **kw)
    enc = Encoder(cfg)
    stream, recons = enc.encode([frame])
    dec = decode_stream(stream)
    return stream, recons[0], dec[0]


@pytest.mark.parametrize("cols,rows", [(2, 1), (1, 2), (2, 2), (3, 2)])
def test_tiles_bitmatch(cols, rows):
    frame = make_frame(96, 64, "edges", seed=cols * 10 + rows)
    _, recon, dec = _roundtrip_tiles(frame, 34, cols, rows)
    np.testing.assert_array_equal(recon.y, dec.y)
    np.testing.assert_array_equal(recon.cb, dec.cb)
    np.testing.assert_array_equal(recon.cr, dec.cr)


def test_tiles_entry_points_present():
    from svt_hevc_tpu.bitstream.bitwriter import ebsp_to_rbsp
    from svt_hevc_tpu.bitstream.headers import (parse_pps, parse_slice_header,
                                                parse_sps)
    from svt_hevc_tpu.bitstream.nal import NalUnitType, split_annexb
    frame = make_frame(128, 64, "noise", seed=2)
    stream, _, _ = _roundtrip_tiles(frame, 35, 2, 1)
    sps = pps = None
    for t, ebsp in split_annexb(stream):
        rbsp = ebsp_to_rbsp(ebsp)
        if t == NalUnitType.SPS_NUT:
            sps = parse_sps(rbsp)
        elif t == NalUnitType.PPS_NUT:
            pps = parse_pps(rbsp)
        elif t == NalUnitType.IDR_W_RADL:
            assert pps.tiles_enabled and pps.tile_columns == 2
            hdr = parse_slice_header(rbsp, int(t), sps, pps)
            assert len(hdr.entry_points) == 1
            assert hdr.entry_points[0] > 0


def test_tiles_with_p_frames():
    frames = moving_sequence(96, 64, 3, dx=2, dy=1, seed=3)
    cfg = EncoderConfig(width=96, height=64, qp=33, intra_period=-1,
                        tile_columns=2, tile_rows=1)
    enc = Encoder(cfg)
    stream, recons = enc.encode(frames)
    decoded = decode_stream(stream)
    for r, d in zip(recons, decoded):
        np.testing.assert_array_equal(r.y, d.y)
        np.testing.assert_array_equal(r.cb, d.cb)
        np.testing.assert_array_equal(r.cr, d.cr)


def test_tiles_with_rd():
    frame = make_frame(64, 64, "gradient")
    cfg = EncoderConfig(width=64, height=64, qp=32, tile_columns=2,
                        tile_rows=2)
    enc = Encoder(cfg)
    stream, recons = enc.encode([frame], rd=True)
    dec = decode_stream(stream)[0]
    np.testing.assert_array_equal(recons[0].y, dec.y)


def test_tile_validation():
    with pytest.raises(ValueError):
        EncoderConfig(width=64, height=64, tile_columns=5).validate()


def test_tile_slice_mode_one_slice_per_tile():
    """tileSliceMode analogue: each tile is an independent slice NAL with
    slice_segment_address; the decoder reassembles the picture."""
    from svt_hevc_tpu.bitstream.nal import NalUnitType, split_annexb
    frame = make_frame(128, 96, "noise", seed=17)
    cfg = EncoderConfig(width=128, height=96, qp=32, ctb_size=32,
                        tile_columns=2, tile_rows=2, tile_slice_mode=1)
    enc = Encoder(cfg)
    stream, recons = enc.encode([frame])
    n_slices = sum(1 for t, _ in split_annexb(stream)
                   if t == NalUnitType.IDR_W_RADL)
    assert n_slices == 4
    decoded = decode_stream(stream)
    np.testing.assert_array_equal(decoded[0].y, recons[0].y)
    np.testing.assert_array_equal(decoded[0].cb, recons[0].cb)
    np.testing.assert_array_equal(decoded[0].cr, recons[0].cr)


def test_tile_slice_mode_inter_multiframe():
    from test_inter import moving_sequence
    frames = moving_sequence(128, 64, 4, dx=2, dy=0, seed=18)
    cfg = EncoderConfig(width=128, height=64, qp=33, ctb_size=32,
                        intra_period=-1, tile_columns=2, tile_rows=1,
                        tile_slice_mode=1)
    stream, recons = Encoder(cfg).encode(frames)
    decoded = decode_stream(stream)
    assert len(decoded) == len(recons)
    for r, d in zip(recons, decoded):
        np.testing.assert_array_equal(r.y, d.y)
        np.testing.assert_array_equal(r.cb, d.cb)


def test_tile_slice_mode_with_adaptive_qp():
    """Per-tile slices x per-CTB QP: the QP prediction chain must reset at
    each tile/slice and survive the multi-slice decode."""
    frame = make_frame(128, 64, "noise", seed=19)
    cfg = EncoderConfig(width=128, height=64, qp=30, ctb_size=32,
                        tile_columns=2, tile_rows=1, tile_slice_mode=1,
                        improve_sharpness=True)
    stream, recons = Encoder(cfg).encode([frame])
    decoded = decode_stream(stream)
    np.testing.assert_array_equal(decoded[0].y, recons[0].y)


def test_mcts_bitmatch_and_constraint(monkeypatch):
    """Motion-constrained tile sets (reference MCTS conformance analogue,
    Tests/SVT-HEVC_FunctionalTests.py:1044-1059): streams decode
    bit-exactly, the MCTS SEI is present, and every MC interpolation
    window used by the DECODER stays inside its own tile."""
    from test_inter import moving_sequence
    from svt_hevc_tpu.bitstream import sei as sei_mod
    from svt_hevc_tpu.bitstream.nal import NalUnitType, split_annexb
    import svt_hevc_tpu.core.inter as inter_mod

    frames = moving_sequence(128, 64, 4, dx=5, dy=2, seed=91)
    cfg = EncoderConfig(width=128, height=64, qp=32, intra_period=-1,
                        tile_columns=2, tile_rows=1, ctb_size=32,
                        constrained_motion_tiles=True,
                        scene_change_detection=False)
    stream, recons = Encoder(cfg).encode(frames)

    # MCTS SEI emitted
    seis = [e for t, e in split_annexb(stream)
            if t == NalUnitType.PREFIX_SEI_NUT]
    types = [m.payload_type for e in seis
             for m in sei_mod.parse_sei_rbsp(bytes(e))]
    assert sei_mod.SEI_TEMPORAL_MCTS in types

    calls = []
    real_luma, real_raw = inter_mod.interp_luma, inter_mod.interp_luma_raw

    def spy_luma(ref, x0, y0, nw, nh, mvx, mvy, bit_depth=8):
        calls.append((x0, y0, nw, nh, mvx, mvy))
        return real_luma(ref, x0, y0, nw, nh, mvx, mvy, bit_depth)

    def spy_raw(ref, x0, y0, nw, nh, mvx, mvy, bit_depth=8):
        calls.append((x0, y0, nw, nh, mvx, mvy))
        return real_raw(ref, x0, y0, nw, nh, mvx, mvy, bit_depth)

    monkeypatch.setattr(inter_mod, "interp_luma", spy_luma)
    monkeypatch.setattr(inter_mod, "interp_luma_raw", spy_raw)
    decoded = decode_stream(stream)
    for i, (r, d) in enumerate(zip(recons, decoded)):
        np.testing.assert_array_equal(r.y, d.y, err_msg=f"frame {i}")
        np.testing.assert_array_equal(r.cb, d.cb)

    assert calls, "expected inter predictions in the decoded stream"
    for x0, y0, nw, nh, mvx, mvy in calls:
        tx0, tx1 = (0, 64) if x0 < 64 else (64, 128)
        ix, fx = x0 + (mvx >> 2), mvx & 3
        iy, fy = y0 + (mvy >> 2), mvy & 3
        assert ix - (3 if fx else 0) >= tx0, (x0, mvx)
        assert ix + nw + (4 if fx else 0) <= tx1, (x0, nw, mvx)
        assert iy - (3 if fy else 0) >= 0, (y0, mvy)
        assert iy + nh + (4 if fy else 0) <= 64, (y0, nh, mvy)
