"""Preset ladder and scene-change detection tests."""

import numpy as np
import pytest

from svt_hevc_tpu.bitstream.nal import NalUnitType, split_annexb
from svt_hevc_tpu.config import EncoderConfig
from svt_hevc_tpu.decoder.decoder import decode_stream
from svt_hevc_tpu.pipeline.encoder import Encoder
from svt_hevc_tpu.preset import derive_preset

from test_endtoend import make_frame
from test_inter import moving_sequence


def test_preset_ladder_monotone_features():
    feats = [derive_preset(m) for m in range(12)]
    # RD only at high-quality presets; reduced tools only at the top end
    assert feats[0].rd_mode_decision and feats[2].rd_mode_decision
    assert not feats[7].rd_mode_decision
    assert feats[7].all_intra_modes and not feats[11].all_intra_modes
    # me range never increases with enc_mode
    for a, b in zip(feats, feats[1:]):
        assert b.me_range <= a.me_range


@pytest.mark.parametrize("enc_mode", [2, 7, 11])
def test_presets_all_bitmatch(enc_mode):
    frame = make_frame(64, 64, "edges", seed=enc_mode)
    cfg = EncoderConfig(width=64, height=64, qp=35, enc_mode=enc_mode)
    enc = Encoder(cfg)
    stream, recons = enc.encode([frame])
    dec = decode_stream(stream)[0]
    np.testing.assert_array_equal(recons[0].y, dec.y)
    np.testing.assert_array_equal(recons[0].cb, dec.cb)
    np.testing.assert_array_equal(recons[0].cr, dec.cr)


def test_rd_preset_beats_heuristic_same_tools():
    """M2 (full RD) must beat M7 (heuristic, same mode/ME toolset) on the
    RD cost. (M10/11 use a different reduced toolset and can legitimately
    win on degenerate content, so they are not comparable this way.)"""
    from svt_hevc_tpu.core.rdo import lambda_sse
    frame = make_frame(96, 64, "edges", seed=4)
    costs = {}
    for m in (2, 7):
        cfg = EncoderConfig(width=96, height=64, qp=34, enc_mode=m)
        stream, recons = Encoder(cfg).encode([frame])
        d = float(((recons[0].y.astype(np.int64)
                    - frame.y.astype(np.int64)) ** 2).sum())
        costs[m] = d + lambda_sse(34) * 8 * len(stream)
    assert costs[2] < costs[7], costs


def _slice_types(stream):
    out = []
    for t, _ in split_annexb(stream):
        if t in (NalUnitType.IDR_W_RADL, NalUnitType.TRAIL_R):
            out.append("I" if t == NalUnitType.IDR_W_RADL else "P")
    return out


def test_scene_cut_forces_idr():
    frames = moving_sequence(64, 64, 3, seed=1)
    cut = [make_frame(64, 64, "edges", seed=99)] + \
        moving_sequence(64, 64, 2, seed=50)
    seq = frames + cut
    cfg = EncoderConfig(width=64, height=64, qp=32, intra_period=-1)
    enc = Encoder(cfg)
    stream, recons = enc.encode(seq)
    kinds = _slice_types(stream)
    assert kinds[0] == "I"
    assert kinds[3] == "I", kinds       # the cut frame
    assert kinds[1] == kinds[2] == "P"
    decoded = decode_stream(stream)
    for r, d in zip(recons, decoded):
        np.testing.assert_array_equal(r.y, d.y)


def test_no_false_cut_on_smooth_motion():
    frames = moving_sequence(64, 64, 5, dx=2, dy=1, seed=2)
    cfg = EncoderConfig(width=64, height=64, qp=32, intra_period=-1)
    stream, _ = Encoder(cfg).encode(frames)
    kinds = _slice_types(stream)
    assert kinds == ["I", "P", "P", "P", "P"], kinds


def test_rdoq_improves_rd_cost():
    """RDOQ presets must improve the J = D + lambda*R cost vs plain quant
    at the same RD search level (M4 vs M5 differ in rdoq + nxn)."""
    from svt_hevc_tpu.core.rdo import lambda_sse
    frame = make_frame(96, 96, "gradient")
    costs = {}
    for m in (4, 5):
        cfg = EncoderConfig(width=96, height=96, qp=34, enc_mode=m)
        stream, recons = Encoder(cfg).encode([frame])
        d = float(((recons[0].y.astype(np.int64)
                    - frame.y.astype(np.int64)) ** 2).sum())
        costs[m] = d + lambda_sse(34) * 8 * len(stream)
        dec = decode_stream(stream)[0]
        np.testing.assert_array_equal(recons[0].y, dec.y)
    assert costs[4] < costs[5], costs
