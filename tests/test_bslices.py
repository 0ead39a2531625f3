"""B slices: low-delay B and random-access hierarchical-B tests."""

import numpy as np
import pytest

from svt_hevc_tpu.bitstream.nal import NalUnitType, split_annexb
from svt_hevc_tpu.config import EncoderConfig
from svt_hevc_tpu.core.inter import Mi, mc_predict_bi, mc_predict_uni
from svt_hevc_tpu.decoder.decoder import decode_stream
from svt_hevc_tpu.pipeline.encoder import Encoder

from test_inter import moving_sequence


def test_bi_prediction_averages_14bit():
    rng = np.random.default_rng(0)
    ref0 = [rng.integers(0, 256, (32, 32)).astype(np.int32) for _ in range(3)]
    ref1 = [rng.integers(0, 256, (32, 32)).astype(np.int32) for _ in range(3)]
    ref0[1] = ref0[1][:16, :16]
    ref0[2] = ref0[2][:16, :16]
    ref1[1] = ref1[1][:16, :16]
    ref1[2] = ref1[2][:16, :16]
    # integer MVs: bi = rounded average of the two uni predictions
    py, pcb, pcr = mc_predict_bi(ref0, (4, 8), ref1, (-4, 0), 8, 8, 8)
    u0 = mc_predict_uni(ref0, 8, 8, 8, (4, 8))[0]
    u1 = mc_predict_uni(ref1, 8, 8, 8, (-4, 0))[0]
    np.testing.assert_array_equal(py, (u0 + u1 + 1) >> 1)


def test_low_delay_b_bitmatch():
    frames = moving_sequence(64, 64, 3, dx=2, dy=1, seed=11)
    cfg = EncoderConfig(width=64, height=64, qp=33, intra_period=-1,
                        pred_structure=1)
    enc = Encoder(cfg)
    stream, recons = enc.encode(frames)
    decoded = decode_stream(stream)
    assert len(decoded) == 3
    for i, (r, d) in enumerate(zip(recons, decoded)):
        np.testing.assert_array_equal(r.y, d.y, err_msg=f"frame {i}")
        np.testing.assert_array_equal(r.cb, d.cb)
        np.testing.assert_array_equal(r.cr, d.cr)


@pytest.mark.parametrize("hl,nframes", [(1, 5), (2, 9), (1, 6)])
def test_random_access_bitmatch(hl, nframes):
    frames = moving_sequence(64, 64, nframes, dx=2, dy=1, seed=21)
    cfg = EncoderConfig(width=64, height=64, qp=33, intra_period=-1,
                        pred_structure=2, hierarchical_levels=hl,
                        scene_change_detection=False)
    enc = Encoder(cfg)
    stream, recons = enc.encode(frames)
    decoded = decode_stream(stream)
    assert len(decoded) == nframes
    for i, (r, d) in enumerate(zip(recons, decoded)):
        assert r is not None, f"frame {i} not encoded"
        np.testing.assert_array_equal(r.y, d.y, err_msg=f"frame {i}")
        np.testing.assert_array_equal(r.cb, d.cb)
        np.testing.assert_array_equal(r.cr, d.cr)


def test_random_access_reordering():
    """NALs are emitted in decode order: anchor P before interior Bs."""
    frames = moving_sequence(64, 64, 5, seed=5)
    cfg = EncoderConfig(width=64, height=64, qp=35, intra_period=-1,
                        pred_structure=2, hierarchical_levels=2,
                        scene_change_detection=False)
    stream, _ = Encoder(cfg).encode(frames)
    slices = [t for t, _ in split_annexb(stream)
              if t in (NalUnitType.IDR_W_RADL, NalUnitType.TRAIL_R)]
    # decode order: I0, P4, B2, B1, B3 -> 5 slices, first is IDR
    assert len(slices) == 5
    assert slices[0] == NalUnitType.IDR_W_RADL
    assert all(t == NalUnitType.TRAIL_R for t in slices[1:])


def test_random_access_quality():
    frames = moving_sequence(96, 64, 5, dx=3, dy=1, seed=31)
    cfg = EncoderConfig(width=96, height=64, qp=30, intra_period=-1,
                        pred_structure=2, hierarchical_levels=2,
                        scene_change_detection=False)
    stream, recons = Encoder(cfg).encode(frames)
    for fr, rec in zip(frames, recons):
        assert rec.psnr(fr)[0] > 28.0


def test_b_frames_beat_p_frames_on_rate():
    """Hierarchical B with bi-prediction should not be larger than the
    P-only chain on smooth translating content."""
    frames = moving_sequence(64, 64, 9, dx=1, dy=1, seed=41)
    s_p, _ = Encoder(EncoderConfig(width=64, height=64, qp=33,
                                   intra_period=-1)).encode(frames)
    s_b, _ = Encoder(EncoderConfig(width=64, height=64, qp=33,
                                   intra_period=-1, pred_structure=2,
                                   hierarchical_levels=2,
                                   scene_change_detection=False)).encode(frames)
    assert len(s_b) < len(s_p) * 1.15, (len(s_b), len(s_p))


def test_constrained_intra_bitmatch():
    """With constrained_intra, intra blocks in P frames must not predict
    from inter-reconstructed neighbors; the stream stays bit-exact."""
    frames = moving_sequence(64, 64, 3, dx=4, dy=0, seed=51)
    cfg = EncoderConfig(width=64, height=64, qp=33, intra_period=-1,
                        constrained_intra=True)
    enc = Encoder(cfg)
    stream, recons = enc.encode(frames)
    decoded = decode_stream(stream)
    for r, d in zip(recons, decoded):
        np.testing.assert_array_equal(r.y, d.y)
        np.testing.assert_array_equal(r.cb, d.cb)


def test_low_delay_temporal_layers():
    """Hierarchical low-delay (reference LD prediction structures,
    EbPredictionStructure.c:72-236): 2^hl mini-GOPs, layer-L pictures
    reference a lower layer, top layer is non-ref TRAIL_N with a CQP
    offset, and the stream survives dropping the top layer."""
    from svt_hevc_tpu.bitstream.bitwriter import ebsp_to_rbsp
    from svt_hevc_tpu.bitstream.headers import (parse_pps, parse_slice_header,
                                                parse_sps)
    from svt_hevc_tpu.bitstream.nal import (NalUnitType, nal_header,
                                            split_annexb)
    frames = moving_sequence(64, 64, 9, dx=1, dy=1, seed=31)
    cfg = EncoderConfig(width=64, height=64, qp=30, intra_period=-1,
                        hierarchical_levels=2, scene_change_detection=False)
    stream, recons = Encoder(cfg).encode(frames)

    sps = pps = None
    kinds, qps = [], []
    for t, e in split_annexb(stream):
        rbsp = ebsp_to_rbsp(e)
        if t == NalUnitType.SPS_NUT:
            sps = parse_sps(rbsp)
        elif t == NalUnitType.PPS_NUT:
            pps = parse_pps(rbsp)
        if t in (NalUnitType.IDR_W_RADL, NalUnitType.TRAIL_R,
                 NalUnitType.TRAIL_N):
            kinds.append(int(t))
            qps.append(parse_slice_header(rbsp, int(t), sps, pps).slice_qp)
    # layers over a GOP of 4: pos 0->L0, 1->L2(non-ref), 2->L1, 3->L2
    TN, TR = int(NalUnitType.TRAIL_N), int(NalUnitType.TRAIL_R)
    assert kinds[0] == int(NalUnitType.IDR_W_RADL)
    assert kinds[1:] == [TN, TR, TN, TR, TN, TR, TN, TR][:len(kinds) - 1]
    assert qps[0] == 30
    assert qps[1:5] == [33, 32, 33, 30]      # +L+1 offsets, anchor back to 30

    # full stream decodes bit-exact
    decoded = decode_stream(stream)
    for r, d in zip(recons, decoded):
        np.testing.assert_array_equal(r.y, d.y)

    # dropping every TRAIL_N still decodes (no one references them)
    dropped = b"".join(
        b"\x00\x00\x00\x01" + nal_header(t) + e
        for t, e in split_annexb(stream) if t != NalUnitType.TRAIL_N)
    sub = decode_stream(dropped)
    assert len(sub) == sum(1 for k in kinds if k != TN)
    np.testing.assert_array_equal(sub[0].y, recons[0].y)
    np.testing.assert_array_equal(sub[1].y, recons[2].y)   # layer-1 picture


@pytest.mark.parametrize("hl,nframes", [(4, 17), (5, 33)])
def test_deep_hierarchy_bitmatch(hl, nframes):
    """hierarchical_levels 4/5: mini-GOPs of 16/32 pictures (reference
    5/6-level RA prediction structures, EbPredictionStructure.c:400-637)."""
    frames = moving_sequence(64, 64, nframes, dx=1, dy=1, seed=61)
    cfg = EncoderConfig(width=64, height=64, qp=35, intra_period=-1,
                        pred_structure=2, hierarchical_levels=hl,
                        scene_change_detection=False)
    stream, recons = Encoder(cfg).encode(frames)
    decoded = decode_stream(stream)
    assert len(decoded) == nframes
    for i, (r, d) in enumerate(zip(recons, decoded)):
        np.testing.assert_array_equal(r.y, d.y, err_msg=f"frame {i}")
        np.testing.assert_array_equal(r.cb, d.cb)


def test_random_access_periodic_idr():
    """RA + intra_period N (+ intra_refresh_type 2): closed GOPs with an
    IDR every N+1 pictures (reference intraRefreshType=2, EbApi.h)."""
    frames = moving_sequence(64, 64, 10, dx=2, dy=1, seed=71)
    cfg = EncoderConfig(width=64, height=64, qp=33, intra_period=4,
                        pred_structure=2, hierarchical_levels=2,
                        scene_change_detection=False)
    stream, recons = Encoder(cfg).encode(frames)
    decoded = decode_stream(stream)
    assert len(decoded) == 10
    for i, (r, d) in enumerate(zip(recons, decoded)):
        np.testing.assert_array_equal(r.y, d.y, err_msg=f"frame {i}")
    idrs = [t for t, _ in split_annexb(stream)
            if t in (NalUnitType.IDR_W_RADL, NalUnitType.IDR_N_LP)]
    assert len(idrs) == 2


def test_deep_hierarchy_low_delay():
    """hl=4 low-delay: 16-picture mini-GOPs still bit-match."""
    from test_inter import moving_sequence as seq
    frames = seq(64, 64, 17, dx=1, dy=0, seed=81)
    cfg = EncoderConfig(width=64, height=64, qp=35, intra_period=-1,
                        hierarchical_levels=4, scene_change_detection=False)
    stream, recons = Encoder(cfg).encode(frames)
    decoded = decode_stream(stream)
    for i, (r, d) in enumerate(zip(recons, decoded)):
        np.testing.assert_array_equal(r.y, d.y, err_msg=f"frame {i}")
