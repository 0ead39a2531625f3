"""Per-CTB adaptive QP (QPM / cu_qp_delta) tests.

Reference analogue: QPM per-LCU QP (EbEncDecProcess.c
QpmDeriveWeightsMinAndMax :1919, applied :2840) signalled via
cu_qp_delta (H.265 7.3.8.10 / 9.3.3.10); improveSharpness /
bitRateReduction API knobs (EbApi.h).
"""

import numpy as np
import pytest

from svt_hevc_tpu.bitstream.bitwriter import ebsp_to_rbsp
from svt_hevc_tpu.bitstream.headers import parse_pps
from svt_hevc_tpu.bitstream.nal import NalUnitType, split_annexb
from svt_hevc_tpu.config import EncoderConfig
from svt_hevc_tpu.decoder.decoder import decode_stream
from svt_hevc_tpu.io.yuv import Frame
from svt_hevc_tpu.pipeline.encoder import Encoder

from test_endtoend import make_frame
from test_inter import moving_sequence


def _roundtrip(cfg, frames, **kw):
    enc = Encoder(cfg)
    stream, recons = enc.encode(frames, **kw)
    decoded = decode_stream(stream)
    assert len(decoded) == len(recons)
    for r, d in zip(recons, decoded):
        np.testing.assert_array_equal(r.y, d.y)
        np.testing.assert_array_equal(r.cb, d.cb)
        np.testing.assert_array_equal(r.cr, d.cr)
    return stream, recons


def test_pps_signals_cu_qp_delta():
    cfg = EncoderConfig(width=64, height=64, qp=32, improve_sharpness=True)
    stream, _ = Encoder(cfg).encode([make_frame(64, 64, "edges", seed=1)])
    for t, e in split_annexb(stream):
        if t == NalUnitType.PPS_NUT:
            pps = parse_pps(ebsp_to_rbsp(e))
            assert pps.cu_qp_delta_enabled
            assert pps.diff_cu_qp_delta_depth == 0


def test_explicit_qp_map_roundtrip():
    """Hand-built map exercising negative, positive, and >=5 (EG0 suffix)
    deltas, plus tile-order QP prediction chaining."""
    frame = make_frame(96, 96, "noise", seed=3)
    cfg = EncoderConfig(width=96, height=96, qp=30, ctb_size=32,
                        improve_sharpness=True)
    qp_map = np.array([[30, 22, 38],
                       [30, 45, 12],
                       [27, 33, 30]], np.int32)
    enc = Encoder(cfg)
    pic = enc.encode_frame(frame, qp_map=qp_map)
    stream = enc.headers() + pic.nal_bytes
    decoded = decode_stream(stream)
    np.testing.assert_array_equal(decoded[0].y, pic.recon.y)
    np.testing.assert_array_equal(decoded[0].cb, pic.recon.cb)


def test_no_cbf_ctb_infers_predicted_qp():
    """A perfectly flat CTB quantizes to all-zero (no cbf anywhere), so no
    delta is coded there and the decoder must infer the predicted QP; the
    stream must still round-trip bit-exact (deblock uses the inferred QP)."""
    rng = np.random.default_rng(5)
    y = np.full((64, 128), 128, np.uint8)
    y[:, 64:] = rng.integers(0, 255, (64, 64), np.uint8)   # right CTB: noise
    frame = Frame(y=y, cb=np.full((32, 64), 100, np.uint8),
                  cr=np.full((32, 64), 140, np.uint8))
    cfg = EncoderConfig(width=128, height=64, qp=30, ctb_size=64,
                        improve_sharpness=True)
    qp_map = np.array([[20, 40]], np.int32)    # flat CTB asks for QP 20
    pic = Encoder(cfg).encode_frame(frame, qp_map=qp_map)
    stream = Encoder(cfg).headers() + pic.nal_bytes
    d = decode_stream(stream)[0]
    np.testing.assert_array_equal(d.y, pic.recon.y)


def test_improve_sharpness_end_to_end():
    frames = [make_frame(96, 64, "edges", seed=s) for s in range(2)]
    cfg = EncoderConfig(width=96, height=64, qp=32, improve_sharpness=True)
    _roundtrip(cfg, frames)


def test_adaptive_qp_inter_and_rd():
    frames = moving_sequence(64, 64, 4, dx=2, dy=1, seed=11)
    cfg = EncoderConfig(width=64, height=64, qp=34, intra_period=-1,
                        improve_sharpness=True, bit_rate_reduction=True)
    _roundtrip(cfg, frames, rd=True)


def test_adaptive_qp_with_tiles():
    """qPY_PREV must reset to the slice QP at each tile start."""
    frame = make_frame(128, 96, "noise", seed=7)
    cfg = EncoderConfig(width=128, height=96, qp=30, ctb_size=32,
                        tile_columns=2, tile_rows=2, improve_sharpness=True)
    _roundtrip(cfg, [frame])


def test_bit_rate_reduction_shrinks_stream():
    frames = [make_frame(96, 96, "noise", seed=9)]
    base = EncoderConfig(width=96, height=96, qp=30)
    brr = base.replace(bit_rate_reduction=True)
    s0, _ = Encoder(base).encode(list(frames))
    s1, _ = Encoder(brr).encode(list(frames))
    assert len(s1) < len(s0)


def test_adaptive_qp_10bit():
    rng = np.random.default_rng(13)
    frame = Frame(y=rng.integers(0, 1023, (64, 64), np.uint16).astype(np.uint16),
                  cb=np.full((32, 32), 512, np.uint16),
                  cr=np.full((32, 32), 512, np.uint16))
    cfg = EncoderConfig(width=64, height=64, qp=30, bit_depth=10,
                        improve_sharpness=True)
    _roundtrip(cfg, [frame])


def test_segment_override_qp():
    """Per-CTB segment overrides (reference SegmentOverride_t semantics,
    EbApi.h:44-68 / EbEncDecProcess.c:2854): direct QP, delta QP and
    deblock-density delta drive the signalled CTB QPs; bit-exact decode."""
    from svt_hevc_tpu.config import (SEG_DENSITY_DEBLOCK_OV,
                                     SEG_DENSITY_QP_OV, SEG_QP_OV_DELTA,
                                     SEG_QP_OV_DIRECT, EncoderConfig)
    from svt_hevc_tpu.decoder.decoder import decode_stream
    from svt_hevc_tpu.io.yuv import Frame
    from svt_hevc_tpu.pipeline.encoder import Encoder

    rng = np.random.default_rng(7)
    y = rng.integers(0, 256, (64, 128)).astype(np.uint8)
    u = rng.integers(0, 256, (32, 64)).astype(np.uint8)
    sov = np.zeros((2, 4, 3), np.int32)     # ctb 32 -> 2x4 grid
    sov[0, 0] = (SEG_DENSITY_QP_OV | SEG_QP_OV_DIRECT, 20, 0)
    sov[0, 1] = (SEG_DENSITY_QP_OV | SEG_QP_OV_DELTA, +6, 0)
    sov[1, 2] = (SEG_DENSITY_DEBLOCK_OV, 0, -4)
    fr = Frame(y=y, cb=u, cr=u.copy(), segment_ov=sov)
    cfg = EncoderConfig(width=128, height=64, qp=32, intra_period=0,
                        ctb_size=32, segment_ov_enabled=True)
    stream, recons = Encoder(cfg).encode([fr])
    decoded = decode_stream(stream)
    np.testing.assert_array_equal(recons[0].y, decoded[0].y)
    np.testing.assert_array_equal(recons[0].cb, decoded[0].cb)
    # wrong grid shape is rejected
    bad = Frame(y=y, cb=u, cr=u.copy(), segment_ov=np.zeros((3, 3, 3), int))
    try:
        Encoder(cfg).encode([bad])
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_min_max_qp_allowed():
    from svt_hevc_tpu.config import EncoderConfig
    from svt_hevc_tpu.io.yuv import Frame
    from svt_hevc_tpu.pipeline.encoder import Encoder
    from svt_hevc_tpu.bitstream.nal import NalUnitType, split_annexb
    from svt_hevc_tpu.bitstream.bitwriter import ebsp_to_rbsp
    from svt_hevc_tpu.bitstream.headers import (parse_pps,
                                                parse_slice_header,
                                                parse_sps)
    y = np.full((64, 64), 100, np.uint8)
    u = np.full((32, 32), 128, np.uint8)
    frames = [Frame(y=y.copy(), cb=u.copy(), cr=u.copy()) for _ in range(3)]
    cfg = EncoderConfig(width=64, height=64, qp=32, intra_period=-1,
                        rate_control_mode=1, target_bitrate=100_000,
                        look_ahead_distance=0, min_qp_allowed=30,
                        max_qp_allowed=34, scene_change_detection=False)
    stream, _ = Encoder(cfg).encode(frames)
    sps = pps = None
    for t, e in split_annexb(stream):
        r = ebsp_to_rbsp(e)
        if t == NalUnitType.SPS_NUT:
            sps = parse_sps(r)
        elif t == NalUnitType.PPS_NUT:
            pps = parse_pps(r)
        elif t in (NalUnitType.IDR_W_RADL, NalUnitType.TRAIL_R,
                   NalUnitType.TRAIL_N):
            hdr = parse_slice_header(r, int(t), sps, pps)
            assert 30 <= hdr.slice_qp <= 34, hdr.slice_qp
