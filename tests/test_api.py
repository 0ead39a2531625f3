"""Streaming API tests (reference EbApi.h surface: send picture ->
get packet, pts/dts, EOS, multi-channel handles)."""

import numpy as np

from svt_hevc_tpu import EncoderConfig, EncoderHandle
from svt_hevc_tpu.decoder.decoder import decode_stream

from test_endtoend import make_frame
from test_inter import moving_sequence


def test_streaming_matches_batch_encode():
    frames = moving_sequence(64, 64, 5, dx=2, dy=1, seed=21)
    cfg = EncoderConfig(width=64, height=64, qp=33, intra_period=-1)
    from svt_hevc_tpu import Encoder
    batch_stream, _ = Encoder(cfg).encode(list(frames))

    h = EncoderHandle(cfg)
    out = [h.stream_header()]
    for f in frames:
        h.send_picture(f)
    h.send_eos()
    pkts = list(h.packets())
    h.close()
    assert [p.pts for p in pkts] == list(range(5))
    assert [p.dts for p in pkts] == list(range(5))
    assert pkts[0].is_idr and pkts[0].slice_type == 2
    assert all(p.slice_type == 1 for p in pkts[1:])
    out += [p.data for p in pkts]
    assert b"".join(out) == batch_stream


def test_streaming_random_access_reorder():
    frames = moving_sequence(64, 64, 9, dx=1, dy=0, seed=22)
    cfg = EncoderConfig(width=64, height=64, qp=34, pred_structure=2,
                        hierarchical_levels=2, intra_period=-1)
    h = EncoderHandle(cfg, return_recon=True)
    stream = [h.stream_header()]
    for f in frames:
        h.send_picture(f)
    h.send_eos()
    pkts = list(h.packets())
    h.close()
    assert [p.dts for p in pkts] == list(range(len(pkts)))
    assert sorted(p.pts for p in pkts) == list(range(9))
    assert [p.pts for p in pkts] != list(range(9))   # really reordered
    stream += [p.data for p in pkts]
    decoded = decode_stream(b"".join(stream))
    by_pts = {p.pts: p for p in pkts}
    for i, d in enumerate(decoded):
        np.testing.assert_array_equal(d.y, by_pts[i].recon.y)


def test_streaming_error_surfaces():
    cfg = EncoderConfig(width=64, height=64, qp=33)
    h = EncoderHandle(cfg)
    bad = make_frame(128, 128, "gradient", seed=1)  # larger than configured
    try:
        # oversized input is now rejected synchronously with the
        # INPUT_FORMAT taxonomy code (svt_hevc_tpu.errors)
        h.send_picture(bad)
        h.send_eos()
        list(h.packets())
        raised = False
    except Exception:
        raised = True
    assert raised


def test_multi_channel_handles():
    frames_a = [make_frame(64, 64, "edges", seed=s) for s in range(2)]
    frames_b = [make_frame(64, 64, "noise", seed=s) for s in range(2)]
    ha = EncoderHandle(EncoderConfig(width=64, height=64, qp=33))
    hb = EncoderHandle(EncoderConfig(width=64, height=64, qp=40))
    for fa, fb in zip(frames_a, frames_b):
        ha.send_picture(fa)
        hb.send_picture(fb)
    ha.send_eos()
    hb.send_eos()
    sa = ha.stream_header() + b"".join(p.data for p in ha.packets())
    sb = hb.stream_header() + b"".join(p.data for p in hb.packets())
    ha.close()
    hb.close()
    assert len(decode_stream(sa)) == 2
    assert len(decode_stream(sb)) == 2
