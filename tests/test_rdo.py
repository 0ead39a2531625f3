"""RD mode decision tests: bit-exact conformance must hold through RD, and
RD must beat the heuristic encoder on rate-distortion."""

import numpy as np
import pytest

from svt_hevc_tpu.config import EncoderConfig
from svt_hevc_tpu.decoder.decoder import decode_stream
from svt_hevc_tpu.pipeline.encoder import Encoder

from test_endtoend import make_frame


def _encode(frame, qp, rd):
    cfg = EncoderConfig(width=frame.width, height=frame.height, qp=qp)
    enc = Encoder(cfg)
    stream, recons = enc.encode([frame], rd=rd)
    return stream, recons[0]


@pytest.mark.parametrize("kind", ["gradient", "edges"])
def test_rd_bitmatch(kind):
    frame = make_frame(64, 64, kind, seed=2)
    stream, recon = _encode(frame, 32, rd=True)
    dec = decode_stream(stream)[0]
    np.testing.assert_array_equal(recon.y, dec.y)
    np.testing.assert_array_equal(recon.cb, dec.cb)
    np.testing.assert_array_equal(recon.cr, dec.cr)


def test_rd_bitmatch_nonaligned():
    frame = make_frame(72, 88, "edges", seed=4)
    stream, recon = _encode(frame, 35, rd=True)
    dec = decode_stream(stream)[0]
    np.testing.assert_array_equal(recon.y, dec.y)
    np.testing.assert_array_equal(recon.cb, dec.cb)
    np.testing.assert_array_equal(recon.cr, dec.cr)


def test_rd_improves_rate_distortion():
    """RD cost (distortion + lambda*rate) must improve over the variance
    heuristic on a structured frame."""
    from svt_hevc_tpu.core.rdo import lambda_sse
    frame = make_frame(96, 64, "edges", seed=7)
    qp = 32
    s_h, r_h = _encode(frame, qp, rd=False)
    s_rd, r_rd = _encode(frame, qp, rd=True)

    def cost(stream, recon):
        d = float(((recon.y.astype(np.int64) - frame.y.astype(np.int64)) ** 2).sum())
        return d + lambda_sse(qp) * 8 * len(stream)

    assert cost(s_rd, r_rd) < cost(s_h, r_h)


def test_rd_flat_frame_picks_big_cus():
    """A flat frame must not be split to 8x8 everywhere by RD."""
    frame = make_frame(64, 64, "flat")
    stream_rd, _ = _encode(frame, 32, rd=True)
    stream_forced = None
    cfg = EncoderConfig(width=64, height=64, qp=32)
    enc = Encoder(cfg)
    pic = enc.encode_frame(frame, split_policy=lambda x0, y0, l, d: l > 3)
    stream_forced = enc.headers() + pic.nal_bytes
    assert len(stream_rd) < len(stream_forced)
